"""s2coords_test.cc port: Hilbert traversal-table symmetries, ST↔IJ
boundary/halfway/roundtrip behavior, ST↔UV inverses, the cube-face
frame identities (FaceUVtoXYZ continuity, FaceXYZtoUVW, UVNorms,
UVWAxis, UVWFace), and XYZtoFaceSiTi center detection.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import cellid as cid_np
from s2geometry_spark.kernel import coords
from s2geometry_spark.kernel.cell import face_xyz_to_uvw, get_uvw_face
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.fractal import random_point
from s2geometry_spark.kernel.hilbert import (
    IJ_TO_POS,
    INVERT_MASK,
    POS_TO_IJ,
    SWAP_MASK,
)

LIMIT_IJ = 1 << 30
MAX_SI_TI = 1 << 31


def swap_axes(ij: int) -> int:
    return ((ij >> 1) & 1) + ((ij & 1) << 1)


def invert_bits(ij: int) -> int:
    return ij ^ 3


def test_traversal_order():
    """test.cc TraversalOrder: table symmetries + inverse property."""
    for r in range(4):
        for i in range(4):
            assert IJ_TO_POS[r][i] == IJ_TO_POS[r ^ SWAP_MASK][swap_axes(i)]
            assert POS_TO_IJ[r][i] == swap_axes(POS_TO_IJ[r ^ SWAP_MASK][i])
            assert IJ_TO_POS[r][i] == \
                IJ_TO_POS[r ^ INVERT_MASK][invert_bits(i)]
            assert POS_TO_IJ[r][i] == \
                invert_bits(POS_TO_IJ[r ^ INVERT_MASK][i])
            assert IJ_TO_POS[r][POS_TO_IJ[r][i]] == i
            assert POS_TO_IJ[r][IJ_TO_POS[r][i]] == i


def st_to_ij(s: float) -> int:
    return int(coords.st_to_ij(float(s)))


def test_st_to_ij_boundaries():
    assert st_to_ij(0.0) == 0
    assert st_to_ij(1.0) == LIMIT_IJ - 1


def test_st_to_ij_halfway():
    r = 1.0 / LIMIT_IJ
    for mult, want in [(0.5, 0), (1.0, 1), (1.5, 1), (2.0, 2), (2.5, 2),
                       (3.0, 3), (3.5, 3), (4.0, 4), (4.5, 4)]:
        assert st_to_ij(mult * r) == want, mult
    for mult, want in [(LIMIT_IJ - 2.5, LIMIT_IJ - 3),
                       (LIMIT_IJ - 2.0, LIMIT_IJ - 2),
                       (LIMIT_IJ - 1.5, LIMIT_IJ - 2),
                       (LIMIT_IJ - 1.0, LIMIT_IJ - 1),
                       (LIMIT_IJ - 0.5, LIMIT_IJ - 1)]:
        assert st_to_ij(mult * r) == want, mult


def test_ij_to_st_to_ij_roundtrip_random():
    rng = np.random.RandomState(121)
    for _ in range(1000):
        i = rng.randint(0, LIMIT_IJ)
        s_min = float(coords.ij_to_st_min(i))
        s_max = float(coords.ij_to_st_min(i + 1))
        s = rng.uniform(s_min, s_max)
        assert st_to_ij(s) == i
        assert st_to_ij(s_min) == i
        assert st_to_ij(np.nextafter(s_max, 0.0)) == i


def test_st_uv_conversions():
    for s in (0.0, 0.5, 1.0):
        assert float(coords.st_to_uv(s)) == 2 * s - 1
    for u in (-1.0, 0.0, 1.0):
        assert float(coords.uv_to_st(u)) == 0.5 * (u + 1)
    for k in range(0, 10001):
        x = k / 10000.0
        assert abs(float(coords.uv_to_st(coords.st_to_uv(x))) - x) <= 1e-15
        assert abs(
            float(coords.st_to_uv(coords.uv_to_st(2 * x - 1))) - (2 * x - 1)
        ) <= 1e-15


def fuv(face, u, v):
    p = coords.face_uv_to_xyz(face, np.float64(u), np.float64(v))
    return np.array([float(p[0]), float(p[1]), float(p[2])])


def u_axis(face):
    return fuv(face, 1, 0) - fuv(face, 0, 0)


def v_axis(face):
    return fuv(face, 0, 1) - fuv(face, 0, 0)


def norm(face):
    return fuv(face, 0, 0)


def test_face_uv_to_xyz():
    total = np.zeros(3)
    for face in range(6):
        center = norm(face)
        assert abs(center[np.argmax(np.abs(center))]) == 1
        total += np.abs(center)
    assert np.array_equal(total, [2, 2, 2])
    for face in range(6):
        assert float(np.cross(u_axis(face), v_axis(face)) @ norm(face)) == 1
    # Hilbert curve continuity across faces
    for face in range(6):
        sign = -1 if (face & SWAP_MASK) else 1
        assert np.array_equal(
            fuv(face, sign, -sign), fuv((face + 1) % 6, -1, -1)
        )


def test_face_xyz_to_uvw():
    for face in range(6):
        assert np.array_equal(
            face_xyz_to_uvw(face, np.zeros(3)), np.zeros(3))
        assert np.array_equal(
            face_xyz_to_uvw(face, u_axis(face)), [1, 0, 0])
        assert np.array_equal(
            face_xyz_to_uvw(face, -u_axis(face)), [-1, 0, 0])
        assert np.array_equal(
            face_xyz_to_uvw(face, v_axis(face)), [0, 1, 0])
        assert np.array_equal(
            face_xyz_to_uvw(face, -v_axis(face)), [0, -1, 0])
        assert np.array_equal(
            face_xyz_to_uvw(face, norm(face)), [0, 0, 1])
        assert np.array_equal(
            face_xyz_to_uvw(face, -norm(face)), [0, 0, -1])


def test_uvw_face():
    def axis(face, k):
        return (u_axis(face), v_axis(face), norm(face))[k]

    for face in range(6):
        for ax in range(3):
            a = axis(face, ax)
            assert get_uvw_face(face, ax, 0) == int(
                coords.get_face(*(-a))
            )
            assert get_uvw_face(face, ax, 1) == int(
                coords.get_face(*a)
            )


def test_xyz_to_face_siti():
    """test.cc XYZToFaceSiTi (center detection), sampled levels."""
    rng = np.random.RandomState(122)
    for level in range(0, 31, 5):
        for _ in range(60):
            p = random_point(rng)
            cid = CID(int(cid_np.from_point(
                np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
            )[0])).parent(level)
            x, y, z = cid_np.to_point_raw(
                np.array([cid.id], dtype=np.uint64))
            n = math.sqrt(x[0] ** 2 + y[0] ** 2 + z[0] ** 2)
            cx, cy, cz = (np.array([x[0] / n]), np.array([y[0] / n]),
                          np.array([z[0] / n]))
            face, si, ti, lvl = coords.xyz_to_face_siti(cx, cy, cz)
            assert int(lvl[0]) == level
            leaf = cid_np.from_face_ij(
                face.astype(np.int64),
                (si // 2).astype(np.int64),
                (ti // 2).astype(np.int64),
            )
            assert CID(int(leaf[0])).parent(level) == cid
            # a nearby non-center point must report level -1
            moved = np.array([cx[0], cy[0], cz[0]]) + 1e-13
            f2, s2, t2, l2 = coords.xyz_to_face_siti(
                np.array([moved[0]]), np.array([moved[1]]),
                np.array([moved[2]]),
            )
            assert int(l2[0]) == -1
            assert int(f2[0]) == int(face[0])
            assert int(s2[0]) == int(si[0]) and int(t2[0]) == int(ti[0])
