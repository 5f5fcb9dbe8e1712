"""Port of the s2crossing_edge_query_test.cc robustness harnesses:
index-based crossing-candidate enumeration must be a superset of the
brute-force crossings for adversarial edge sets (cube-edge planes,
cube-face axes, cells near the Hilbert-curve cube vertex, collinear
edges on cell boundaries, degenerate edges).  These tests fail if the
index's kCellPadding is removed (mutable_s2shape_index.h)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel import coords
from s2geometry_spark.kernel import predicates as P
from s2geometry_spark.kernel.distance import point_edge_dist2
from s2geometry_spark.kernel.fractal import sample_cap_point
from s2geometry_spark.kernel.metrics import MAX_DIAG
from s2geometry_spark.kernel.mutable_index import (
    MutableIndex,
    get_crossing_candidates,
)
from s2geometry_spark.kernel.polyline import point_on_line
from s2geometry_spark.kernel.vector_shapes import EdgeVectorShape


def _norm(p):
    p = np.asarray(p, np.float64)
    return p / np.linalg.norm(p)


def _log_uniform(rng, lo: float, hi: float) -> float:
    return lo * (hi / lo) ** rng.uniform()


def _perturb_at_distance(rng, dist_rad, a0, b0):
    x = point_on_line(a0, b0, dist_rad)
    if rng.rand() < 0.5:
        x = np.array([
            np.nextafter(v, 1.0 if rng.rand() < 0.5 else -1.0) for v in x
        ])
        x = _norm(x)
    return x


def _perturbed_sub_edges(rng, a0, b0, count):
    a0, b0 = _norm(a0), _norm(b0)
    length0 = math.acos(max(-1.0, min(1.0, float(a0 @ b0))))
    edges = []
    for _ in range(count):
        length = length0 * _log_uniform(rng, 1e-15, 1.0)
        offset = (length0 - length) * rng.uniform()
        edges.append((_perturb_at_distance(rng, offset, a0, b0),
                      _perturb_at_distance(rng, offset + length, a0, b0)))
    return edges


def _cap_edges(rng, center, cap_radius, max_length, count):
    edges = []
    for _ in range(count):
        c = sample_cap_point(rng, center, cap_radius)
        p1 = sample_cap_point(rng, c, 0.5 * max_length)
        p2 = _norm(2 * float(p1 @ c) * c - p1)
        edges.append((p1, p2))
    return edges


def _test_all_crossings(edges):
    shape = EdgeVectorShape()
    for a, b in edges:
        shape.add(a, b)
    index = MutableIndex(max_edges_per_cell=1)
    assert index.add(shape) == 0
    num_candidates = 0
    num_nearby = 0
    max_dist = MAX_DIAG.get_value(30)
    C = np.stack([e[0] for e in edges])
    D = np.stack([e[1] for e in edges])
    for a, b in edges:
        cand = get_crossing_candidates(index, a, b)
        assert cand, "empty candidate set"
        assert cand == sorted(cand)
        assert all(s == 0 and 0 <= e < len(edges) for s, e in cand)
        num_candidates += len(cand)
        cand_set = {e for _, e in cand}
        missing = []
        for i, (c, d) in enumerate(edges):
            sign = P.crossing_sign(a, b, c, d)
            if sign >= 0:
                num_nearby += 1
                if i not in cand_set:
                    missing.append(i)
            else:
                d2 = point_edge_dist2(np.stack([a, b, c, d]),
                                      np.stack([c, c, a, a]),
                                      np.stack([d, d, b, b]))
                dist = 2 * np.arcsin(np.clip(0.5 * np.sqrt(d2), -1, 1))
                if (dist < max_dist).any():
                    num_nearby += 1
        assert not missing, f"missing candidates: {missing}"
    assert num_candidates <= 3 * num_nearby, (num_candidates, num_nearby)


def _get_norm(face):
    x, y, z = coords.face_uv_to_xyz(face, 0.0, 0.0)
    return _norm([x, y, z])


def _uvw_axis(face, axis):
    uvw = np.zeros(3)
    uvw[axis] = 1.0
    m = np.stack([
        np.asarray(coords.face_uv_to_xyz(face, 1.0, 0.0))
        - np.asarray(coords.face_uv_to_xyz(face, 0.0, 0.0)),
        np.asarray(coords.face_uv_to_xyz(face, 0.0, 1.0))
        - np.asarray(coords.face_uv_to_xyz(face, 0.0, 0.0)),
        np.asarray(coords.face_uv_to_xyz(face, 0.0, 0.0)),
    ])
    return _norm(uvw @ m)


def test_perturbed_cube_edges():
    """test.cc:225-241: edges in the planes of cube edges — through
    cube vertices and along 45-degree face diagonals."""
    rng = np.random.RandomState(20260819)
    for _ in range(8):
        face = int(rng.randint(0, 6))
        scale = _log_uniform(rng, 1e-15, 1.0)
        u = 2 * int(rng.randint(0, 2)) - 1
        v = 2 * int(rng.randint(0, 2)) - 1
        a0 = np.asarray(
            coords.face_uv_to_xyz(face, scale * u, scale * v), np.float64)
        b0 = a0 - 2 * _get_norm(face)
        _test_all_crossings(_perturbed_sub_edges(rng, a0, b0, 30))


def test_perturbed_cube_face_axes():
    """test.cc:246-259: edges in the planes of cube-face axes — on the
    boundaries between the face's immediate child cells."""
    rng = np.random.RandomState(4)
    for _ in range(5):
        face = int(rng.randint(0, 6))
        scale = _log_uniform(rng, 1e-15, 1.0)
        axis = _uvw_axis(face, int(rng.randint(0, 2)))
        a0 = scale * axis + _get_norm(face)
        b0 = scale * axis - _get_norm(face)
        _test_all_crossings(_perturbed_sub_edges(rng, a0, b0, 30))


def test_cap_edges_near_cube_vertex():
    """test.cc:261-271: 500 random edges near the cube vertex where the
    Hilbert curve starts and ends (reference: 1000)."""
    rng = np.random.RandomState(11)
    edges = _cap_edges(rng, _norm([-1.0, -1.0, 1.0]), 1e-3, 1e-4, 500)
    _test_all_crossings(edges)


def test_degenerate_edge_on_cell_vertex_is_its_own_candidate():
    """test.cc:273-285."""
    rng = np.random.RandomState(3)
    from s2geometry_spark.kernel.cell import Cell
    from s2geometry_spark.kernel.cid import CID

    for _ in range(100):
        level = int(rng.randint(0, 31))
        face = int(rng.randint(0, 6))
        pos = int(rng.randint(0, 1 << 30)) << 31 | int(rng.randint(0, 1 << 31))
        cid = CID(((face << 61) | pos | 1) & ((1 << 64) - 1)).parent(level)
        cell = Cell(cid)
        v = cell.get_vertex(0)
        edges = [(v, v)]
        _test_all_crossings(edges)


def test_collinear_edges_on_cell_boundaries():
    """test.cc:287-305: collinear sub-edges along a random cell edge."""
    rng = np.random.RandomState(9)
    from s2geometry_spark.kernel.cell import Cell
    from s2geometry_spark.kernel.cid import CID

    for _ in range(3):
        level = int(rng.randint(0, 31))
        face = int(rng.randint(0, 6))
        pos = int(rng.randint(0, 1 << 30)) << 31 | int(rng.randint(0, 1 << 31))
        cid = CID(((face << 61) | pos | 1) & ((1 << 64) - 1)).parent(level)
        cell = Cell(cid)
        i = int(rng.randint(0, 4))
        p1, p2 = cell.get_vertex(i), cell.get_vertex((i + 1) % 4)
        d = p2 - p1
        a0 = p1 - 2.0 * d
        b0 = p2 + 2.0 * d
        n_edges = 16
        edges = []
        t = np.sort(rng.uniform(0, 1, 2 * n_edges))
        for k in range(n_edges):
            edges.append((_norm(a0 + t[2 * k] * (b0 - a0)),
                          _norm(a0 + t[2 * k + 1] * (b0 - a0))))
        _test_all_crossings(edges)


def test_query_edge_on_face_boundary():
    """VisitCells.QueryEdgeOnFaceBoundary (test.cc:365-420): edge AB
    whose endpoint B lies within half an epsilon of a cube-face
    boundary clips to an EMPTY set on B's nominal face without padding,
    yet the crossing with an edge BC on that face must still be found —
    the kFaceClipErrorUVCoord padding inside the candidate walk is what
    guarantees it."""
    from s2geometry_spark.kernel.cell import get_uvw_face
    from s2geometry_spark.kernel.clipping import (
        FACE_CLIP_ERROR_UV_COORD,
        clip_to_padded_face,
    )
    from s2geometry_spark.kernel.coords import face_uv_to_xyz, get_face

    rng = np.random.RandomState(20260820)
    iters = 0
    while iters < 30:
        a_face = int(rng.randint(0, 6))
        a = _norm(np.asarray(face_uv_to_xyz(
            a_face, rng.uniform(-1, 1), rng.uniform(-1, 1))))
        b_face = get_uvw_face(a_face, 0, 1)  # towards the +u axis
        eps = np.finfo(float).eps
        b = _norm(np.asarray(face_uv_to_xyz(
            b_face, 1 - int(rng.randint(0, 2)) * 0.5 * eps,
            rng.uniform(-1, 1))))
        got_face = int(get_face(*[np.array([v]) for v in b])[0])
        if got_face != b_face:
            continue
        if clip_to_padded_face(a, b, b_face, 0.0) is not None:
            continue
        iters += 1
        # padded clipping succeeds where unpadded failed
        assert clip_to_padded_face(
            a, b, b_face, FACE_CLIP_ERROR_UV_COORD
        ) is not None
        c = _norm(np.asarray(face_uv_to_xyz(
            b_face, rng.uniform(-1, 1), rng.uniform(-1, 1))))
        shape = EdgeVectorShape()
        shape.add(b, c)
        index = MutableIndex(max_edges_per_cell=1)
        index.add(shape)
        cand = get_crossing_candidates(index, a, b)
        assert (0, 0) in cand, (a, b, c)
