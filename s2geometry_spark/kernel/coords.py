"""Vectorized S2 coordinate-system transforms (NumPy, no Spark).

Re-implements the coordinate tower documented in the reference at
s2coords.h:38-95 (quadratic projection, s2coords.h:285-340) as pure
NumPy array kernels.  All functions accept and return ndarrays and are
fully vectorized — no per-row Python.

Coordinate systems (reference s2coords.h:38-95):
  (lat, lng) -> (x, y, z) unit sphere -> (face, u, v) cube space
  -> (face, s, t) in [0,1] -> (face, i, j) leaf-cell ints in [0, 2^30).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
LIMIT_IJ = 1 << MAX_LEVEL  # kLimitIJ, s2coords.h:135
MAX_SI_TI = 1 << (MAX_LEVEL + 1)  # kMaxSiTi, s2coords.h:139

# kFaceUVWAxes (s2coords_internal.h:84-117): row f = (u-axis, v-axis, w-axis).
FACE_UVW_AXES = np.array(
    [
        [[0, 1, 0], [0, 0, 1], [1, 0, 0]],
        [[-1, 0, 0], [0, 0, 1], [0, 1, 0]],
        [[-1, 0, 0], [0, -1, 0], [0, 0, 1]],
        [[0, 0, -1], [0, -1, 0], [-1, 0, 0]],
        [[0, 0, -1], [1, 0, 0], [0, -1, 0]],
        [[0, 1, 0], [1, 0, 0], [0, 0, -1]],
    ],
    dtype=np.float64,
)

# kFaceUVWFaces (s2coords_internal.h:120-128).
FACE_UVW_FACES = np.array(
    [
        [[4, 1], [5, 2], [3, 0]],
        [[0, 3], [5, 2], [4, 1]],
        [[0, 3], [1, 4], [5, 2]],
        [[2, 5], [1, 4], [0, 3]],
        [[2, 5], [3, 0], [1, 4]],
        [[4, 1], [3, 0], [2, 5]],
    ],
    dtype=np.int64,
)


def st_to_uv(s: np.ndarray) -> np.ndarray:
    """Quadratic projection (s2coords.h:324-327)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Inverse quadratic projection (s2coords.h:329-332)."""
    u = np.asarray(u, dtype=np.float64)
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def ij_to_st_min(i: np.ndarray) -> np.ndarray:
    """IJtoSTMin (s2coords.h:340-343)."""
    return (1.0 / LIMIT_IJ) * np.asarray(i, dtype=np.float64)


def st_to_ij(s: np.ndarray) -> np.ndarray:
    """STtoIJ (s2coords.h:345-356): floor with clamping to [0, 2^30-1]."""
    s = np.asarray(s, dtype=np.float64)
    scaled = np.where(s > 0, LIMIT_IJ * s, 0.0)
    return np.minimum(scaled.astype(np.int64), LIMIT_IJ - 1)


def siti_to_st(si: np.ndarray) -> np.ndarray:
    """SiTitoST (s2coords.h:358-361)."""
    return (1.0 / MAX_SI_TI) * np.asarray(si, dtype=np.float64)


def st_to_siti(s: np.ndarray) -> np.ndarray:
    """STtoSiTi (s2coords.h:363-366): round-half-to-even like MathUtil::Round."""
    # C++ MathUtil::Round<int64> uses rint (banker's rounding) — np.rint matches.
    return np.rint(np.asarray(s, dtype=np.float64) * MAX_SI_TI).astype(np.int64)


def get_face(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """GetFace (s2coords.h:409-413): largest |component| axis, +3 if negative.

    Ties resolve exactly like Vector3::LargestAbsComponent: x wins only if
    strictly greater than y AND z; y wins only if strictly greater than z.
    """
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    return np.where(comp < 0, axis + 3, axis).astype(np.int64)


def valid_face_xyz_to_uv(
    face: np.ndarray, x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """ValidFaceXYZtoUV (s2coords.h:389-403): one division per coordinate."""
    face = np.asarray(face)
    # over= covers subnormal coordinates (e.g. 1e-322) whose quotient
    # against the masked off-face lanes overflows before np.choose
    # discards them
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        u = np.choose(face, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.choose(face, [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return u, v


def xyz_to_face_uv(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """XYZtoFaceUV (s2coords.h:415-419)."""
    face = get_face(x, y, z)
    u, v = valid_face_xyz_to_uv(face, x, y, z)
    return face, u, v


def face_uv_to_xyz(
    face: np.ndarray, u: np.ndarray, v: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FaceUVtoXYZ (s2coords.h:368-383), 6-way select."""
    face = np.asarray(face)
    one = np.ones_like(np.asarray(u, dtype=np.float64))
    x = np.choose(face, [one, -u, -u, -one, v, v])
    y = np.choose(face, [u, one, -v, -v, -one, u])
    z = np.choose(face, [v, v, one, -u, -u, -one])
    return x, y, z


def face_siti_to_xyz(
    face: np.ndarray, si: np.ndarray, ti: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FaceSiTitoXYZ (s2coords.cc:68-72)."""
    u = st_to_uv(siti_to_st(si))
    v = st_to_uv(siti_to_st(ti))
    return face_uv_to_xyz(face, u, v)


def latlng_to_xyz(
    lat_deg: np.ndarray, lng_deg: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """S2LatLng::ToPoint (s2latlng.cc:68-76), degrees in."""
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cosphi = np.cos(phi)
    return np.cos(theta) * cosphi, np.sin(theta) * cosphi, np.sin(phi)


def xyz_to_latlng(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """S2LatLng::Latitude/Longitude (s2latlng.h:235-250), degrees out.

    The `+ 0.0` in the reference normalizes -0.0; np.arctan2 handles signed
    zeros identically, and we add 0.0 to the inputs the same way.
    """
    lat = np.arctan2(z + 0.0, np.sqrt(x * x + y * y))
    lng = np.arctan2(y + 0.0, x + 0.0)
    return np.degrees(lat), np.degrees(lng)


def normalize_xyz(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = np.sqrt(x * x + y * y + z * z)
    n = np.where(n == 0, 1.0, n)
    return x / n, y / n, z / n


def xyz_to_face_siti(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """XYZtoFaceSiTi (s2coords.cc:43-66): returns (face, si, ti, level);
    level = -1 where p is not the center of a cell at any level."""
    face, u, v = xyz_to_face_uv(x, y, z)
    si = st_to_siti(uv_to_st(u))
    ti = st_to_siti(uv_to_st(v))
    or_max = np.int64(MAX_SI_TI)
    lsb_si = (si | or_max) & -(si | or_max)
    lsb_ti = (ti | or_max) & -(ti | or_max)
    # level = kMaxCellLevel - countr_zero(si | kMaxSiTi) (s2coords.cc:54)
    lvl_si = MAX_LEVEL - np.log2(lsb_si.astype(np.float64)).astype(np.int64)
    lvl_ti = MAX_LEVEL - np.log2(lsb_ti.astype(np.float64)).astype(np.int64)
    level = np.where((lvl_si >= 0) & (lvl_si == lvl_ti), lvl_si, -1)
    # exact center check: recompute the center and compare bit-for-bit
    cx, cy, cz = normalize_xyz(*face_siti_to_xyz(face, si, ti))
    is_center = (cx == x) & (cy == y) & (cz == z)
    level = np.where(is_center, level, -1)
    return face, si, ti, level


def rotate(p: np.ndarray, axis: np.ndarray, angle_rad: float) -> np.ndarray:
    """S2::Rotate (s2pointutil.cc): rotate p CCW by angle around axis."""
    p = np.asarray(p, dtype=np.float64)
    axis = np.asarray(axis, dtype=np.float64)
    center = float(p @ axis) * axis
    dx = p - center
    dy = np.cross(axis, p)
    out = np.cos(angle_rad) * dx + np.sin(angle_rad) * dy + center
    return out / np.linalg.norm(out)
