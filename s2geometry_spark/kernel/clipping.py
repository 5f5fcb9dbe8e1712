"""Edge clipping to cube faces (s2edge_clipping.h/.cc) — driver-side.

Used by shape regions' MayIntersect(cell) with the reference's
conservative padding (kFaceClipErrorUVCoord + kIntersectsRectErrorUVDist),
which is what makes our coverings bit-match the reference's
(S2ShapeIndexRegion::AnyEdgeIntersects semantics).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

from .cell import face_xyz_to_uvw, get_uvw_face, _valid_face_xyz_to_uv
from .coords import get_face
from .predicates import ortho

DBL_EPSILON = 2.220446049250313e-16
SQRT1_2 = math.sqrt(0.5)
SQRT2 = math.sqrt(2.0)
SQRT3 = math.sqrt(3.0)

FACE_CLIP_ERROR_RADIANS = 3 * DBL_EPSILON
FACE_CLIP_ERROR_UV_DIST = 9 * DBL_EPSILON
FACE_CLIP_ERROR_UV_COORD = 9 * SQRT1_2 * DBL_EPSILON  # s2edge_clipping.h:101
INTERSECTS_RECT_ERROR_UV_DIST = 3 * SQRT2 * DBL_EPSILON  # s2edge_clipping.h:113
EDGE_CLIP_ERROR_UV_COORD = 2.25 * DBL_EPSILON


def robust_cross_prod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """RobustCrossProd (s2edge_crossings.cc:147-177): stable (a-b)×(a+b)
    with exact-arithmetic fallback and Ortho for a == ±b."""
    d = a - b
    s = a + b
    result = np.cross(d, s)
    # kMinNorm from GetStableCrossProd (s2edge_crossings.cc:98-140)
    dbl_err = 0.5 * DBL_EPSILON
    k_err = 6 * dbl_err  # kRobustCrossProdError
    min_norm = (32 * SQRT3 * dbl_err) / (k_err / dbl_err - (1 + 2 * SQRT3))
    if float(result @ result) >= min_norm * min_norm:
        return result
    if tuple(a) == tuple(b):
        return ortho(a)
    # Exact cross product with Fractions (doubles are dyadic rationals).
    fa = [Fraction(float(x)) for x in a]
    fb = [Fraction(float(x)) for x in b]
    ex = [
        fa[1] * fb[2] - fa[2] * fb[1],
        fa[2] * fb[0] - fa[0] * fb[2],
        fa[0] * fb[1] - fa[1] * fb[0],
    ]
    if any(v != 0 for v in ex):
        out = np.array([float(v) for v in ex])
        n = np.linalg.norm(out)
        if n > 0:
            return out / n
    # Exactly antipodal/proportional: symbolic result (internal::ExactCrossProd
    # falls back to SymbolicCrossProd; Ortho of the smaller point).
    return ortho(a if tuple(a) < tuple(b) else b)


def _sum_equals(u: float, v: float, w: float) -> bool:
    return (u + v == w) and (u == w - v) and (v == w - u)


def _intersects_face(n) -> bool:
    """IntersectsFace (s2edge_clipping.cc:71-83)."""
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    return (v >= w - u) and (u >= w - v)


def _intersects_opposite_edges(n) -> bool:
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    if abs(u - v) != w:
        return abs(u - v) >= w
    return (u - w >= v) if (u >= v) else (v - w >= u)


def _get_exit_axis(n) -> int:
    if _intersects_opposite_edges(n):
        return 1 if abs(n[0]) >= abs(n[1]) else 0
    sb = (math.copysign(1, n[0]) < 0) ^ (math.copysign(1, n[1]) < 0) ^ (
        math.copysign(1, n[2]) < 0
    )
    return 1 if not sb else 0


def _get_exit_point(n, axis: int):
    if axis == 0:
        u = 1.0 if n[1] > 0 else -1.0
        return (u, (-u * n[0] - n[2]) / n[1])
    v = 1.0 if n[0] < 0 else -1.0
    return ((-v * n[1] - n[2]) / n[0], v)


def _clip_destination(a, b, scaled_n, a_tan, b_tan, scale_uv):
    """ClipDestination (s2edge_clipping.cc:271-322) → (score, uv)."""
    max_safe = 1 - FACE_CLIP_ERROR_UV_COORD
    if b[2] > 0:
        uv = (b[0] / b[2], b[1] / b[2])
        if max(abs(uv[0]), abs(uv[1])) <= max_safe:
            return 0, uv
    ep = _get_exit_point(scaled_n, _get_exit_axis(scaled_n))
    uv = (scale_uv * ep[0], scale_uv * ep[1])
    p = np.array([uv[0], uv[1], 1.0])
    score = 0
    if float((p - a) @ a_tan) < 0:
        score = 2
    elif float((p - b) @ b_tan) < 0:
        score = 1
    if score > 0:
        if b[2] <= 0:
            score = 3
        else:
            uv = (b[0] / b[2], b[1] / b[2])
    return score, uv


def clip_to_padded_face(a_xyz: np.ndarray, b_xyz: np.ndarray, face: int, padding: float):
    """ClipToPaddedFace (s2edge_clipping.cc:323-362) → (a_uv, b_uv) or None."""
    fa = int(get_face(a_xyz[0], a_xyz[1], a_xyz[2]))
    fb = int(get_face(b_xyz[0], b_xyz[1], b_xyz[2]))
    if fa == face and fb == face:
        return (
            _valid_face_xyz_to_uv(face, a_xyz),
            _valid_face_xyz_to_uv(face, b_xyz),
        )
    n = face_xyz_to_uvw(face, robust_cross_prod(a_xyz, b_xyz))
    a = face_xyz_to_uvw(face, a_xyz)
    b = face_xyz_to_uvw(face, b_xyz)
    scale_uv = 1 + padding
    scaled_n = np.array([scale_uv * n[0], scale_uv * n[1], n[2]])
    if not _intersects_face(scaled_n):
        return None
    n = n / np.linalg.norm(n)
    a_tangent = np.cross(n, a)
    b_tangent = np.cross(b, n)
    a_score, a_uv = _clip_destination(
        b, a, -scaled_n, b_tangent, a_tangent, scale_uv
    )
    b_score, b_uv = _clip_destination(a, b, scaled_n, a_tangent, b_tangent, scale_uv)
    if a_score + b_score >= 3:
        return None
    return a_uv, b_uv


def intersects_rect(a_uv, b_uv, rect) -> bool:
    """IntersectsRect (s2edge_clipping.cc) — rect = (u_lo,u_hi,v_lo,v_hi)."""
    u_lo, u_hi, v_lo, v_hi = rect
    # bound of AB intersects rect?
    if max(a_uv[0], b_uv[0]) < u_lo or min(a_uv[0], b_uv[0]) > u_hi:
        return False
    if max(a_uv[1], b_uv[1]) < v_lo or min(a_uv[1], b_uv[1]) > v_hi:
        return False
    # all four rect corners on the same side of line AB?
    n = (-(b_uv[1] - a_uv[1]), b_uv[0] - a_uv[0])  # R2 Ortho
    i = 1 if n[0] >= 0 else 0
    j = 1 if n[1] >= 0 else 0
    us = (u_lo, u_hi)
    vs = (v_lo, v_hi)
    mx = n[0] * (us[i] - a_uv[0]) + n[1] * (vs[j] - a_uv[1])
    mn = n[0] * (us[1 - i] - a_uv[0]) + n[1] * (vs[1 - j] - a_uv[1])
    return mx >= 0 and mn <= 0
