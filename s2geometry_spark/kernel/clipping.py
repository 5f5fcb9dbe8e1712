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

from .cell import (
    _face_uv_to_xyz,
    _valid_face_xyz_to_uv,
    face_xyz_to_uvw,
    get_uvw_face,
)
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


DBL_ERR = 0.5 * DBL_EPSILON
ROBUST_CROSS_PROD_ERROR = 6 * DBL_ERR  # kRobustCrossProdError
EXACT_CROSS_PROD_ERROR = DBL_ERR  # internal::kExactCrossProdError


def stable_cross_prod(a: np.ndarray, b: np.ndarray):
    """GetStableCrossProd<double> (s2edge_crossings.cc:95-140): (a-b)×(a+b)
    when the result norm guarantees error ≤ kRobustCrossProdError, else
    None (→ exact tier)."""
    result = np.cross(a - b, a + b)
    min_norm = (32 * SQRT3 * DBL_ERR) / (
        ROBUST_CROSS_PROD_ERROR / DBL_ERR - (1 + 2 * SQRT3)
    )
    if float(result @ result) >= min_norm * min_norm:
        return result
    return None


def is_normalizable(p: np.ndarray) -> bool:
    """IsNormalizable (s2edge_crossings.cc:276-291): largest component
    magnitude ≥ 2**-242, so Angle()/Normalize() lose no precision."""
    return float(np.abs(p).max()) >= math.ldexp(1, -242)


def ensure_normalizable(p: np.ndarray) -> np.ndarray:
    """EnsureNormalizable (s2edge_crossings.cc:294-312): scale by a power
    of two so the largest component is in [1, 2)."""
    p_max = float(np.abs(p).max())
    assert p_max > 0.0
    if p_max >= math.ldexp(1, -242):
        return p
    # ldexp(2, -1 - ilogb(p_max)) == 2**(-ilogb(p_max))
    _, e = math.frexp(p_max)  # p_max = m * 2**e, m in [0.5, 1)
    return np.ldexp(p, -(e - 1))


def _frac_ilogb(x: Fraction) -> int:
    """floor(log2(|x|)) for a nonzero Fraction (exact)."""
    n, d = abs(x.numerator), x.denominator
    e = n.bit_length() - d.bit_length()
    # n/d in [2**(e-1), 2**(e+1)); refine to the true floor
    if (n >> e if e >= 0 else n << -e) >= d:
        return e
    return e - 1


def normalizable_from_exact(xf) -> np.ndarray:
    """NormalizableFromExact (s2edge_crossings.cc:318-338): round an exact
    (Fraction) 3-vector to double, scaling by a power of two first when
    the double conversion would underflow below the normalizable range."""
    x = np.array([float(v) for v in xf])
    if is_normalizable(x):
        return x
    exps = [_frac_ilogb(v) + 1 for v in xf if v != 0]
    if not exps:
        return np.zeros(3)
    exp = max(exps)
    scale = Fraction(2) ** (-exp)
    return np.array([float(v * scale) for v in xf])


def symbolic_cross_prod_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """SymbolicCrossProdSorted (s2edge_crossings.cc:183-268): the cross
    product under S2::Sign's symbolic perturbation model, for exactly
    collinear a < b (lexicographically).  May not be normalizable."""
    if b[0] != 0 or b[1] != 0:  # da[2]
        return np.array([-b[1], b[0], 0.0])
    if b[2] != 0:  # da[1]
        return np.array([b[2], 0.0, 0.0])
    if a[0] != 0 or a[1] != 0:  # db[2]
        return np.array([a[1], -a[0], 0.0])
    return np.array([1.0, 0.0, 0.0])  # db[2] * da[1]


def symbolic_cross_prod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """internal::SymbolicCrossProd (s2edge_crossings.cc:340-347)."""
    if tuple(a) < tuple(b):
        return ensure_normalizable(symbolic_cross_prod_sorted(a, b))
    return -ensure_normalizable(symbolic_cross_prod_sorted(b, a))


def exact_cross_prod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """internal::ExactCrossProd (s2edge_crossings.cc:348-360): exact
    rational cross product (doubles are dyadic rationals, so Fraction
    arithmetic is exact like ExactFloat), falling back to symbolic
    perturbations when a and b are exactly proportional.  REQUIRES a != b."""
    fa = [Fraction(float(x)) for x in a]
    fb = [Fraction(float(x)) for x in b]
    ex = [
        fa[1] * fb[2] - fa[2] * fb[1],
        fa[2] * fb[0] - fa[0] * fb[2],
        fa[0] * fb[1] - fa[1] * fb[0],
    ]
    if any(v != 0 for v in ex):
        return normalizable_from_exact(ex)
    return symbolic_cross_prod(a, b)


def robust_cross_prod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """RobustCrossProd (s2edge_crossings.cc:147-177): stable (a-b)×(a+b)
    in double, Ortho for a == b, else exact arithmetic with symbolic
    perturbations (no long-double tier on this platform — the reference's
    armv7 configuration)."""
    result = stable_cross_prod(a, b)
    if result is not None:
        return result
    if tuple(a) == tuple(b):
        return ortho(a)
    return exact_cross_prod(a, b)


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


def segs_intersect_rect(
    A: np.ndarray, B: np.ndarray, rect, pad
) -> np.ndarray:
    """Vectorized IntersectsRect: segments (A[i], B[i]) with per-row (or
    scalar) padding `pad` vs a UV rect (the 2D corner-side test below,
    batch form); rect entries may be scalars or per-row arrays."""
    u_lo = rect[0] - pad
    u_hi = rect[1] + pad
    v_lo = rect[2] - pad
    v_hi = rect[3] + pad
    ok = ~(
        (np.maximum(A[:, 0], B[:, 0]) < u_lo)
        | (np.minimum(A[:, 0], B[:, 0]) > u_hi)
        | (np.maximum(A[:, 1], B[:, 1]) < v_lo)
        | (np.minimum(A[:, 1], B[:, 1]) > v_hi)
    )
    nx = -(B[:, 1] - A[:, 1])
    ny = B[:, 0] - A[:, 0]
    ui = np.where(nx >= 0, u_hi, u_lo)
    vj = np.where(ny >= 0, v_hi, v_lo)
    ui2 = np.where(nx >= 0, u_lo, u_hi)
    vj2 = np.where(ny >= 0, v_lo, v_hi)
    mx = nx * (ui - A[:, 0]) + ny * (vj - A[:, 1])
    mn = nx * (ui2 - A[:, 0]) + ny * (vj2 - A[:, 1])
    return ok & (mx >= 0) & (mn <= 0)


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


# -------------------------------------------- face segments (cc:147-248)
def _move_origin_to_valid_face(face: int, a: np.ndarray, ab: np.ndarray,
                               a_uv) -> tuple[int, tuple[float, float]]:
    """MoveOriginToValidFace (s2edge_clipping.cc:147-178)."""
    max_safe = 1 - FACE_CLIP_ERROR_UV_COORD
    if max(abs(a_uv[0]), abs(a_uv[1])) <= max_safe:
        return face, a_uv
    n = face_xyz_to_uvw(face, ab)
    if _intersects_face(n):
        exit_uv = _get_exit_point(n, _get_exit_axis(n))
        exit_xyz = _face_uv_to_xyz(face, exit_uv[0], exit_uv[1])
        a_tangent = np.cross(ab / np.linalg.norm(ab), a)
        exit_xyz = exit_xyz / np.linalg.norm(exit_xyz)
        if float((exit_xyz - a) @ a_tangent) >= -FACE_CLIP_ERROR_RADIANS:
            return face, a_uv
    if abs(a_uv[0]) >= abs(a_uv[1]):
        face = get_uvw_face(face, 0, 1 if a_uv[0] > 0 else 0)
    else:
        face = get_uvw_face(face, 1, 1 if a_uv[1] > 0 else 0)
    u, v = _valid_face_xyz_to_uv(face, a)
    return face, (max(-1.0, min(1.0, u)), max(-1.0, min(1.0, v)))


def _sum_equals_exact(u: float, v: float, w: float) -> bool:
    return Fraction(u) + Fraction(v) == Fraction(w)


def _get_next_face(face: int, exit_uv, axis: int, n, target_face: int) -> int:
    """GetNextFace (s2edge_clipping.cc:185-206): corner exits advance
    straight to the target face when exact."""
    if (
        abs(exit_uv[1 - axis]) == 1
        and get_uvw_face(face, 1 - axis, 1 if exit_uv[1 - axis] > 0 else 0)
        == target_face
        and _sum_equals_exact(exit_uv[0] * n[0], exit_uv[1] * n[1], -n[2])
    ):
        return target_face
    return get_uvw_face(face, axis, 1 if exit_uv[axis] > 0 else 0)


def get_face_segments(a: np.ndarray, b: np.ndarray) -> list[tuple]:
    """GetFaceSegments (s2edge_clipping.cc:208-260): (face, a_uv, b_uv)
    per face crossed by edge AB, chained exactly at face boundaries."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    a_face = int(get_face(a[0], a[1], a[2]))
    b_face = int(get_face(b[0], b[1], b[2]))
    a_uv = _valid_face_xyz_to_uv(a_face, a)
    b_uv = _valid_face_xyz_to_uv(b_face, b)
    if a_face == b_face:
        return [(a_face, a_uv, b_uv)]
    ab = robust_cross_prod(a, b)
    a_face, a_uv = _move_origin_to_valid_face(a_face, a, ab, a_uv)
    b_face, b_uv = _move_origin_to_valid_face(b_face, b, -ab, b_uv)
    segments = []
    face = a_face
    seg_a = a_uv
    while face != b_face:
        n = face_xyz_to_uvw(face, ab)
        exit_axis = _get_exit_axis(n)
        ep = _get_exit_point(n, exit_axis)
        seg_b = (float(ep[0]), float(ep[1]))
        segments.append((face, seg_a, seg_b))
        exit_xyz = _face_uv_to_xyz(face, seg_b[0], seg_b[1])
        face = _get_next_face(face, seg_b, exit_axis, n, b_face)
        exit_uvw = face_xyz_to_uvw(face, exit_xyz)
        seg_a = (float(exit_uvw[0]), float(exit_uvw[1]))
    segments.append((face, seg_a, b_uv))
    return segments


# ------------------------------------------------ 2D edge clip (cc:382-452)
def interpolate_double(x, a, b, a1, b1) -> float:
    """InterpolateDouble (s2edge_clipping.h:178-194)."""
    if a == b:
        return a1
    if abs(a - x) <= abs(b - x):
        return a1 + (b1 - a1) * ((x - a) / (b - a))
    return b1 + (a1 - b1) * ((x - b) / (a - b))


def _update_endpoint(bound: list, end: int, value: float) -> bool:
    if end == 0:
        if bound[1] < value:
            return False
        if bound[0] < value:
            bound[0] = value
    else:
        if bound[0] > value:
            return False
        if bound[1] > value:
            bound[1] = value
    return True


def _clip_bound_axis(a0, b0, bound0, a1, b1, bound1, diag, clip0) -> bool:
    if bound0[0] < clip0[0]:
        if bound0[1] < clip0[0]:
            return False
        bound0[0] = clip0[0]
        if not _update_endpoint(
            bound1, diag, interpolate_double(clip0[0], a0, b0, a1, b1)
        ):
            return False
    if bound0[1] > clip0[1]:
        if bound0[0] > clip0[1]:
            return False
        bound0[1] = clip0[1]
        if not _update_endpoint(
            bound1, 1 - diag, interpolate_double(clip0[1], a0, b0, a1, b1)
        ):
            return False
    return True


def clip_edge_bound(a, b, clip, bound) -> bool:
    """ClipEdgeBound (s2edge_clipping.cc:425-436); `bound` is
    [[u_lo,u_hi],[v_lo,v_hi]] lists mutated in place."""
    diag = int((a[0] > b[0]) != (a[1] > b[1]))
    return _clip_bound_axis(
        a[0], b[0], bound[0], a[1], b[1], bound[1], diag, clip[0]
    ) and _clip_bound_axis(
        a[1], b[1], bound[1], a[0], b[0], bound[0], diag, clip[1]
    )


def get_clipped_edge_bound(a, b, clip):
    """GetClippedEdgeBound (cc:418-423) → bound or None."""
    bound = [
        [min(a[0], b[0]), max(a[0], b[0])],
        [min(a[1], b[1]), max(a[1], b[1])],
    ]
    if clip_edge_bound(a, b, clip, bound):
        return bound
    return None


def clip_edge(a, b, clip):
    """ClipEdge (cc:438-450) → (a_clipped, b_clipped) or None."""
    bound = [
        [min(a[0], b[0]), max(a[0], b[0])],
        [min(a[1], b[1]), max(a[1], b[1])],
    ]
    if clip_edge_bound(a, b, clip, bound):
        ai = int(a[0] > b[0])
        aj = int(a[1] > b[1])
        return (
            (bound[0][ai], bound[1][aj]),
            (bound[0][1 - ai], bound[1][1 - aj]),
        )
    return None
