"""Chord-angle distance kernels (s1chord_angle.h, s2edge_distances.cc).

All distances are squared chord lengths (S1ChordAngle representation,
s1chord_angle.h:35-60) — trig-free comparisons, monotone with angle.
"""

from __future__ import annotations

import math

import numpy as np

DBL_EPSILON = 2.220446049250313e-16


def angle_to_chord2(radians) -> np.ndarray:
    """S1ChordAngle(S1Angle): 4·sin²(θ/2), clamped at π."""
    r = np.minimum(np.asarray(radians, dtype=np.float64), math.pi)
    s = 2.0 * np.sin(0.5 * r)
    return s * s


def chord2_to_angle(length2) -> np.ndarray:
    """ToAngle: 2·asin(√(l²)/2)."""
    l2 = np.asarray(length2, dtype=np.float64)
    return 2.0 * np.arcsin(0.5 * np.sqrt(np.minimum(l2, 4.0)))


def chord2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """S1ChordAngle(x, y) = min(4, |x-y|²) for (...,3) arrays."""
    d = np.asarray(x, float) - np.asarray(y, float)
    return np.minimum((d * d).sum(-1), 4.0)


def s1angle_constructor_max_error(length2) -> np.ndarray:
    """S1ChordAngle::GetS1AngleConstructorMaxError (s1chord_angle.h)."""
    return 1.5 * DBL_EPSILON * np.asarray(length2, float)


def s2point_constructor_max_error(length2) -> np.ndarray:
    """S1ChordAngle::GetS2PointConstructorMaxError: rounding when built
    from two S2Points: 4.5e-16·l² + 2e-31 (s1chord_angle.cc)."""
    l2 = np.asarray(length2, float)
    return 4.5 * DBL_EPSILON * l2 + 16 * DBL_EPSILON * DBL_EPSILON


def point_edge_dist2(X: np.ndarray, A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Min squared-chord distance from each point X[n] to each edge
    (A[m], B[m]) — vectorized port of AlwaysUpdateMinInteriorDistance +
    vertex fallback (s2edge_distances.cc).  Shapes: X (N,3), A/B (M,3)
    → (N,M)."""
    X = np.asarray(X, float).reshape(-1, 3)
    A = np.asarray(A, float).reshape(-1, 3)
    B = np.asarray(B, float).reshape(-1, 3)
    # vertex distances
    xa2 = ((X[:, None, :] - A[None, :, :]) ** 2).sum(-1)  # (N,M)
    xb2 = ((X[:, None, :] - B[None, :, :]) ** 2).sum(-1)
    vertex_d2 = np.minimum(xa2, xb2)

    ab2 = ((A - B) ** 2).sum(-1)[None, :]  # (1,M)
    max_error = 4.75 * DBL_EPSILON * (xa2 + xb2 + ab2) + 8 * DBL_EPSILON**2
    maybe_interior = np.abs(xa2 - xb2) < ab2 + max_error

    # C = RobustCrossProd(a, b) stable tier, (a-b)×(a+b) == 2·a×b
    # (s2edge_distances.cc:161 — the stable form keeps the edge normal
    # accurate even for nearly-identical endpoints; degenerate edges give
    # C == 0 and fall to the vertex case)
    C = np.cross(A - B, A + B)  # (M,3)
    c2 = (C * C).sum(-1)[None, :]  # (1,M)

    def _dot_nm(P: np.ndarray, Q: np.ndarray) -> np.ndarray:
        # (N,3)·(M,3) → (N,M) with a FIXED x+y+z summation order.
        # `P @ Q.T` dispatches to BLAS, whose rounding depends on the
        # batch shape N — the same row can classify on different sides
        # of the w1/w2 wedge test in a 50-row vs 300-row batch, making
        # distances partition-dependent (breaks the 1-ulp successor
        # contract of is_distance_less_or_equal and the engine's
        # determinism-under-repartition guarantee).
        return (
            P[:, 0, None] * Q[None, :, 0]
            + P[:, 1, None] * Q[None, :, 1]
            + P[:, 2, None] * Q[None, :, 2]
        )

    x_dot_c = _dot_nm(X, C)  # (N,M)
    x_dot_c2 = x_dot_c * x_dot_c
    # interior wedge test: det(a,c,x) < 0 and det(b,c,x) > 0
    # det(a,c,x) = x·(a×c); det(b,c,x) = x·(b×c)
    AxC = np.cross(A, C)
    BxC = np.cross(B, C)
    w1 = _dot_nm(X, AxC)  # (a-x)·(c×x)
    w2 = _dot_nm(X, BxC)
    interior = maybe_interior & (w1 < 0) & (w2 > 0) & (c2 > 0)

    # XR² = XQ² + QR² with QR computed from |c×x|²/|c|² directly — "based
    # on both the dot product and cross product rather than deriving one
    # from the other" (s2edge_distances.cc:180-188): accurate for all
    # chord lengths, where 1 - ratio cancels near 90°.
    CX = np.cross(C[None, :, :], X[:, None, :])  # (N,M,3): c × x
    cx2 = (CX * CX).sum(-1)  # (N,M)
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = np.clip(x_dot_c2 / c2, 0.0, 1.0)
        qr = 1.0 - np.sqrt(np.clip(cx2 / c2, 0.0, 1.0))
        interior_d2 = ratio + qr * qr
    return np.where(interior, np.minimum(interior_d2, vertex_d2), vertex_d2)


def update_min_distance(x, a, b) -> float:
    """Scalar convenience for tests."""
    return float(point_edge_dist2(np.asarray(x)[None], np.asarray(a)[None], np.asarray(b)[None])[0, 0])


def chord2_successor(length2) -> np.ndarray:
    """S1ChordAngle::Successor: smallest representable larger angle
    (s1chord_angle.cc); 4 stays 4 (Straight→Infinity not modeled)."""
    l2 = np.asarray(length2, dtype=np.float64)
    return np.where(l2 >= 4.0, l2, np.where(l2 < 0, 0.0, np.nextafter(l2, np.inf)))


def chord2_predecessor(length2) -> np.ndarray:
    l2 = np.asarray(length2, dtype=np.float64)
    return np.where(l2 <= 0.0, -1.0, np.where(l2 > 4.0, 4.0, np.nextafter(l2, -np.inf)))


def directed_hausdorff2(A_vertices: np.ndarray, B_edges_c: np.ndarray, B_edges_d: np.ndarray) -> float:
    """Discrete directed Hausdorff distance (squared chord): max over A's
    vertices of the min distance to B's edges (S2HausdorffDistanceQuery
    semantics over vertex samples, s2hausdorff_distance_query.h)."""
    d2 = point_edge_dist2(A_vertices, B_edges_c, B_edges_d)
    return float(d2.min(axis=1).max())


def point_edge_dist2_rowwise(X: np.ndarray, A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-paired variant of point_edge_dist2: X[i] against edge
    (A[i], B[i]) → (N,) squared-chord distances.  Same formula, element-
    wise instead of the (N,M) cross product — the shape for candidate
    tables where each row carries its own edge."""
    X = np.asarray(X, float).reshape(-1, 3)
    A = np.asarray(A, float).reshape(-1, 3)
    B = np.asarray(B, float).reshape(-1, 3)
    xa2 = ((X - A) ** 2).sum(-1)
    xb2 = ((X - B) ** 2).sum(-1)
    vertex_d2 = np.minimum(xa2, xb2)
    ab2 = ((A - B) ** 2).sum(-1)
    max_error = 4.75 * DBL_EPSILON * (xa2 + xb2 + ab2) + 8 * DBL_EPSILON**2
    maybe_interior = np.abs(xa2 - xb2) < ab2 + max_error
    C = np.cross(A - B, A + B)  # RobustCrossProd stable tier (2·A×B)
    c2 = (C * C).sum(-1)
    x_dot_c = (X * C).sum(-1)
    x_dot_c2 = x_dot_c * x_dot_c
    w1 = (X * np.cross(A, C)).sum(-1)
    w2 = (X * np.cross(B, C)).sum(-1)
    interior = maybe_interior & (w1 < 0) & (w2 > 0) & (c2 > 0)
    CX = np.cross(C, X)
    cx2 = (CX * CX).sum(-1)
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = np.clip(x_dot_c2 / c2, 0.0, 1.0)
        qr = 1.0 - np.sqrt(np.clip(cx2 / c2, 0.0, 1.0))
        interior_d2 = ratio + qr * qr
    return np.where(interior, np.minimum(interior_d2, vertex_d2), vertex_d2)


def is_edge_b_near_edge_a(a0, a1, b0, b1, tolerance_rad: float) -> bool:
    """IsEdgeBNearEdgeA (s2edge_distances.cc:421-505): every point of
    edge B within `tolerance_rad` of edge A.  Scalar port using the
    robust Sign and RobustCrossProd."""
    import math

    from .clipping import robust_cross_prod
    from .polyline import _project_to_edge
    from . import predicates as P

    a0, a1, b0, b1 = (np.asarray(v, float).reshape(3) for v in (a0, a1, b0, b1))
    a_ortho = robust_cross_prod(a0, a1)
    a_ortho = a_ortho / np.linalg.norm(a_ortho)
    a_nearest_b0 = _project_to_edge(b0, a0, a1)
    a_nearest_b1 = _project_to_edge(b1, a0, a1)
    if int(P.sign(a_ortho[None], a_nearest_b0[None], a_nearest_b1[None])[0]) < 0:
        a_ortho = -a_ortho

    def ang(x, y):
        d = math.sqrt(((x - y) ** 2).sum())
        return 2.0 * math.asin(min(1.0, 0.5 * d))

    if ang(b0, a_nearest_b0) > tolerance_rad or ang(b1, a_nearest_b1) > tolerance_rad:
        return False
    b_ortho = robust_cross_prod(b0, b1)
    b_ortho = b_ortho / np.linalg.norm(b_ortho)
    planar_angle = ang(a_ortho, b_ortho)
    if planar_angle <= tolerance_rad:
        return True
    if planar_angle >= math.pi / 2:
        return (ang(b0, a0) < ang(b0, a1)) == (ang(b1, a0) < ang(b1, a1))
    furthest = np.cross(b_ortho, robust_cross_prod(a_ortho, b_ortho))
    furthest = furthest / np.linalg.norm(furthest)
    furthest_inv = -furthest

    def on_b(p):
        return (
            int(P.sign(b_ortho[None], b0[None], p[None])[0]) > 0
            and int(P.sign(b_ortho[None], p[None], b1[None])[0]) > 0
        )

    return not (on_b(furthest) or on_b(furthest_inv))


def chord2_add(a2: float, b2: float) -> float:
    """S1ChordAngle operator+ (s1chord_angle.cc:75-112)."""
    if b2 == 0:
        return a2
    if a2 + b2 >= 4.0:
        return 4.0
    x = a2 * (1 - 0.25 * b2)
    y = b2 * (1 - 0.25 * a2)
    return min(4.0, x + y + 2 * math.sqrt(x * y))


def chord2_sub(a2: float, b2: float) -> float:
    """S1ChordAngle operator- (s1chord_angle.cc:114-128): two square
    roots to avoid cancellation."""
    if b2 == 0:
        return a2
    if a2 <= b2:
        return 0.0
    x = a2 * (1 - 0.25 * b2)
    y = b2 * (1 - 0.25 * a2)
    c = max(0.0, math.sqrt(x) - math.sqrt(y))
    return c * c


def chord2_sin2(l2: float) -> float:
    """sin²(θ) = l²(1 − l²/4) (s1chord_angle.h Sin2)."""
    return l2 * (1 - 0.25 * l2)


def chord2_sin(l2: float) -> float:
    return math.sqrt(chord2_sin2(l2))


def chord2_cos(l2: float) -> float:
    """cos(θ) = 1 − l²/2."""
    return 1 - 0.5 * l2


def chord2_tan(l2: float) -> float:
    s, c = chord2_sin(l2), chord2_cos(l2)
    if c == 0:
        return math.inf if s > 0 else -math.inf
    return s / c


def chord2_plus_error(l2: float, error: float) -> float:
    """S1ChordAngle::PlusError (s1chord_angle.cc): specials unchanged,
    else clamp l² + error to [0, 4]."""
    if l2 < 0 or l2 == math.inf:
        return l2
    if l2 == 4.0 and error > 0:
        return 4.0
    return max(0.0, min(4.0, l2 + error))


# ------------------------------------------------------------------ s2edge_distances.cc edge-pair / ray helpers


def interpolate_edge(a, b, t: float):
    """S2::Interpolate (s2edge_distances.cc:77-81): the point at
    parametric position t along AB; extrapolates for t outside [0, 1]
    by walking t * angle(a, b) along the great circle."""
    import math

    import numpy as np

    from .polyline import point_on_line

    a = np.asarray(a, float).reshape(3)
    b = np.asarray(b, float).reshape(3)
    if t == 0:
        return a.copy()
    if t == 1:
        return b.copy()
    ang = math.atan2(np.linalg.norm(np.cross(a, b)), float(a @ b))
    return point_on_line(a, b, t * ang)


def point_to_left(a, b, r_rad: float):
    """S2::GetPointToLeft (s2edge_distances.cc:61-67): the point at
    distance r from A, perpendicular to AB on its left."""
    import numpy as np

    from .clipping import robust_cross_prod
    from .polyline import point_on_line

    n = robust_cross_prod(np.asarray(a, float), np.asarray(b, float))
    n = n / np.linalg.norm(n)
    return point_on_line(np.asarray(a, float), n, r_rad)


def point_to_right(a, b, r_rad: float):
    """S2::GetPointToRight (s2edge_distances.cc:69-75)."""
    import numpy as np

    from .clipping import robust_cross_prod
    from .polyline import point_on_line

    n = robust_cross_prod(np.asarray(b, float), np.asarray(a, float))
    n = n / np.linalg.norm(n)
    return point_on_line(np.asarray(a, float), n, r_rad)


def edge_pair_closest_points(a0, a1, b0, b1):
    """S2::GetEdgePairClosestPoints (s2edge_distances.cc:396-418):
    the pair (on-AB, on-CD) achieving the minimum distance; the
    intersection point doubled when the edges cross."""
    import numpy as np

    from . import predicates as P
    from .booleans import _intersection_point
    from .polyline import _project_to_edge

    a0 = np.asarray(a0, float)
    a1 = np.asarray(a1, float)
    b0 = np.asarray(b0, float)
    b1 = np.asarray(b1, float)
    if P.crossing_sign(a0, a1, b0, b1) > 0:
        x = _intersection_point(a0, a1, b0, b1)
        return x, x
    cands = [
        (float(point_edge_dist2(a0[None], b0[None], b1[None])[0, 0]), 0),
        (float(point_edge_dist2(a1[None], b0[None], b1[None])[0, 0]), 1),
        (float(point_edge_dist2(b0[None], a0[None], a1[None])[0, 0]), 2),
        (float(point_edge_dist2(b1[None], a0[None], a1[None])[0, 0]), 3),
    ]
    # strict-improvement order mirrors the reference's UpdateMinDistance
    best_d, best = cands[0]
    for d, k in cands[1:]:
        if d < best_d:
            best_d, best = d, k
    if best == 0:
        return a0, _project_to_edge(a0, b0, b1)
    if best == 1:
        return a1, _project_to_edge(a1, b0, b1)
    if best == 2:
        return _project_to_edge(b0, a0, a1), b0
    return _project_to_edge(b1, a0, a1), b1


def get_update_min_interior_distance_max_error(length2: float) -> float:
    """GetUpdateMinInteriorDistanceMaxError (s2edge_distances.cc:263-277):
    max error in the squared-chord distance from a point to the edge
    INTERIOR, for normalized inputs."""
    import math

    if length2 >= 2.0:  # >= Right
        return 0.0
    b = min(1.0, 0.5 * float(length2))
    a = math.sqrt(b * (2 - b))
    return ((2.5 + 2 * math.sqrt(3) + 8.5 * a) * a +
            (2 + 2 * math.sqrt(3) / 3 + 6.5 * (1 - b)) * b +
            (23 + 16 / math.sqrt(3)) * DBL_EPSILON) * DBL_EPSILON


def get_update_min_distance_max_error(length2: float) -> float:
    """GetUpdateMinDistanceMaxError (s2edge_distances.cc:279-284): max
    error in the squared-chord distance returned by UpdateMinDistance
    (interior OR endpoint case)."""
    return max(
        get_update_min_interior_distance_max_error(length2),
        float(s2point_constructor_max_error(length2)),
    )
