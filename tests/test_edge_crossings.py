"""Port of s2edge_crossings_test.cc — the RobustCrossProd precision-tier
harness and the GetIntersection error/invariant suites.

Tiers on this platform mirror the reference's no-long-double (armv7)
configuration: DOUBLE → EXACT → SYMBOLIC (the test file itself defines
kLongDoublePrecision = EXACT when long double == double,
s2edge_crossings_test.cc:203-206).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pytest

from s2geometry_spark.kernel import predicates as P
from s2geometry_spark.kernel.booleans import (
    _compare_edges,
    _intersection_exact,
    _intersection_point,
)
from s2geometry_spark.kernel.clipping import (
    exact_cross_prod,
    robust_cross_prod,
    stable_cross_prod,
    symbolic_cross_prod,
)
from s2geometry_spark.kernel.distance import update_min_distance
from s2geometry_spark.kernel.fractal import make_regular_points

DBL_EPSILON = 2.220446049250313e-16
DBL_ERR = 0.5 * DBL_EPSILON
ROBUST_CROSS_PROD_ERROR = 6 * DBL_ERR
EXACT_CROSS_PROD_ERROR = DBL_ERR
INTERSECTION_ERROR = 8 * DBL_ERR


def norm(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def _exact_is_zero(a, b) -> bool:
    fa = [Fraction(float(t)) for t in a]
    fb = [Fraction(float(t)) for t in b]
    return all(
        v == 0
        for v in (
            fa[1] * fb[2] - fa[2] * fb[1],
            fa[2] * fb[0] - fa[0] * fb[2],
            fa[0] * fb[1] - fa[1] * fb[0],
        )
    )


def robust_cross_prod_precision(a, b) -> str:
    """Which tier RobustCrossProd used (mirrors the Precision enum)."""
    if stable_cross_prod(a, b) is not None:
        return "double"
    if tuple(a) == tuple(b):
        return "exact"  # Ortho short-circuit; not reached by the tests
    return "symbolic" if _exact_is_zero(a, b) else "exact"


def angle_between(u: np.ndarray, v: np.ndarray) -> float:
    return math.atan2(float(np.linalg.norm(np.cross(u, v))), float(u @ v))


def check_robust_cross_prod_error(a, b) -> str:
    """TestRobustCrossProdError (s2edge_crossings_test.cc:111-180):
    consistency with Sign, straddle tests, negation identities, and the
    distance-to-exact bound.  Returns the precision tier used."""
    k_max_error = (
        ROBUST_CROSS_PROD_ERROR + EXACT_CROSS_PROD_ERROR + 2 * DBL_ERR
    )
    result = norm(robust_cross_prod(a, b))

    offset = ROBUST_CROSS_PROD_ERROR * result
    a90 = np.cross(result, a)
    assert int(P.sign(a[None], b[None], result[None])[0]) == 1
    assert float(result @ (a + offset)) > 0
    assert float(result @ (a - offset)) < 0
    assert float(result @ (a90 + offset)) > 0
    assert float(result @ (a90 - offset)) < 0

    have_exact = not _exact_is_zero(a, b)
    if have_exact:
        assert np.array_equal(norm(robust_cross_prod(-a, b)), -result)
        assert np.array_equal(norm(robust_cross_prod(a, -b)), -result)
    if tuple(a) == tuple(b):
        result_exact = norm(P.ortho(a))
    else:
        result_exact = norm(exact_cross_prod(a, b))
        assert np.array_equal(norm(robust_cross_prod(b, a)), -result)

    stable = stable_cross_prod(a, b)
    if stable is not None:
        result_dbl = norm(stable)
        assert np.array_equal(result_dbl, result)
        assert angle_between(result_dbl, result_exact) < k_max_error
        return "double"
    assert np.array_equal(result_exact, result)
    return "exact" if have_exact else "symbolic"


def check_robust_cross_prod(a, b, expected_result, expected_prec):
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    expected_result = np.asarray(expected_result, float)
    assert int(P.sign(a[None], b[None], expected_result[None])[0]) == 1
    assert np.array_equal(norm(robust_cross_prod(a, b)), expected_result)
    assert check_robust_cross_prod_error(a, b) == expected_prec


def test_robust_cross_prod_coverage():
    """RobustCrossProdCoverage (s2edge_crossings_test.cc:191-240); the
    16*DBL_ERR / LD_ERR rows use the no-long-double expectation EXACT."""
    check_robust_cross_prod((1, 0, 0), (0, 1, 0), (0, 0, 1), "double")
    check_robust_cross_prod(
        (20 * DBL_ERR, 1, 0), (0, 1, 0), (0, 0, 1), "double"
    )
    check_robust_cross_prod(
        (16 * DBL_ERR, 1, 0), (0, 1, 0), (0, 0, 1), "exact"
    )
    # 5 * LD_ERR and 4 * LD_ERR rows: LD_ERR == DBL_ERR here
    check_robust_cross_prod(
        (5 * DBL_ERR, 1, 0), (0, 1, 0), (0, 0, 1), "exact"
    )
    check_robust_cross_prod(
        (4 * DBL_ERR, 1, 0), (0, 1, 0), (0, 0, 1), "exact"
    )
    # Exact results scaled up when they would be too small,
    check_robust_cross_prod((5e-324, 1, 0), (0, 1, 0), (0, 0, 1), "exact")
    # even when the exact cross product underflows in double precision.
    check_robust_cross_prod(
        (5e-324, 1, 0), (5e-324, 1 - DBL_ERR, 0), (0, 0, -1), "exact"
    )
    # Symbolic results.
    check_robust_cross_prod(
        (1, 0, 0), (1 + DBL_EPSILON, 0, 0), (0, 1, 0), "symbolic"
    )
    check_robust_cross_prod(
        (0, 1 + DBL_EPSILON, 0), (0, 1, 0), (1, 0, 0), "symbolic"
    )
    check_robust_cross_prod((0, 0, 1), (0, 0, -1), (-1, 0, 0), "symbolic")
    # Symbolic perturbation cases that can't happen in practice.
    assert np.array_equal(
        symbolic_cross_prod(np.array([-1.0, 0, 0]), np.zeros(3)),
        np.array([0.0, 1, 0]),
    )
    assert np.array_equal(
        symbolic_cross_prod(np.zeros(3), np.array([0.0, -1, 0])),
        np.array([1.0, 0, 0]),
    )
    assert np.array_equal(
        symbolic_cross_prod(np.zeros(3), np.array([0.0, 0, -1])),
        np.array([-1.0, 0, 0]),
    )


def test_symbolic_cross_prod_consistent_with_sign():
    """SymbolicCrossProdConsistentWithSign (test.cc:242-262): all component
    orderings of A and scalings of B = scale * A."""
    for x in (-1.0, 0.0, 1.0):
        for y in (-1.0, 0.0, 1.0):
            for z in (-1.0, 0.0, 1.0):
                v = np.array([x, y, z])
                n2 = float(v @ v)
                if n2 == 0:
                    continue
                a = v / math.sqrt(n2)
                for scale in (-1.0, 1 - DBL_ERR, 1 + 2 * DBL_ERR):
                    b = scale * a
                    r = norm(robust_cross_prod(a, b))
                    assert int(P.sign(a[None], b[None], r[None])[0]) > 0


def test_robust_cross_prod_magnitude():
    """RobustCrossProdMagnitude (test.cc:264-284): angles measurable
    without underflow, including through the symbolic tier."""
    assert (
        angle_between(
            robust_cross_prod(np.array([1.0, 0, 0]), np.array([1.0, 1e-100, 0])),
            robust_cross_prod(np.array([1.0, 0, 0]), np.array([1.0, 0, 1e-100])),
        )
        == math.pi / 2
    )
    assert (
        angle_between(
            robust_cross_prod(
                np.array([-1e-100, 0, 1]), np.array([1e-100, 0, -1])
            ),
            robust_cross_prod(
                np.array([0, -1e-100, 1]), np.array([0, 1e-100, -1])
            ),
        )
        == math.pi / 2
    )


def _random_point(rng) -> np.ndarray:
    return norm(rng.standard_normal(3))


def _choose_point(rng) -> np.ndarray:
    """ChoosePoint (test.cc:289-304): points often near coordinate
    planes/axes, with denormalized / zero-when-squared components."""
    while True:
        x = _random_point(rng)
        for i in range(3):
            u = rng.random()
            if rng.random() < 0.25:  # denormalized
                x[i] *= 2.0 ** (-1022 - 53 * u)
            elif rng.random() < 1 / 3:  # zero when squared
                x[i] *= 2.0 ** (-511 - 511 * u)
            elif rng.random() < 0.5:  # simply small
                x[i] *= 2.0 ** (-100 * u)
        n2 = float(x @ x)
        if n2 >= math.ldexp(1, -968):
            return x / math.sqrt(n2)


def _perturb_length(rng, p: np.ndarray) -> np.ndarray:
    """PerturbLength (test.cc:308-319): scale within IsUnitLength's EXACT
    tolerance (|q|² within 4*DBL_EPSILON of 1, checked in rationals)."""
    q = p * rng.uniform(1 - 2 * DBL_EPSILON, 1 + 2 * DBL_EPSILON)
    n2 = sum(Fraction(float(t)) ** 2 for t in q)
    if abs(n2 - 1) <= 4 * DBL_EPSILON:
        return q
    return p


def _log_uniform(rng, lo: float, hi: float) -> float:
    return math.exp(rng.uniform(math.log(lo), math.log(hi)))


def _point_on_line(a: np.ndarray, dir_pt: np.ndarray, r: float) -> np.ndarray:
    """S2::GetPointOnLine: walk distance r from a towards dir_pt."""
    d = dir_pt - float(dir_pt @ a) * a
    dn = np.linalg.norm(d)
    if dn == 0:
        return a.copy()
    d = d / dn
    return norm(math.cos(r) * a + math.sin(r) * d)


def test_robust_cross_prod_error():
    """RobustCrossProdError (test.cc:321-347), 1200 random near-degenerate
    pairs (5000 in the reference; reduced for Python runtime)."""
    rng = np.random.default_rng(20260818)
    tally = {"double": 0, "exact": 0, "symbolic": 0}
    for _ in range(1200):
        while True:
            a = _perturb_length(rng, _choose_point(rng))
            dir_pt = _choose_point(rng)
            r = math.pi / 2 * 2.0 ** (-53 * rng.random())
            if rng.random() < 1 / 3:
                r *= 2.0 ** (-1022 * rng.random())
            b = _perturb_length(rng, _point_on_line(a, dir_pt, r))
            if rng.random() < 0.5:
                b = -b
            if tuple(a) != tuple(b):
                break
        tally[check_robust_cross_prod_error(a, b)] += 1
    # The harness is skewed towards degeneracies; every tier must fire.
    assert tally["double"] > 0 and tally["exact"] > 0


def test_angle_contains_vertex():
    """AngleContainsVertex (test.cc:349-371)."""
    a = np.array([1.0, 0, 0])
    b = np.array([0.0, 1, 0])
    ref_b = P.ortho(b)

    assert not P.angle_contains_vertex(a, b, a)  # degenerate angle ABA
    assert P.angle_contains_vertex(ref_b, b, a)  # A == RefDir(B)
    assert not P.angle_contains_vertex(a, b, ref_b)  # C == RefDir(B)

    # Tiling polygons around a vertex: exactly one contains it.
    pts = make_regular_points(b, math.radians(10), 10)
    count = sum(
        P.angle_contains_vertex(pts[(i + 1) % len(pts)], b, pts[i])
        for i in range(len(pts))
    )
    assert count == 1


def _edge_distance_angle(x, a, b) -> float:
    """S2::GetDistance(x, a, b) as an angle in radians."""
    d2 = update_min_distance(x, a, b)
    return 2 * math.asin(0.5 * math.sqrt(min(d2, 4.0)))


def _intersection_exact_oriented(a0, a1, b0, b1) -> np.ndarray:
    """The test file's GetIntersectionExact wrapper (test.cc:422-427):
    reorient towards the edge midpoints."""
    x = _intersection_exact(a0, a1, b0, b1)
    if float(x @ ((a0 + a1) + (b0 + b1))) < 0:
        x = -x
    return x


def _random_frame(rng):
    p = _random_point(rng)
    d1 = norm(np.cross(p, _random_point(rng)))
    d2 = np.cross(p, d1)
    return p, d1, d2


GET_DISTANCE_ABS_ERROR = 3 * DBL_EPSILON


def test_intersection_error():
    """IntersectionError (test.cc:432-506), 1200 crossing pairs (5000 in
    the reference): the computed intersection is within kIntersectionError
    of the exact one and of both edges."""
    rng = np.random.default_rng(42)
    max_point_dist = 0.0
    max_edge_dist = 0.0
    for _ in range(1200):
        p, d1, d2 = _random_frame(rng)
        slope = _log_uniform(rng, 1e-15, 1e15)
        d2 = norm(d1 + slope * d2)
        while True:
            ab_len = _log_uniform(rng, 1e-15, 1.0)
            cd_len = _log_uniform(rng, 1e-15, 1.0)
            a_fr = _log_uniform(rng, 1e-5, 1.0)
            if rng.random() < 0.5:
                a_fr = 1 - a_fr
            c_fr = _log_uniform(rng, 1e-5, 1.0)
            if rng.random() < 0.5:
                c_fr = 1 - c_fr
            a = norm(p - a_fr * ab_len * d1)
            b = norm(p + (1 - a_fr) * ab_len * d1)
            c = norm(p - c_fr * cd_len * d2)
            d = norm(p + (1 - c_fr) * cd_len * d2)
            if P.crossing_sign(a, b, c, d) > 0:
                break
        assert _edge_distance_angle(p, a, b) <= (
            1.5 * DBL_EPSILON + GET_DISTANCE_ABS_ERROR
        )
        assert _edge_distance_angle(p, c, d) <= (
            1.5 * DBL_EPSILON + GET_DISTANCE_ABS_ERROR
        )

        expected = _intersection_exact_oriented(a, b, c, d)
        assert _edge_distance_angle(expected, a, b) <= (
            3 * DBL_EPSILON + GET_DISTANCE_ABS_ERROR
        )
        assert _edge_distance_angle(expected, c, d) <= (
            3 * DBL_EPSILON + GET_DISTANCE_ABS_ERROR
        )
        assert angle_between(expected, p) <= (
            3 * DBL_EPSILON / slope + INTERSECTION_ERROR
        )

        actual = _intersection_point(a, b, c, d)
        dist_ab = _edge_distance_angle(actual, a, b)
        dist_cd = _edge_distance_angle(actual, c, d)
        assert dist_ab <= INTERSECTION_ERROR + GET_DISTANCE_ABS_ERROR
        assert dist_cd <= INTERSECTION_ERROR + GET_DISTANCE_ABS_ERROR
        max_edge_dist = max(max_edge_dist, dist_ab, dist_cd)
        point_dist = angle_between(expected, actual)
        assert point_dist <= INTERSECTION_ERROR
        max_point_dist = max(max_point_dist, point_dist)


def _choose_semicircle_point(rng, x, y) -> np.ndarray:
    sign = -1.0 if rng.random() < 0.5 else 1.0
    return norm(x + sign * _log_uniform(rng, 1e-15, 1e3) * y)


def test_grazing_intersections():
    """GrazingIntersections (test.cc:518-552), 400 nearly-collinear
    triples (1000 in the reference): relative ordering of intersection
    points along AB."""
    rng = np.random.default_rng(7)
    for _ in range(400):
        x, y, _z = _random_frame(rng)
        while True:
            a = _choose_semicircle_point(rng, x, y)
            b = _choose_semicircle_point(rng, x, y)
            c = _choose_semicircle_point(rng, x, y)
            d = _choose_semicircle_point(rng, x, y)
            e = _choose_semicircle_point(rng, x, y)
            ab = np.cross(a - b, a + b)
            if (
                np.linalg.norm(ab) >= 50 * DBL_EPSILON
                and P.crossing_sign(a, b, c, d) > 0
                and P.crossing_sign(a, b, c, e) > 0
            ):
                break
        xcd = _intersection_point(a, b, c, d)
        xce = _intersection_point(a, b, c, e)
        ab = norm(ab)
        if angle_between(xcd, xce) > 2 * INTERSECTION_ERROR:
            cde = int(P.sign(c[None], d[None], e[None])[0])
            cab = int(P.sign(c[None], a[None], b[None])[0])
            ordered = int(P.sign(ab[None], xcd[None], xce[None])[0]) > 0
            assert (cde == cab) == ordered


def test_exact_intersection_underflow():
    """ExactIntersectionUnderflow (test.cc:554-561)."""
    a0 = np.array([1.0, 0, 0])
    a1 = np.array([1.0, 2e-300, 0])
    b0 = np.array([1.0, 1e-300, 0])
    b1 = np.array([1.0, 3e-300, 0])
    assert np.array_equal(
        _intersection_point(a0, a1, b0, b1), np.array([1.0, 1e-300, 0])
    )


def test_exact_intersection_sign():
    """ExactIntersectionSign (test.cc:563-572): exactly collinear edges
    with nearly antipodal endpoints."""
    a0 = np.array([-1.0, -1.6065916409055676e-10, 0])
    a1 = np.array([1.0, 0, 0])
    b0 = np.array([1.0, -4.7617930898495072e-13, 0])
    b1 = np.array([-1.0, 1.2678623820887328e-09, 0])
    assert np.array_equal(
        _intersection_point(a0, a1, b0, b1),
        np.array([1.0, -4.7617930898495072e-13, 0]),
    )


def test_get_intersection_invariants():
    """GetIntersectionInvariants (test.cc:574-613), 2000 equal-length
    crossing pairs (x/y swap preserves Norm2 order of addition): the
    result must be bit-identical under operand swap/reversal."""
    rng = np.random.default_rng(99)
    for _ in range(2000):
        while True:
            a = c = _random_point(rng)
            b = d = _random_point(rng)
            c = np.array([c[1], c[0], c[2]])
            d = np.array([d[1], d[0], d[2]])
            if P.crossing_sign(a, b, c, d) > 0:
                break
        def norm2(u, v):
            w = u - v
            return (w[0] * w[0] + w[1] * w[1]) + w[2] * w[2]

        assert norm2(a, b) == norm2(c, d)
        result = _intersection_point(a, b, c, d)
        if rng.random() < 0.5:
            a, b = b, a
        if rng.random() < 0.5:
            c, d = d, c
        if rng.random() < 0.5:
            a, c = c, a
            b, d = d, b
        assert np.array_equal(result, _intersection_point(a, b, c, d))


def test_compare_edges_order_invariant():
    """CompareEdgesOrderInvariant (test.cc:615-622)."""
    v0 = np.array([0.0, 1, 0])
    v1 = np.array([1.0, 0, 0])
    assert not _compare_edges(v0, v1, v0, v1)
    assert not _compare_edges(v1, v0, v0, v1)
    assert not _compare_edges(v0, v1, v1, v0)
    assert not _compare_edges(v1, v0, v1, v0)
