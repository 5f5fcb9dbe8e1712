"""Port of the NaN/Inf/invalid-input reference cases and the predicates
residue (StableSign failure rate, SignDotProd, rounding_epsilon).

Covers: S2LatLng.InfIsInvalid/NanIsInvalid, LengthMetricTest/
AreaMetricTest.GetLevelOptModeDoesNotDieOnNaN, S2 (edge crosser)
InvalidDefaultPoints/InvalidNanPoints, S2.NaNInput (s2coords),
IsCanonical.InvalidS2CellId, rounding_epsilon.vs_numeric_limits,
StableSignTest.FailureRate, SignDotProd.{Orthogonal,
NearlyOrthogonalPositive,NearlyOrthogonalNegative}.
"""

import math

import numpy as np

from s2geometry_spark.kernel import coords as C
from s2geometry_spark.kernel import predicates as P
from s2geometry_spark.kernel.metrics import AVG_EDGE, MAX_AREA, MAX_LEVEL
from s2geometry_spark.kernel.region import LatLng

NAN = float("nan")
INF = float("inf")
DBL_EPSILON = np.finfo(float).eps


def test_latlng_inf_is_invalid():
    """s2latlng_test.cc:132-149: Inf coordinates are invalid, and
    Normalized() preserves the invalidity."""
    assert not LatLng.from_degrees(INF, -122).is_valid()
    assert not LatLng.from_degrees(37, INF).is_valid()
    assert not LatLng.from_degrees(INF, -122).normalized().is_valid()
    assert not LatLng.from_degrees(37, INF).normalized().is_valid()


def test_latlng_nan_is_invalid():
    """s2latlng_test.cc:151-168."""
    assert not LatLng.from_degrees(NAN, -122).is_valid()
    assert not LatLng.from_degrees(37, NAN).normalized().is_valid()
    assert not LatLng.from_degrees(NAN, -122).normalized().is_valid()


def test_metrics_get_level_does_not_die_on_nan():
    """LengthMetricTest/AreaMetricTest.GetLevelOptModeDoesNotDieOnNaN
    (s2metrics_test.cc:150-176): the exact result is unspecified; the
    property is no undefined behavior / no crash."""
    for metric in (AVG_EDGE, MAX_AREA):
        lv1 = metric.get_level_for_max_value(NAN)
        lv2 = metric.get_level_for_min_value(NAN)
        assert 0 <= lv1 <= MAX_LEVEL
        assert 0 <= lv2 <= MAX_LEVEL


def test_edge_crosser_invalid_default_points():
    """S2.InvalidDefaultPoints (s2edge_crosser_test.cc:72-78): the zero
    point — identical vertices mean the shared-vertex rule fires (0),
    and EdgeOrVertexCrossing is false."""
    p = np.zeros(3)
    assert P.crossing_sign(p, p, p, p) == 0
    assert P.edge_or_vertex_crossing(p, p, p, p) is False
    assert P.signed_edge_or_vertex_crossing(p, p, p, p) == 0


def test_edge_crosser_invalid_nan_points():
    """S2.InvalidNanPoints (s2edge_crosser_test.cc:80-87): NaN points
    never compare equal, so the crossing sign is -1 and nothing
    crashes."""
    p = np.full(3, NAN)
    assert P.crossing_sign(p, p, p, p) == -1
    assert P.edge_or_vertex_crossing(p, p, p, p) is False
    assert P.signed_edge_or_vertex_crossing(p, p, p, p) == 0


def test_coords_nan_input():
    """S2.NaNInput (s2coords_test.cc:275-289): STtoIJ(NaN) stays in
    [0, 2^30) — no undefined behavior."""
    ij = int(C.st_to_ij(np.array([NAN]))[0])
    assert 0 <= ij < (1 << 30)


def test_is_canonical_invalid_cellid():
    """IsCanonical.InvalidS2CellId (s2region_coverer_test.cc:356-359)."""
    from s2geometry_spark.kernel.cid import CID
    from s2geometry_spark.kernel.coverer import RegionCoverer

    cov = RegionCoverer()
    from s2geometry_spark.kernel import cellid as K

    face1 = CID(int(K.from_face([1])[0]))
    assert cov.is_canonical([face1])
    assert not cov.is_canonical([CID(0)])


def test_rounding_epsilon_vs_numeric_limits():
    """rounding_epsilon.vs_numeric_limits (s2predicates_test.cc:78-87):
    the rounding unit is epsilon/2 for float and double — the DBL_ERR
    convention every exact predicate in the kernel builds its bounds
    from."""
    assert 0.5 * float(np.finfo(np.float32).eps) == math.ldexp(1.0, -24)
    assert 0.5 * float(np.finfo(np.float64).eps) == math.ldexp(1.0, -53)


def _failure_rate(km: float, iters: int = 10000) -> float:
    """StableSignTest::GetFailureRate (s2predicates_test.cc:395-422):
    fraction of maximally-collinear triangles at the given spacing where
    StableSign is inconclusive; every conclusive answer must match
    ExactSign."""
    from s2geometry_spark.kernel.fractal import frame_at, random_point

    rng = np.random.RandomState(20260819 + int(km * 1000))
    m = math.tan(km / 6371.01)
    failures = 0
    # vectorized batch: build all triangles, stable-sign them in one call
    A = np.empty((iters, 3))
    B = np.empty((iters, 3))
    Cc = np.empty((iters, 3))
    for i in range(iters):
        frame = frame_at(rng, random_point(rng))
        a, x = frame[:, 2], frame[:, 0]
        b = a - m * x
        c = a + m * x
        A[i] = a
        B[i] = b / np.linalg.norm(b)
        Cc[i] = c / np.linalg.norm(c)
    stable = P._stable_sign_rows(A, B, Cc)
    for i in range(iters):
        s = int(stable[i])
        if s != 0:
            assert P.exact_sign(A[i], B[i], Cc[i], True) == s
        else:
            failures += 1
    return failures / iters


def test_stable_sign_failure_rate():
    """StableSignTest.FailureRate (s2predicates_test.cc:424-436):
    < 1% at 1 km spacing, < 10% at 10 km (TriageSign fails ~100%)."""
    assert _failure_rate(1.0) < 0.01
    assert _failure_rate(10.0) < 0.1


def test_sign_dot_prod_orthogonal():
    """SignDotProd.Orthogonal (s2predicates_test.cc:1177-1181): exactly
    orthogonal vectors need the exact tier and return 0."""
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    assert P.triage_sign_dot_prod(a, b) == 0
    assert P.sign_dot_prod(a, b) == 0


def test_sign_dot_prod_nearly_orthogonal_positive():
    """SignDotProd.NearlyOrthogonalPositive (s2predicates_test.cc:1183)."""
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([DBL_EPSILON, 1.0, 0.0])
    assert P.triage_sign_dot_prod(a, b) == 0  # below the 3.046875ε bound
    assert P.sign_dot_prod(a, b) == 1
    c = np.array([1e-45, 1.0, 0.0])
    assert P.sign_dot_prod(a, c) == 1


def test_sign_dot_prod_nearly_orthogonal_negative():
    """SignDotProd.NearlyOrthogonalNegative (s2predicates_test.cc:1193)."""
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([-DBL_EPSILON, 1.0, 0.0])
    assert P.triage_sign_dot_prod(a, b) == 0
    assert P.sign_dot_prod(a, b) == -1
    c = np.array([-1e-45, 1.0, 0.0])
    assert P.sign_dot_prod(a, c) == -1
