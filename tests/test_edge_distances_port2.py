"""Port of the remaining s2edge_distances_test.cc cases.

Covers (reference file:line cited per test):
- UpdateMinInteriorDistanceLowerBoundOptimizationIsConservative (:180)
- UpdateMinInteriorDistanceRejectionTestIsConservative (:193)
- ProjectError (:280)
- GetPointToLeftS1Angle / S1ChordAngle, GetPointToRightS1Angle /
  S1ChordAngle (:709-752)
"""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.clipping import robust_cross_prod
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.distance import (
    chord2,
    chord2_successor,
    chord2_to_angle,
    point_to_left,
    point_to_right,
    update_min_distance,
)
from s2geometry_spark.kernel.fractal import random_point, sample_cap_point
from s2geometry_spark.kernel.measures import turn_angle
from s2geometry_spark.kernel.metrics import meters_to_radians
from s2geometry_spark.kernel.polyline import _project_to_edge
from s2geometry_spark.kernel.voronoi import compare_edge_distance_chord2

DBL_ERR = np.finfo(float).eps / 2
# kProjectPerpendicularError (s2edge_distances.h:122-126) =
# (2 + 2/sqrt(3))·DBL_ERR + kRobustCrossProdError (6·DBL_ERR,
# s2edge_crossings.h:101)
K_PROJECT_PERPENDICULAR_ERROR = (2 + 2 / math.sqrt(3)) * DBL_ERR + 6 * DBL_ERR


def _pt(lat_deg, lng_deg):
    return np.asarray(
        latlng_to_xyz(np.array([lat_deg]), np.array([lng_deg]))
    ).reshape(3)


def _angle(x, y):
    """S1Angle(x, y) = atan2(|x×y|, x·y) — accurate for tiny angles where
    acos(x·y) loses ~sqrt(eps) (s1angle.h)."""
    return math.atan2(np.linalg.norm(np.cross(x, y)), float(np.dot(x, y)))


def test_update_min_interior_distance_lower_bound_optimization_is_conservative():
    """s2edge_distances_test.cc:180-191: the interior-distance lower bound
    must be conservative.  The reference asserts that re-running
    UpdateMinDistance with the successor of its own result still updates
    (i.e. the computed distance is genuinely ≤ successor(result)); here we
    additionally gate the double result against the exact rational
    predicate: the true distance must not exceed successor(result)."""
    x = np.array([-0.017952729194524016, -0.30232422079175203, 0.95303607751077712])
    a = np.array([-0.017894725505830295, -0.30229974986194175, 0.95304493075220664])
    b = np.array([-0.017986591360900289, -0.30233851195954353, 0.95303090543659963])
    d2 = update_min_distance(x, a, b)
    assert d2 >= 0.0
    succ = float(chord2_successor(d2))
    # exact check: true distance(x, ab) <= successor(d2)
    assert compare_edge_distance_chord2(x, a, b, succ) <= 0


def test_update_min_interior_distance_rejection_test_is_conservative():
    """s2edge_distances_test.cc:193-224: nearly-antipodal edges where a
    non-conservative rejection test used to skip the interior update.
    The computed distance must beat the pinned threshold."""
    threshold = 6.3897233584120815e-26
    cases = [
        (
            np.array([1.0, -4.6547732744037044e-11, -5.6374428459823598e-89]),
            np.array([1.0, -8.9031850507928352e-11, 0.0]),
            np.array([-0.99999999999996347, 2.7030110029169596e-07, 1.555092348806121e-99]),
        ),
        (
            np.array([1.0, -4.7617930898495072e-13, 0.0]),
            np.array([-1.0, -1.6065916409055676e-10, 0.0]),
            np.array([1.0, 0.0, 9.9964883247706732e-35]),
        ),
        (
            np.array([1.0, 0.0, 0.0]),
            np.array([1.0, -8.4965026896454536e-11, 0.0]),
            np.array([-0.99999999999966138, 8.2297529603339328e-07, 9.6070344113320997e-21]),
        ),
    ]
    for x, a, b in cases:
        d2 = update_min_distance(x, a, b)
        assert d2 < threshold, (d2, threshold)


def _choose_point(rng) -> np.ndarray:
    """ChoosePoint (s2edge_distances_test.cc:268-278): random point,
    components often squashed toward a coordinate plane/axis."""
    x = random_point(rng)
    for i in range(3):
        if rng.randint(3) == 0:
            x[i] *= 10.0 ** rng.uniform(-50, 0)
    return x / np.linalg.norm(x)


def test_project_error():
    """s2edge_distances_test.cc:280-293: Project() stays within
    kProjectPerpendicularError of the edge, verified with the EXACT
    CompareEdgeDistance predicate."""
    rng = np.random.RandomState(20260819)
    err2 = float(
        chord2(
            np.array([[1.0, 0.0, 0.0]]),
            np.array(
                [
                    [
                        math.cos(K_PROJECT_PERPENDICULAR_ERROR),
                        math.sin(K_PROJECT_PERPENDICULAR_ERROR),
                        0.0,
                    ]
                ]
            ),
        )[0]
    )
    for _ in range(300):
        a = _choose_point(rng)
        b = _choose_point(rng)
        n = robust_cross_prod(a, b)
        n = n / np.linalg.norm(n)
        x = sample_cap_point(rng, n, 1e-15)
        p = _project_to_edge(x, a, b)
        assert compare_edge_distance_chord2(p, a, b, err2) < 0


@pytest.mark.parametrize("use_chord", [False, True])
def test_get_point_to_left(use_chord):
    """GetPointToLeftS1Angle / S1ChordAngle (s2edge_distances_test.cc:709-729)."""
    a = _pt(0, 0)
    b = _pt(0, 5)  # east
    k_distance = meters_to_radians(10.0)
    r = k_distance
    if use_chord:
        # chord-angle roundtrip like the reference's S1ChordAngle ctor
        l2 = 4.0 * math.sin(0.5 * k_distance) ** 2
        r = float(chord2_to_angle(l2))
    c = point_to_left(a, b, r)
    assert abs(_angle(a, c) - k_distance) < 1e-15
    # CAB must be a right angle with C to the left of AB.
    assert abs(turn_angle(c, a, b) - math.pi / 2) < 1e-15


@pytest.mark.parametrize("use_chord", [False, True])
def test_get_point_to_right(use_chord):
    """GetPointToRightS1Angle / S1ChordAngle (s2edge_distances_test.cc:731-752)."""
    a = _pt(0, 0)
    b = _pt(0, 5)
    k_distance = meters_to_radians(10.0)
    r = k_distance
    if use_chord:
        l2 = 4.0 * math.sin(0.5 * k_distance) ** 2
        r = float(chord2_to_angle(l2))
    c = point_to_right(a, b, r)
    assert abs(_angle(a, c) - k_distance) < 1e-15
    assert abs(turn_angle(c, a, b) + math.pi / 2) < 1e-15
