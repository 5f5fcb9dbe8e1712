"""s2edge_distances_test.cc closing tranche: extrapolating
interpolation, repeated-interpolation stability, the edge-pair
min/max distance matrices with closest points, and GetPointToLeft /
GetPointToRight.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.distance import (
    chord2_to_angle,
    edge_pair_closest_points,
    interpolate_edge,
    point_to_left,
    point_to_right,
)
from s2geometry_spark.kernel.distance_targets import (
    edge_pair_max_dist2,
    edge_pair_min_dist2,
)
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.measures import turn_angle

_STRAIGHT = 4.0


def _n(v):
    v = np.asarray(v, float)
    return v / np.linalg.norm(v)


def _ll(lat, lng):
    x, y, z = latlng_to_xyz(np.array([float(lat)]), np.array([float(lng)]))
    return np.array([x[0], y[0], z[0]])


def _angle(a, b):
    return math.atan2(float(np.linalg.norm(np.cross(a, b))), float(a @ b))


def _test_interpolate(a, b, t, expected):
    a, b, expected = _n(a), _n(b), _n(expected)
    got = interpolate_edge(a, b, t)
    # max expected error per the reference harness: 3e-15 absolute
    assert _angle(got, expected) <= 3e-15, (t, got, expected)


# --- InterpolateCanExtrapolate (cc:370-400) --------------------------------


def test_interpolate_can_extrapolate():
    i = np.array([1.0, 0, 0])
    j = np.array([0.0, 1, 0])
    _test_interpolate(i, j, 0, [1, 0, 0])
    _test_interpolate(i, j, 1, [0, 1, 0])
    _test_interpolate(i, j, 1.5, [-1, 1, 0])
    _test_interpolate(i, j, 2, [-1, 0, 0])
    _test_interpolate(i, j, 3, [0, -1, 0])
    _test_interpolate(i, j, 4, [1, 0, 0])

    _test_interpolate(i, j, -1, [0, -1, 0])
    _test_interpolate(i, j, -2, [-1, 0, 0])
    _test_interpolate(i, j, -3, [0, 1, 0])
    _test_interpolate(i, j, -4, [1, 0, 0])

    _test_interpolate(i, [1, 1, 0], 2, [0, 1, 0])
    _test_interpolate(i, [1, 1, 0], 3, [-1, 1, 0])
    _test_interpolate(i, [1, 1, 0], 4, [-1, 0, 0])

    _test_interpolate(i, [-1, 1, 0], 2, [0, -1, 0])

    p = interpolate_edge(i, j, 0.001)
    _test_interpolate(i, p, 1000, j)


# --- RepeatedInterpolation (cc:402-414) ------------------------------------


def test_repeated_interpolation():
    rng = np.random.RandomState(42)
    for _ in range(20):
        a = _n(rng.standard_normal(3))
        b = _n(rng.standard_normal(3))
        for _ in range(1000):
            a = interpolate_edge(a, b, 0.01)
        assert abs(float(a @ a) - 1.0) <= 5e-14


# --- EdgePairMinDistance (cc:456-516) --------------------------------------


def _check_min(a0, a1, b0, b1, dist_rad, ea, eb):
    a0, a1, b0, b1 = map(_n, (a0, a1, b0, b1))
    got_a, got_b = edge_pair_closest_points(a0, a1, b0, b1)
    if np.any(np.asarray(ea, float) != 0):
        assert _angle(got_a, _n(ea)) <= 1e-13, got_a
    else:
        assert np.array_equal(got_a, a0) or np.array_equal(got_a, a1)
    if np.any(np.asarray(eb, float) != 0):
        assert _angle(got_b, _n(eb)) <= 1e-13, got_b
    else:
        assert np.array_equal(got_b, b0) or np.array_equal(got_b, b1)
    d2 = edge_pair_min_dist2(a0, a1, b0, b1)
    assert abs(float(chord2_to_angle(d2)) - dist_rad) <= 1e-14


def test_edge_pair_min_distance():
    q = math.pi / 4
    h = math.pi / 2
    _check_min([1, 0, 1], [1, 0, 1], [1, -1, 0], [1, 1, 0],
               q, [1, 0, 1], [1, 0, 0])
    _check_min([1, -1, 0], [1, 1, 0], [1, 0, 1], [1, 0, 1],
               q, [1, 0, 0], [1, 0, 1])
    _check_min([1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 1, 0],
               h, [1, 0, 0], [0, 1, 0])
    _check_min([1, 0, 0], [1, 0, 0], [-1, 0, 0], [-1, 0, 0],
               math.pi, [1, 0, 0], [-1, 0, 0])
    _check_min([1, 0, 0], [0, 1, 0], [1, 0, 0], [0, 1, 0],
               0, [0, 0, 0], [0, 0, 0])
    _check_min([1, 0, 0], [1, 0, 0], [1, 0, 0], [1, 0, 0],
               0, [1, 0, 0], [1, 0, 0])
    # shared vertex, all four arrangements
    _check_min([1, 0, 0], [0, 1, 0], [0, 1, 0], [0, 1, 1],
               0, [0, 1, 0], [0, 1, 0])
    _check_min([0, 1, 0], [1, 0, 0], [0, 1, 0], [0, 1, 1],
               0, [0, 1, 0], [0, 1, 0])
    _check_min([1, 0, 0], [0, 1, 0], [0, 1, 1], [0, 1, 0],
               0, [0, 1, 0], [0, 1, 0])
    _check_min([0, 1, 0], [1, 0, 0], [0, 1, 1], [0, 1, 0],
               0, [0, 1, 0], [0, 1, 0])
    # interiors cross
    _check_min([1, -1, 0], [1, 1, 0], [1, 0, -1], [1, 0, 1],
               0, [1, 0, 0], [1, 0, 0])
    # closest distance between endpoints with ties
    _check_min([1, -1, 0], [1, 1, 0], [-1, 0, 0], [-1, 0, 1],
               math.acos(-0.5), [0, 0, 0], [-1, 0, 1])
    _check_min([-1, 0, 0], [-1, 0, 1], [1, -1, 0], [1, 1, 0],
               math.acos(-0.5), [-1, 0, 1], [0, 0, 0])
    _check_min([1, -1, 0], [1, 1, 0], [-1, 0, -1], [-1, 0, 1],
               math.acos(-0.5), [0, 0, 0], [0, 0, 0])


# --- EdgePairMaxDistance (cc:534-589) --------------------------------------


def _check_max(a0, a1, b0, b1, dist_rad):
    a0, a1, b0, b1 = map(_n, (a0, a1, b0, b1))
    d2 = edge_pair_max_dist2(a0, a1, b0, b1)
    assert abs(float(chord2_to_angle(d2)) - dist_rad) <= 1e-14


def test_edge_pair_max_distance():
    _check_max([1, 0, 0], [0, 1, 0], [1, 1, 0], [1, 1, 1],
               math.acos(1 / math.sqrt(3)))
    _check_max([1, 0, 1], [1, 0, 1], [1, -1, 0], [1, 1, 0],
               math.acos(0.5))
    _check_max([1, -1, 0], [1, 1, 0], [1, 0, 1], [1, 0, 1],
               math.acos(0.5))
    # both degenerate
    _check_max([1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 1, 0], math.pi / 2)
    # antipodal reflection of one edge crosses the other
    _check_max([1, 0, 0], [1, 1, 0], [0, -1, 0], [-1, -1, 0], math.pi)
    # shared endpoints
    _check_max([1, 0, 0], [0, 1, 0], [1, 0, 0], [0, 1, 0], math.pi / 2)


# --- GetPointToLeft / GetPointToRight (cc:709-752) -------------------------


def test_get_point_to_left():
    a = _ll(0, 0)
    b = _ll(0, 5)
    dist = 10 / 6371010.0  # MetersToAngle(10)
    c = point_to_left(a, b, dist)
    assert abs(_angle(a, c) - dist) <= 1e-15
    assert abs(turn_angle(c, a, b) - math.pi / 2) <= 1e-15


def test_get_point_to_right():
    a = _ll(0, 0)
    b = _ll(0, 5)
    dist = 10 / 6371010.0
    c = point_to_right(a, b, dist)
    assert abs(_angle(a, c) - dist) <= 1e-15
    assert abs(turn_angle(c, a, b) + math.pi / 2) <= 1e-15
