"""Edge-distance kernel fixtures — port of s2edge_distances_test.cc
(Distance :143-178, MaxDistance :236-265, Interpolate :320-368,
EdgeBNearEdgeA :633-708).  Exercises kernel/distance.py
(point_edge_dist2, the UpdateMaxDistance antipode identity,
is_edge_b_near_edge_a) and kernel/polyline._project_to_edge /
kernel/measures.polyline_interpolate."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.distance import (
    chord2_to_angle,
    is_edge_b_near_edge_a,
    point_edge_dist2,
)


def _n(*xyz):
    v = np.asarray(xyz, float)
    return v / np.linalg.norm(v)


def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
    return np.array([x, y, z], float)


def _parse_edge(s):
    a, b = s.split(",")
    la, ga = a.strip().split(":")
    lb, gb = b.strip().split(":")
    return _pt(float(la), float(ga)), _pt(float(lb), float(gb))


# (x, a, b, expected distance radians, expected closest point or None)
_DISTANCE_CASES = [
    # s2edge_distances_test.cc:144-177
    ((1, 0, 0), (1, 0, 0), (0, 1, 0), 0, (1, 0, 0)),
    ((0, 1, 0), (1, 0, 0), (0, 1, 0), 0, (0, 1, 0)),
    ((1, 3, 0), (1, 0, 0), (0, 1, 0), 0, (1, 3, 0)),
    ((0, 0, 1), (1, 0, 0), (0, 1, 0), math.pi / 2, (1, 0, 0)),
    ((0, 0, -1), (1, 0, 0), (0, 1, 0), math.pi / 2, (1, 0, 0)),
    ((-1, -1, 0), (1, 0, 0), (0, 1, 0), 0.75 * math.pi, None),
    ((0, 1, 0), (1, 0, 0), (1, 1, 0), math.pi / 4, (1, 1, 0)),
    ((0, -1, 0), (1, 0, 0), (1, 1, 0), math.pi / 2, (1, 0, 0)),
    ((0, -1, 0), (1, 0, 0), (-1, 1, 0), math.pi / 2, (1, 0, 0)),
    ((-1, -1, 0), (1, 0, 0), (-1, 1, 0), math.pi / 2, (-1, 1, 0)),
    ((1, 1, 1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(1.0 / 3)), (1, 1, 0)),
    ((1, 1, -1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(1.0 / 3)), (1, 1, 0)),
    ((-1, 0, 0), (1, 1, 0), (1, 1, 0), 0.75 * math.pi, (1, 1, 0)),
    ((0, 0, -1), (1, 1, 0), (1, 1, 0), math.pi / 2, (1, 1, 0)),
    ((-1, 0, 0), (1, 0, 0), (1, 0, 0), math.pi, (1, 0, 0)),
]


@pytest.mark.parametrize("x,a,b,want,closest", _DISTANCE_CASES)
def test_distance(x, a, b, want, closest):
    # CheckDistance (s2edge_distances_test.cc:84-120): distance via
    # UpdateMinDistance and the closest point via Project
    x, a, b = _n(*x), _n(*a), _n(*b)
    d2 = point_edge_dist2(x[None], a[None], b[None])[0, 0]
    assert abs(float(chord2_to_angle(d2)) - want) < 1e-12
    if closest is not None:
        from s2geometry_spark.kernel.polyline import _project_to_edge

        got = _project_to_edge(x, a, b)
        assert np.linalg.norm(got - _n(*closest)) < 1e-12


# (x, a, b, expected max distance radians) — s2edge_distances_test.cc:236-265
_MAX_DISTANCE_CASES = [
    ((1, 0, 1), (1, 0, 0), (0, 1, 0), math.pi / 2),
    ((1, 0, -1), (1, 0, 0), (0, 1, 0), math.pi / 2),
    ((0, 1, 1), (1, 0, 0), (0, 1, 0), math.pi / 2),
    ((0, 1, -1), (1, 0, 0), (0, 1, 0), math.pi / 2),
    ((1, 1, 1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(2.0 / 3))),
    ((1, 1, -1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(2.0 / 3))),
    ((1, 0, 0), (1, 1, 0), (1, -1, 0), math.pi / 4),
    ((0, 1, 0), (1, 1, 0), (-1, 1, 0), math.pi / 4),
    ((0, 0, 1), (0, 1, 1), (0, -1, 1), math.pi / 4),
    ((0, 0, 1), (1, 0, 0), (1, 0, -1), 3 * math.pi / 4),
    ((0, 0, 1), (1, 0, 0), (1, 1, -math.sqrt(2)), 3 * math.pi / 4),
    ((0, 0, 1), (0, 0, -1), (0, 0, -1), math.pi),
]


@pytest.mark.parametrize("x,a,b,want", _MAX_DISTANCE_CASES)
def test_max_distance(x, a, b, want):
    # CheckMaxDistance via the antipode-reflection identity used by
    # find_furthest_edges (s2edge_distances.cc:236-249: the max angle
    # from x to AB is pi minus the min angle from -x)
    x, a, b = _n(*x), _n(*a), _n(*b)
    min_d2 = point_edge_dist2(-x[None], a[None], b[None])[0, 0]
    got = float(chord2_to_angle(4.0 - min_d2))
    assert abs(got - want) < 1e-12


def test_interpolate():
    # s2edge_distances_test.cc:320-356 (non-antipodal cases; our
    # interpolation is fraction-of-length over a 2-vertex polyline)
    from s2geometry_spark.kernel.measures import polyline_interpolate

    p1 = _n(0.1, 1e-30, 0.3)
    p2 = _n(-0.7, -0.55, -1e30)

    def check(a, b, t, want, tol=3e-15):
        got = polyline_interpolate(np.array([a, b]), t)
        assert np.linalg.norm(got - want) < tol, (t, got, want)

    # zero-length edges
    check(p1, p1, 0, p1)
    check(p1, p1, 1, p1)
    check(_n(1, 0, 0), _n(1, 0, 0), 0.5, _n(1, 0, 0))
    check(p1, p1, 0.5, p1)
    # start, end, middle of a medium-length edge
    check(p1, p2, 0, p1)
    check(p1, p2, 1, p2)
    check(p1, p2, 0.5, _n(*(0.5 * (p1 + p2))), tol=3e-15)
    # interpolation uses spherical, not linear, distance
    check(_n(1, 0, 0), _n(0, 1, 0), 1.0 / 3, _n(math.sqrt(3), 1, 0))
    check(_n(1, 0, 0), _n(0, 1, 0), 2.0 / 3, _n(1, math.sqrt(3), 0))
    # long (but not near-antipodal) edge stays accurate
    k_lng = math.pi - 1e-2
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([math.cos(k_lng), math.sin(k_lng), 0.0])
    f = 0.4
    while f > 1e-10:
        want = np.array([math.cos(f * k_lng), math.sin(f * k_lng), 0.0])
        got = polyline_interpolate(np.array([a, b]), f)
        assert np.linalg.norm(got - want) < 1e-9, f
        f *= 0.1


# (a_str, b_str, tolerance_degrees, expected) — s2edge_distances_test.cc:633-708
_EDGE_B_NEAR_EDGE_A_CASES = [
    ("5:5, 10:-5", "5:5, 10:-5", 1e-6, True),     # edge near itself
    ("5:5, 10:-5", "10:-5, 5:5", 1e-6, True),     # near its reverse
    ("10:0, -10:0", "2:1, -2:1", 1.0, True),      # short near long
    ("2:1, -2:1", "10:0, -10:0", 1.0, False),     # long not near short
    ("10:0, -10:0", "0:1.5, 0:-1.5", 1.0, False),  # orthogonal crossing
    ("10:0, -10:0", "0:1.5, 0:-1.5", 2.0, True),   # ...unless all of B close
    # consecutive lines of longitude bow apart at the equator
    ("89:1, -89:1", "89:2, -89:2", 0.5, False),
    ("89:1, -89:1", "89:2, -89:2", 1.5, True),
    ("89:1, -89:1", "-89:2, 89:2", 1.5, True),     # direction-independent
    # maximum at B's interior point equidistant from A's endpoints
    ("0:-100, 0:100", "5:-80, -5:80", 70.0, False),
    ("0:-100, 0:100", "1:-35, 10:35", 70.0, False),
    ("0:-100, 0:100", "5:80, -5:-80", 70.0, False),  # direction-independent
    # nearly-antipodal arcs with close endpoints but opposite midpoints
    ("0:-179.75, 0:-0.25", "0:179.75, 0:0.25", 1.0, False),
    # southern point too far for the short-circuiting logic
    ("40:0, -5:0", "39:0.975, -1:0.975", 1.0, True),
    # reversed orientation: plane angle 170.25 but separation still 9.75
    ("10:0, -10:0", "-.4:0.975, 0.4:0.975", 1.0, True),
    # same great circle, partial overlap shorter than tolerance
    ("0:0, 1:0", "0.9:0, 1.1:0", 0.25, True),
    # same great circle, B near A's endpoint
    ("0:0, 1:0", "1.1:0, 1.2:0", 0.25, True),
    # reversed: projection of A's normal onto B's plane is null
    ("0:0, 1:0", "1.2:0, 1.1:0", 0.25, True),
]


@pytest.mark.parametrize("a_str,b_str,tol_deg,want", _EDGE_B_NEAR_EDGE_A_CASES)
def test_edge_b_near_edge_a(a_str, b_str, tol_deg, want):
    a0, a1 = _parse_edge(a_str)
    b0, b1 = _parse_edge(b_str)
    got = is_edge_b_near_edge_a(a0, a1, b0, b1, math.radians(tol_deg))
    assert got == want, (a_str, b_str, tol_deg)
