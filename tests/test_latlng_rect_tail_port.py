"""s2latlng_rect_test.cc closing tranche: negative ExpandedByDistance
and the GetDirectedHausdorffDistance family (new kernel surface:
LatLngRect.get_directed_hausdorff_distance /
S1Interval.directed_hausdorff / GetBisectorIntersection).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.intervals import S1Interval
from s2geometry_spark.kernel.region import LatLng, LatLngRect

PI = math.pi


def rect(lat_lo, lng_lo, lat_hi, lng_hi):
    return LatLngRect.from_degrees(lat_lo, lng_lo, lat_hi, lng_hi)


def point_rect(lat, lng):
    return rect(lat, lng, lat, lng)


# --- ExpandedByDistance, negative (cc) -------------------------------------


def test_negative_distance_north_east():
    r = rect(0, 0, 30, 90)
    d = math.radians(5)
    out = r.expanded_by_distance(d).expanded_by_distance(-d)
    assert out.approx_equals(r, 1e-13), out


def test_negative_distance_south_west():
    r = rect(-30, -90, 0, 0)
    d = math.radians(5)
    out = r.expanded_by_distance(d).expanded_by_distance(-d)
    assert out.approx_equals(r, 1e-13), out


def test_negative_distance_lat_with_north_pole():
    out = rect(0, -90, 90, 180).expanded_by_distance(-math.radians(5))
    assert out.approx_equals(rect(5, 0, 85, 90), 1e-13), out


def test_negative_distance_lat_with_north_pole_and_lng_full():
    out = rect(0, -180, 90, 180).expanded_by_distance(-math.radians(5))
    assert out.approx_equals(rect(5, -180, 90, 180), 1e-13), out


def test_negative_distance_lat_with_south_pole():
    out = rect(-90, -90, 0, 180).expanded_by_distance(-math.radians(5))
    assert out.approx_equals(rect(-85, 0, -5, 90), 1e-13), out


def test_negative_distance_lat_with_south_pole_and_lng_full():
    out = rect(-90, -180, 0, 180).expanded_by_distance(-math.radians(5))
    assert out.approx_equals(rect(-90, -180, -5, 180), 1e-13), out


def test_negative_distance_lng_full():
    out = rect(0, -180, 30, 180).expanded_by_distance(-math.radians(5))
    assert out.approx_equals(rect(5, -180, 25, 180), 1e-13), out


def test_negative_distance_lat_result_empty():
    out = rect(0, 0, 9.9, 90).expanded_by_distance(-math.radians(5))
    assert out.is_empty(), out


def test_negative_distance_lng_result_empty():
    out = rect(0, 0, 30, 11).expanded_by_distance(-math.radians(5))
    assert out.is_empty(), out


# --- GetDirectedHausdorffDistance ------------------------------------------


def _verify_directed_hausdorff(a: LatLngRect, b: LatLngRect):
    """The reference's sampling harness (test cc:908-940): the sampled
    max-min distance lower-bounds the result within the sampling
    resolution and never exceeds it."""
    hd = a.get_directed_hausdorff_distance(b)
    res = 0.1
    n_lat = int(a.lat.get_length() / res) + 1
    n_lng = int(a.lng.get_length() / res) + 1
    d_lat = a.lat.get_length() / n_lat
    d_lng = a.lng.get_length() / n_lng
    max_distance = 0.0
    lng = a.lng.lo
    for _ in range(n_lng + 1):
        lat = a.lat.lo
        for _ in range(n_lat + 1):
            ll = LatLng(lat, lng).normalized()
            max_distance = max(max_distance, b.get_distance_latlng(ll))
            lat += d_lat
        lng += d_lng
    assert max_distance <= hd + 1e-10, (a, b, max_distance, hd)
    assert max_distance >= hd - res, (a, b, max_distance, hd)


def test_get_directed_hausdorff_distance_contained():
    a = rect(-10, 20, -5, 90)
    for other in [
        rect(-10, 20, -5, 90),
        rect(-10, 19, -5, 91),
        rect(-11, 20, -4, 90),
        rect(-11, 19, -4, 91),
    ]:
        assert a.get_directed_hausdorff_distance(other) == 0.0


def test_get_direct_hausdorff_distance_point_to_rect():
    a1 = point_rect(5, 8)
    a2 = point_rect(90, 10)  # north pole
    for b in [
        rect(-85, -50, -80, 10),
        rect(4, -10, 80, 10),
        rect(70, 170, 80, -170),
    ]:
        assert a1.get_directed_hausdorff_distance(b) == pytest.approx(
            a1.get_distance_rect(b), abs=1e-14
        )
        assert a2.get_directed_hausdorff_distance(b) == pytest.approx(
            a2.get_distance_rect(b), abs=1e-14
        )


def test_get_directed_hausdorff_distance_rect_to_point():
    a = rect(1, -8, 10, 20)
    for b in [
        point_rect(5, 8),
        point_rect(-6, -100),
        point_rect(-90, -20),  # south pole
        point_rect(90, 0),     # north pole
    ]:
        _verify_directed_hausdorff(a, b)


def test_get_directed_hausdorff_distance_rect_to_rect_near_pole():
    a = rect(-87, 0, -85, 3)
    for b in [
        rect(-89, 1, -88, 2),
        rect(-84, 1, -83, 2),
        rect(-88, 90, -86, 91),
        rect(-84, -91, -83, -90),
        rect(-90, 181, -89, 182),
        rect(-84, 181, -83, 182),
    ]:
        _verify_directed_hausdorff(a, b)


def test_get_directed_hausdorff_distance_rect_to_rect_degenerate_cases():
    _verify_directed_hausdorff(rect(0, 10, 90, 20), rect(-4, -10, 4, 0))
    _verify_directed_hausdorff(rect(-4, -10, 4, 0), rect(0, 10, 90, 20))

    a = rect(-50, -10, 50, 10)
    b = rect(30, -10, 60, 10)
    _verify_directed_hausdorff(a, b)
    c = LatLngRect(a.lat, a.lng.complement())
    _verify_directed_hausdorff(c, b)

    _verify_directed_hausdorff(rect(10, 170, 30, 180),
                               rect(-50, -10, 50, 10))
    _verify_directed_hausdorff(rect(10, -180, 30, -170),
                               rect(-50, -10, 50, 10))

    _verify_directed_hausdorff(rect(-30, 170, 30, 180),
                               rect(-10, -90, 10, 90))
    _verify_directed_hausdorff(rect(-30, -180, 30, -170),
                               rect(-10, -90, 10, 90))

    _verify_directed_hausdorff(rect(-20, 105, 20, 110),
                               rect(-30, 5, 30, 15))
    _verify_directed_hausdorff(rect(-20, 95, 20, 105),
                               rect(-30, 5, 30, 15))


def test_get_directed_hausdorff_distance_random_pairs():
    rng = np.random.RandomState(20260819)
    for _ in range(100):
        def rand_ll():
            v = rng.standard_normal(3)
            v /= np.linalg.norm(v)
            lat = math.asin(max(-1.0, min(1.0, v[2])))
            lng = math.atan2(v[1], v[0])
            return LatLng(lat, lng)

        a = LatLngRect.from_point_pair(rand_ll(), rand_ll())
        b = LatLngRect.from_point_pair(rand_ll(), rand_ll())
        a2 = LatLngRect(a.lat, a.lng.complement())
        b2 = LatLngRect(b.lat, b.lng.complement())
        _verify_directed_hausdorff(a, b)
        _verify_directed_hausdorff(a, b2)
        _verify_directed_hausdorff(a2, b)
        _verify_directed_hausdorff(a2, b2)
