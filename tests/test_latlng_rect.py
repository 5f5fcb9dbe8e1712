"""S2LatLngRect fixture tranche (s2latlng_rect_test.cc): constructors,
accessors, interval-op matrix, boundary intersection, AddPoint,
Expanded/PolarClosure/ExpandedByDistance, cap bounds, area, centroid,
and the GetDistance family verified against the reference's brute-force
helpers.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.distance import chord2_to_angle, point_edge_dist2
from s2geometry_spark.kernel.fractal import random_point
from s2geometry_spark.kernel.intervals import R1Interval, S1Interval
from s2geometry_spark.kernel.predicates import sign
from s2geometry_spark.kernel.region import Cap, LatLng, LatLngRect

PI = math.pi


def rect_from_degrees(lat_lo, lng_lo, lat_hi, lng_hi) -> LatLngRect:
    """RectFromDegrees with S2LatLng::Normalized semantics."""
    def norm(lat, lng):
        return LatLng(
            math.radians(max(-90.0, min(90.0, lat))),
            math.remainder(math.radians(lng), 2 * PI),
        )

    lo, hi = norm(lat_lo, lng_lo), norm(lat_hi, lng_hi)
    return LatLngRect(
        R1Interval(lo.lat, hi.lat), S1Interval(lo.lng, hi.lng)
    )


def point_rect(lat, lng) -> LatLngRect:
    return rect_from_degrees(lat, lng, lat, lng)


def rect_eq(a: LatLngRect, b: LatLngRect) -> bool:
    return (a.lat.lo, a.lat.hi, a.lng.lo, a.lng.hi) == (
        b.lat.lo, b.lat.hi, b.lng.lo, b.lng.hi
    ) or (a.is_empty() and b.is_empty())


def ll_deg(lat, lng) -> LatLng:
    return LatLng(math.radians(lat), math.remainder(math.radians(lng), 2 * PI))


def test_empty_and_full():
    empty, full = LatLngRect.empty(), LatLngRect.full()
    assert empty.is_valid() and empty.is_empty() and not empty.is_point()
    assert full.is_valid() and full.is_full() and not full.is_point()


def test_accessors():
    d1 = rect_from_degrees(-90, 0, -45, 180)
    assert math.degrees(d1.lat.lo) == -90
    assert math.degrees(d1.lat.hi) == -45
    assert math.degrees(d1.lng.lo) == 0
    assert abs(abs(math.degrees(d1.lng.hi)) - 180) < 1e-12


def test_approx_equals():
    assert LatLngRect.empty().approx_equals(rect_from_degrees(1, 5, 1, 5))
    assert rect_from_degrees(1, 5, 1, 5).approx_equals(LatLngRect.empty())
    assert not rect_from_degrees(1, 5, 1, 5).approx_equals(
        rect_from_degrees(2, 7, 2, 7)
    )
    assert rect_from_degrees(10, 10, 20, 20).approx_equals(
        rect_from_degrees(11, 11, 19, 19), math.radians(1.001)
    )
    assert not rect_from_degrees(10, 10, 20, 20).approx_equals(
        rect_from_degrees(11, 11, 19, 19), math.radians(0.999)
    )


def test_from_center_size():
    assert LatLngRect.from_center_size(
        ll_deg(80, 170), ll_deg(40, 60)
    ).approx_equals(rect_from_degrees(60, 140, 90, -160))
    assert LatLngRect.from_center_size(
        ll_deg(10, 40), LatLng(math.radians(210), math.radians(400))
    ).is_full()
    assert LatLngRect.from_center_size(
        ll_deg(-90, 180), ll_deg(20, 50)
    ).approx_equals(rect_from_degrees(-90, 155, -80, -155))


def test_from_point():
    p = ll_deg(23, 47)
    r = LatLngRect.from_point(p)
    assert rect_eq(r, LatLngRect(R1Interval(p.lat, p.lat),
                                 S1Interval(p.lng, p.lng)))
    assert r.is_point()


def test_from_point_pair():
    assert rect_eq(
        LatLngRect.from_point_pair(ll_deg(-35, -140), ll_deg(15, 155)),
        rect_from_degrees(-35, 155, 15, -140),
    )
    assert rect_eq(
        LatLngRect.from_point_pair(ll_deg(25, -70), ll_deg(-90, 80)),
        rect_from_degrees(-90, -70, 25, 80),
    )


def test_get_center_size():
    r1 = LatLngRect(R1Interval(0, PI / 2), S1Interval(-PI, 0))
    assert r1.get_center().lat == PI / 4
    assert r1.get_center().lng == -PI / 2
    assert r1.get_size().lat == PI / 2
    assert r1.get_size().lng == PI
    assert LatLngRect.empty().get_size().lat < 0
    assert LatLngRect.empty().get_size().lng < 0


def test_get_vertex():
    r1 = LatLngRect(R1Interval(0, PI / 2), S1Interval(-PI, 0))
    assert (r1.get_vertex(0).lat, r1.get_vertex(0).lng) == (0, PI) or \
        (r1.get_vertex(0).lat, r1.get_vertex(0).lng) == (0, -PI)
    assert (r1.get_vertex(1).lat, r1.get_vertex(1).lng) == (0, 0)
    assert (r1.get_vertex(2).lat, r1.get_vertex(2).lng) == (PI / 2, 0)
    # CCW ordering under Sign for a sample of rects
    for i in range(4):
        lat = PI / 4 * (i - 2)
        lng = PI / 2 * (i - 2) + 0.2
        r = LatLngRect(
            R1Interval(lat, lat + PI / 4),
            S1Interval(
                math.remainder(lng, 2 * PI),
                math.remainder(lng + PI / 2, 2 * PI),
            ),
        )
        v = [r.get_vertex(k).to_point() for k in range(4)]
        for k in range(4):
            assert int(sign(
                v[(k - 1) % 4][None], v[k][None], v[(k + 1) % 4][None]
            )[0]) > 0


def test_contains():
    eq_m180 = LatLng(0, -PI)
    north_pole = LatLng(PI / 2, 0)
    r1 = LatLngRect.from_point_pair(eq_m180, north_pole)
    assert r1.contains_latlng(ll_deg(30, -45))
    assert r1.interior_contains_latlng(ll_deg(30, -45))
    assert not r1.contains_latlng(ll_deg(30, 45))
    assert not r1.interior_contains_latlng(ll_deg(30, 45))
    assert r1.contains_latlng(eq_m180)
    assert not r1.interior_contains_latlng(eq_m180)
    assert r1.contains_latlng(north_pole)
    assert not r1.interior_contains_latlng(north_pole)
    p1 = np.array([0.5, -0.3, 0.1])
    p2 = np.array([0.5, 0.2, 0.1])
    assert r1.contains_point(p1 / np.linalg.norm(p1))
    assert not r1.contains_point(p2 / np.linalg.norm(p2))


def check_interval_ops(x, y, relation, expected_union, expected_intersection):
    assert x.contains_rect(y) == (relation[0] == "T")
    assert x.interior_contains_rect(y) == (relation[1] == "T")
    assert x.intersects_rect(y) == (relation[2] == "T")
    assert x.interior_intersects_rect(y) == (relation[3] == "T")
    assert x.contains_rect(y) == rect_eq(x.union(y), x)
    assert x.intersects_rect(y) == (not x.intersection(y).is_empty())
    assert rect_eq(x.union(y), expected_union)
    assert rect_eq(x.intersection(y), expected_intersection)
    if y.get_size().lat == 0 and y.get_size().lng == 0:
        r = LatLngRect(
            R1Interval(x.lat.lo, x.lat.hi), S1Interval(x.lng.lo, x.lng.hi)
        )
        r.add_point_ll(LatLng(y.lat.lo, y.lng.lo))
        assert rect_eq(r, expected_union)


def test_interval_ops():
    r1 = rect_from_degrees(0, -180, 90, 0)
    check_interval_ops(r1, rect_from_degrees(45, -90, 45, -90), "TTTT",
                       r1, rect_from_degrees(45, -90, 45, -90))
    check_interval_ops(r1, rect_from_degrees(0, -180, 0, -180), "TFTF",
                       r1, rect_from_degrees(0, -180, 0, -180))
    check_interval_ops(r1, rect_from_degrees(90, 0, 90, 0), "TFTF",
                       r1, rect_from_degrees(90, 0, 90, 0))
    check_interval_ops(r1, rect_from_degrees(-10, -1, 1, 20), "FFTT",
                       rect_from_degrees(-10, 180, 90, 20),
                       rect_from_degrees(0, -1, 1, 0))
    check_interval_ops(r1, rect_from_degrees(-10, -1, 0, 20), "FFTF",
                       rect_from_degrees(-10, 180, 90, 20),
                       rect_from_degrees(0, -1, 0, 0))
    check_interval_ops(r1, rect_from_degrees(-10, 0, 1, 20), "FFTF",
                       rect_from_degrees(-10, 180, 90, 20),
                       rect_from_degrees(0, 0, 1, 0))
    check_interval_ops(rect_from_degrees(-15, -160, -15, -150),
                       rect_from_degrees(20, 145, 25, 155), "FFFF",
                       rect_from_degrees(-15, 145, 25, -150),
                       LatLngRect.empty())
    check_interval_ops(rect_from_degrees(70, -10, 90, -140),
                       rect_from_degrees(60, 175, 80, 5), "FFTT",
                       rect_from_degrees(60, -180, 90, 180),
                       rect_from_degrees(70, 175, 80, 5))
    check_interval_ops(rect_from_degrees(12, 30, 60, 60),
                       rect_from_degrees(0, 0, 30, 18), "FFFF",
                       rect_from_degrees(0, 0, 60, 60), LatLngRect.empty())
    check_interval_ops(rect_from_degrees(0, 0, 18, 42),
                       rect_from_degrees(30, 12, 42, 60), "FFFF",
                       rect_from_degrees(0, 0, 42, 60), LatLngRect.empty())


def _pt(s):
    return parse_points(s)[0]


class TestBoundaryIntersects:
    def test_empty_rectangle(self):
        rect = LatLngRect.empty()
        lo = np.array([1.0, 0, 0])
        assert not rect.boundary_intersects(lo, lo)

    def test_full_rectangle(self):
        rect = LatLngRect.full()
        lo = np.array([1.0, 0, 0])
        hi = np.array([0.0, 1, 0])
        assert not rect.boundary_intersects(lo, lo)
        assert not rect.boundary_intersects(lo, hi)

    def test_spherical_lune(self):
        rect = rect_from_degrees(-90, 100, 90, 120)
        assert not rect.boundary_intersects(_pt("60:60"), _pt("90:60"))
        assert not rect.boundary_intersects(_pt("-60:110"), _pt("60:110"))
        assert rect.boundary_intersects(_pt("-60:95"), _pt("60:110"))
        assert rect.boundary_intersects(_pt("60:115"), _pt("80:125"))

    def test_north_hemisphere(self):
        rect = rect_from_degrees(0, -180, 90, 180)
        assert not rect.boundary_intersects(_pt("60:-180"), _pt("90:-180"))
        assert not rect.boundary_intersects(_pt("60:-170"), _pt("60:170"))
        assert rect.boundary_intersects(_pt("-10:-180"), _pt("10:-180"))

    def test_south_hemisphere(self):
        rect = rect_from_degrees(-90, -180, 0, 180)
        assert not rect.boundary_intersects(_pt("-90:-180"), _pt("-60:-180"))
        assert not rect.boundary_intersects(_pt("-60:-170"), _pt("-60:170"))
        assert rect.boundary_intersects(_pt("-10:-180"), _pt("10:-180"))

    def test_rect_crossing_anti_meridian(self):
        rect = rect_from_degrees(20, 170, 40, -170)
        assert rect.contains_point(_pt("30:180"))
        assert rect.boundary_intersects(_pt("25:160"), _pt("25:180"))
        assert rect.boundary_intersects(_pt("25:-160"), _pt("25:-180"))
        assert rect.boundary_intersects(_pt("15:175"), _pt("30:175"))
        assert rect.boundary_intersects(_pt("45:175"), _pt("30:175"))
        assert not rect.boundary_intersects(_pt("25:-20"), _pt("25:0"))
        assert not rect.boundary_intersects(_pt("25:20"), _pt("25:0"))
        assert not rect.boundary_intersects(_pt("15:-5"), _pt("30:-5"))
        assert not rect.boundary_intersects(_pt("45:-5"), _pt("30:-5"))


def test_add_point():
    p = LatLngRect.empty()
    p.add_point_ll(ll_deg(0, 0))
    assert p.is_point()
    p.add_point_ll(LatLng(0, -PI / 2))
    assert not p.is_point()
    p.add_point_ll(LatLng(PI / 4, -PI))
    p.add_point(np.array([0.0, 0.0, 1.0]))
    assert rect_eq(p, rect_from_degrees(0, -180, 90, 0))


def test_expanded():
    cases = [
        ((70, 150, 80, 170), (20, 30), (50, 120, 90, -160)),
        ((10, -50, 60, 70), (-10, -10), (20, -40, 50, 60)),
        ((-20, -180, 20, 180), (-10, -10), (-10, -180, 10, 180)),
        ((-90, 10, 90, 100), (-10, -10), (-80, 20, 80, 90)),
        ((10, -50, 60, 70), (-10, 30), (20, -80, 50, 100)),
        ((-20, -180, 20, 180), (10, -500), (-30, -180, 30, 180)),
        ((-90, -180, 80, 180), (-30, 500), (-60, -180, 50, 180)),
        ((-80, -100, 80, 150), (30, -50), (-90, -50, 90, 100)),
    ]
    for rect, margin, want in cases:
        got = rect_from_degrees(*rect).expanded_radians(
            math.radians(margin[0]), math.radians(margin[1])
        )
        assert got.approx_equals(rect_from_degrees(*want)), (rect, margin)
    assert LatLngRect.empty().expanded_radians(
        math.radians(20), math.radians(30)
    ).is_empty()
    assert rect_from_degrees(-20, -180, 20, 180).expanded_radians(
        math.radians(-30), math.radians(-30)
    ).is_empty()
    assert rect_from_degrees(-90, 10, 90, 11).expanded_radians(
        math.radians(-10), math.radians(-10)
    ).is_empty()
    assert rect_from_degrees(0, -180, 50, 180).expanded_radians(
        math.radians(-30), math.radians(500)
    ).is_empty()
    assert rect_from_degrees(-80, 10, 70, 20).expanded_radians(
        math.radians(30), math.radians(-200)
    ).is_empty()


def test_polar_closure():
    assert rect_eq(rect_from_degrees(-89, 0, 89, 1),
                   rect_from_degrees(-89, 0, 89, 1).polar_closure())
    assert rect_eq(rect_from_degrees(-90, -180, -45, 180),
                   rect_from_degrees(-90, -30, -45, 100).polar_closure())
    assert rect_eq(rect_from_degrees(89, -180, 90, 180),
                   rect_from_degrees(89, 145, 90, 146).polar_closure())
    assert rect_from_degrees(-90, -145, 90, -144).polar_closure().is_full()


class TestExpandedByDistance:
    def test_positive_distance(self):
        assert rect_from_degrees(0, 170, 0, -170).expanded_by_distance(
            math.radians(15)
        ).approx_equals(rect_from_degrees(-15, 155, 15, -155), 1e-12)
        assert rect_from_degrees(60, 150, 80, 10).expanded_by_distance(
            math.radians(15)
        ).approx_equals(rect_from_degrees(45, -180, 90, 180), 1e-12)

    def test_negative_distance_round_trips(self):
        for rect in ((0, 0, 30, 90), (-30, -90, 0, 0)):
            in_rect = rect_from_degrees(*rect)
            d = math.radians(5)
            out = in_rect.expanded_by_distance(d).expanded_by_distance(-d)
            assert out.approx_equals(in_rect, 1e-12), rect

    def test_negative_distance_poles(self):
        cases = [
            ((0, -90, 90, 180), (5, 0, 85, 90)),
            ((0, -180, 90, 180), (5, -180, 90, 180)),
            ((-90, -90, 0, 180), (-85, 0, -5, 90)),
            ((-90, -180, 0, 180), (-90, -180, -5, 180)),
            ((0, -180, 30, 180), (5, -180, 25, 180)),
        ]
        for rect, want in cases:
            got = rect_from_degrees(*rect).expanded_by_distance(
                -math.radians(5)
            )
            assert got.approx_equals(rect_from_degrees(*want), 1e-12), rect

    def test_negative_distance_result_empty(self):
        assert rect_from_degrees(0, 0, 9.9, 90).expanded_by_distance(
            -math.radians(5)
        ).is_empty()
        assert rect_from_degrees(0, 0, 30, 11).expanded_by_distance(
            -math.radians(5)
        ).is_empty()


def cap_close(a: Cap, b: Cap, tol=1e-9) -> bool:
    return (np.linalg.norm(a.center - b.center) <= tol
            and abs(a.radius_radians() - b.radius_radians()) <= tol)


def test_get_cap_bound():
    got = rect_from_degrees(-45, -45, 45, 45).get_cap_bound()
    assert cap_close(got, Cap(np.array([1.0, 0, 0]), 2 * 0.5))
    got = rect_from_degrees(88, -80, 89, 80).get_cap_bound()
    assert cap_close(
        got, Cap.from_center_angle(np.array([0.0, 0, 1]), math.radians(2)),
        tol=1e-7,
    )
    got = rect_from_degrees(-30, -150, -10, 50).get_cap_bound()
    assert cap_close(
        got, Cap.from_center_angle(np.array([0.0, 0, -1]), math.radians(80)),
        tol=1e-7,
    )
    # lng span > 180 and lat span > 90: midpoint cap must NOT be used
    got = rect_from_degrees(-60, -150, 70, 50).get_cap_bound()
    assert cap_close(
        got, Cap.from_center_angle(np.array([0.0, 0, 1]), math.radians(150)),
        tol=1e-7,
    )


def test_area():
    assert LatLngRect.empty().area() == 0.0
    assert abs(LatLngRect.full().area() - 4 * PI) < 1e-12
    assert abs(rect_from_degrees(0, 0, 90, 90).area() - PI / 2) < 1e-12


def test_get_centroid():
    rng = np.random.RandomState(61)
    assert np.array_equal(LatLngRect.empty().get_centroid(), np.zeros(3))
    assert np.linalg.norm(LatLngRect.full().get_centroid()) <= 1e-15
    for _ in range(50):
        lat1 = rng.uniform(-PI / 2, PI / 2)
        lat2 = rng.uniform(-PI / 2, PI / 2)
        r = LatLngRect(R1Interval.from_point_pair(lat1, lat2),
                       S1Interval.full())
        c = r.get_centroid()
        assert abs(
            0.5 * (math.sin(lat1) + math.sin(lat2)) * r.area() - c[2]
        ) <= 1e-15
        assert np.linalg.norm(c[:2]) <= 1e-15
    for _ in range(50):
        lng1 = rng.uniform(-PI, PI)
        lng2 = rng.uniform(-PI, PI)
        r = LatLngRect(R1Interval(-PI / 2, PI / 2),
                       S1Interval.from_point_pair(lng1, lng2))
        c = r.get_centroid()
        assert abs(c[2]) <= 1e-15
        assert abs(
            math.remainder(
                r.lng.get_center() - math.atan2(c[1], c[0]), 2 * PI
            )
        ) <= 1e-14
        alpha = 0.5 * r.lng.get_length()
        assert abs(
            0.25 * PI * math.sin(alpha) / alpha * r.area()
            - np.linalg.norm(c[:2])
        ) <= 1e-15


# -------------------------------------------------- distance (brute force)
def _ll_dist(a: LatLng, b: LatLng) -> float:
    pa, pb = a.to_point(), b.to_point()
    return math.atan2(np.linalg.norm(np.cross(pa, pb)), float(pa @ pb))


def _pt_edge(p, a, b) -> float:
    d2 = float(point_edge_dist2(p[None], a[None], b[None])[0, 0])
    return float(chord2_to_angle(d2))


def dist_to_lat_edge(x: LatLng, lat: float, interval: S1Interval) -> float:
    if interval.contains(x.lng):
        return abs(x.lat - lat)
    return min(
        _ll_dist(x, LatLng(lat, interval.lo)),
        _ll_dist(x, LatLng(lat, interval.hi)),
    )


def brute_force_distance(a: LatLngRect, b: LatLngRect) -> float:
    if a.intersects_rect(b):
        return 0.0
    pa = [LatLng(a.lat.lo, a.lng.lo), LatLng(a.lat.lo, a.lng.hi),
          LatLng(a.lat.hi, a.lng.hi), LatLng(a.lat.hi, a.lng.lo)]
    pb = [LatLng(b.lat.lo, b.lng.lo), LatLng(b.lat.lo, b.lng.hi),
          LatLng(b.lat.hi, b.lng.hi), LatLng(b.lat.hi, b.lng.lo)]
    lat_a, lat_b = (a.lat.lo, a.lat.hi), (b.lat.lo, b.lat.hi)
    lng_edge_a = [(pa[0].to_point(), pa[3].to_point()),
                  (pa[1].to_point(), pa[2].to_point())]
    lng_edge_b = [(pb[0].to_point(), pb[3].to_point()),
                  (pb[1].to_point(), pb[2].to_point())]
    best = PI
    for i in range(4):
        for j in range(2):
            best = min(
                best,
                dist_to_lat_edge(pa[i], lat_b[j], b.lng),
                dist_to_lat_edge(pb[i], lat_a[j], a.lng),
                _pt_edge(pa[i].to_point(), *lng_edge_b[j]),
                _pt_edge(pb[i].to_point(), *lng_edge_a[j]),
            )
    return best


def brute_force_rect_point(a: LatLngRect, b: LatLng) -> float:
    if a.contains_latlng(b):
        return 0.0
    return min(
        dist_to_lat_edge(b, a.lat.lo, a.lng),
        dist_to_lat_edge(b, a.lat.hi, a.lng),
        _pt_edge(b.to_point(), LatLng(a.lat.lo, a.lng.lo).to_point(),
                 LatLng(a.lat.hi, a.lng.lo).to_point()),
        _pt_edge(b.to_point(), LatLng(a.lat.lo, a.lng.hi).to_point(),
                 LatLng(a.lat.hi, a.lng.hi).to_point()),
    )


def verify_distance(a, b):
    assert abs(brute_force_distance(a, b) - a.get_distance_rect(b)) < 1e-10


def verify_rect_point(a, p):
    assert abs(brute_force_rect_point(a, p) - a.get_distance_latlng(p)) < 1e-10


def test_get_distance_overlapping():
    a = rect_from_degrees(0, 0, 2, 2)
    b = point_rect(0, 0)
    assert a.get_distance_rect(a) == 0
    assert a.get_distance_rect(b) == 0
    assert b.get_distance_rect(b) == 0
    assert a.get_distance_latlng(ll_deg(0, 0)) == 0
    for other in [(0, 1, 2, 3), (0, 2, 2, 4), (1, 0, 3, 2), (2, 0, 4, 2),
                  (1, 1, 3, 3), (2, 2, 4, 4)]:
        assert a.get_distance_rect(rect_from_degrees(*other)) == 0


def test_get_distance_rect_vs_point():
    a = rect_from_degrees(-1, -1, 2, 1)
    for p in [(-2, -1), (1, 2)]:
        verify_distance(a, point_rect(*p))
        verify_distance(point_rect(*p), a)
        verify_rect_point(a, ll_deg(*p))
    b = rect_from_degrees(86, 0, 88, 2)
    for p in [(87, 3), (87, -1), (89, 1), (89, 181), (85, 1), (85, 181),
              (90, 0)]:
        verify_distance(b, point_rect(*p))
        verify_distance(point_rect(*p), b)
        verify_rect_point(b, ll_deg(*p))
    c = rect_from_degrees(88, 0, 90, 2)
    for p in [(89, 3), (89, 90), (89, 181)]:
        verify_distance(c, point_rect(*p))
        verify_distance(point_rect(*p), c)


def test_get_distance_rect_vs_rect():
    a = rect_from_degrees(-1, -1, 2, 1)
    verify_distance(a, rect_from_degrees(0, 2, 1, 3))
    verify_distance(a, rect_from_degrees(-2, -3, -1, -2))
    b = rect_from_degrees(-87, 0, -85, 3)
    for other in [(-89, 1, -88, 2), (-84, 1, -83, 2), (-88, 90, -86, 91),
                  (-84, -91, -83, -90), (-90, 181, -89, 182),
                  (-84, 181, -83, 182)]:
        verify_distance(b, rect_from_degrees(*other))


def test_get_distance_random_pairs():
    rng = np.random.RandomState(62)
    for _ in range(1500):
        def rand_ll():
            p = random_point(rng)
            return LatLng(
                math.asin(max(-1, min(1, p[2]))), math.atan2(p[1], p[0])
            )

        a = LatLngRect.from_point_pair(rand_ll(), rand_ll())
        b = LatLngRect.from_point_pair(rand_ll(), rand_ll())
        verify_distance(a, b)
        c = rand_ll()
        verify_rect_point(a, c)
        verify_rect_point(b, c)


def test_expand_for_subregions():
    """s2latlng_rect_bounder_test.cc:243-333 ExpandForSubregions: the
    nearly-antipodal full-bound criteria (equator-straddling,
    narrow-longitude, corner-edge cases), near-180-degree-latitude
    longitude widening, pole inclusion, and full/empty passthrough."""
    import math

    from s2geometry_spark.kernel.bounder import expand_for_subregions
    from s2geometry_spark.kernel.intervals import R1Interval, S1Interval
    from s2geometry_spark.kernel.region import LatLngRect

    PI, PI_2 = math.pi, math.pi / 2
    RECT_ERR_LAT, RECT_ERR_LNG = 10 * 2.22e-16, 10 * 2.22e-16

    def sub(x_lat, x_lng, y_lat, y_lng):
        rect = LatLngRect(
            R1Interval(min(x_lat, y_lat), max(x_lat, y_lat)),
            S1Interval.from_point_pair(x_lng, y_lng),
        )
        out = expand_for_subregions(rect)
        assert out.contains_rect(rect)
        if (rect.lat.lo == -PI_2 and rect.lat.hi == PI_2):
            assert not rect.lat.contains_interval(out.lat)
        return out

    def approx(rect, lat_lo, lat_hi, lng):
        assert abs(rect.lat.lo - lat_lo) <= RECT_ERR_LAT
        assert abs(rect.lat.hi - lat_hi) <= RECT_ERR_LAT
        if lng == "full":
            assert rect.lng.is_full()
        else:
            assert abs(rect.lng.lo - lng[0]) <= RECT_ERR_LNG
            assert abs(rect.lng.hi - lng[1]) <= RECT_ERR_LNG

    # near-equator, ~180 degrees of longitude
    assert sub(3e-16, 0, 1e-14, PI).is_full()
    assert not sub(9e-16, 0, 1e-14, PI).is_full()
    assert sub(1e-16, 7e-16, 1e-14, PI).is_full()
    assert not sub(3e-16, 14e-16, 1e-14, PI).is_full()
    assert sub(1e-100, 14e-16, 1e-14, PI).is_full()
    assert not sub(1e-100, 22e-16, 1e-14, PI).is_full()
    # <=90 degrees longitude, almost 180 degrees latitude
    assert sub(-PI_2, -1e-15, PI_2 - 7e-16, 0).is_full()
    assert not sub(-PI_2, -1e-15, PI_2 - 30e-16, 0).is_full()
    assert sub(-PI_2 + 4e-16, 0, PI_2 - 2e-16, 1e-7).is_full()
    assert not sub(-PI_2 + 30e-16, 0, PI_2, 1e-7).is_full()
    assert sub(-PI_2 + 4e-16, 0, PI_2 - 4e-16, PI_2).is_full()
    assert not sub(-PI_2, 0, PI_2 - 30e-16, PI_2).is_full()
    # equator-straddling, >90 degrees longitude (corner-edge case)
    assert sub(-PI_2, 0, PI_2 - 1e-8, PI - 1e-7).is_full()
    assert not sub(-PI_2, 0, PI_2 - 1e-7, PI - 1e-7).is_full()
    assert sub(-PI_2 + 1e-12, -PI + 1e-4, PI_2, 0).is_full()
    assert sub(-PI_2 + 1e-11, -PI + 1e-4, PI_2, 0).is_full()
    # ~180 degrees apart in LONGITUDE (lng widens to full, lat does not)
    approx(sub(1.5, -PI_2, 1.5, PI_2 - 2e-16), 1.5, 1.5, "full")
    approx(sub(1.5, -PI_2, 1.5, PI_2 - 7e-16), 1.5, 1.5,
           (-PI_2, PI_2 - 7e-16))
    # full / empty passthrough
    assert expand_for_subregions(LatLngRect.full()).is_full()
    assert expand_for_subregions(LatLngRect.empty()).is_empty()
    # pole inclusion
    approx(sub(-PI_2 + 1e-15, 0, -PI_2 + 1e-15, 0),
           -PI_2, -PI_2 + 1e-15, "full")
    approx(sub(PI_2 - 1e-15, 0, PI_2 - 1e-15, 0),
           PI_2 - 1e-15, PI_2, "full")
