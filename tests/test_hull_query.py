"""Convex-hull query fixtures — port of s2convex_hull_query_test.cc:48-244
(NoPoints, OnePoint, TwoPoints, TwoAntipodalPoints, NonConvexPoints,
SimplePolyline, CapBoundExpandedToHemisphere, LoopsAroundNorthPole,
PointsInsideHull property with our own rng per FIXTURES.md)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.hull import (
    EMPTY,
    FULL,
    ConvexHullQuery,
    convex_hull_of_points,
)


def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
    return np.array([x, y, z], float)


def _parse(spec):
    out = []
    for tok in spec.split(","):
        lat, lng = tok.strip().split(":")
        out.append(_pt(float(lat), float(lng)))
    return np.asarray(out)


def _boundary_equals(a: np.ndarray, b: np.ndarray) -> bool:
    """S2Loop::BoundaryEquals: same cyclic vertex sequence."""
    a = np.asarray(a).reshape(-1, 3)
    b = np.asarray(b).reshape(-1, 3)
    if len(a) != len(b):
        return False
    for off in range(len(a)):
        if all(np.array_equal(a[(off + i) % len(a)], b[i]) for i in range(len(b))):
            return True
    return False


def test_no_points():
    # s2convex_hull_query_test.cc:48-52
    q = ConvexHullQuery()
    assert q.get_convex_hull() == EMPTY


def test_one_point():
    # s2convex_hull_query_test.cc:61-74
    q = ConvexHullQuery()
    p = np.array([0.0, 0.0, 1.0])
    q.add_point(p)
    result = q.get_convex_hull()
    assert len(result) == 3
    assert any(np.array_equal(v, p) for v in result)
    # duplicates leave the result unchanged
    q.add_point(p)
    q.add_point(p)
    assert _boundary_equals(q.get_convex_hull(), result)


def test_two_points():
    # s2convex_hull_query_test.cc:76-93
    q = ConvexHullQuery()
    p = np.array([0.0, 0.0, 1.0])
    r = np.array([0.0, 1.0, 0.0])
    q.add_point(p)
    q.add_point(r)
    result = q.get_convex_hull()
    assert len(result) == 3
    assert any(np.array_equal(v, p) for v in result)
    assert any(np.array_equal(v, r) for v in result)
    q.add_point(r)
    q.add_point(p)
    q.add_point(p)
    assert _boundary_equals(q.get_convex_hull(), result)


def test_two_antipodal_points():
    # s2convex_hull_query_test.cc:95-101
    q = ConvexHullQuery()
    q.add_point(np.array([0.0, 0.0, 1.0]))
    q.add_point(np.array([0.0, 0.0, -1.0]))
    assert q.get_convex_hull() == FULL


def test_non_convex_points():
    # s2convex_hull_query_test.cc:128-139: the six face centers admit no
    # convex region smaller than the sphere
    from s2geometry_spark.kernel.cellid import from_face_ij, to_point

    q = ConvexHullQuery()
    for face in range(6):
        cid = from_face_ij(
            np.array([face]), np.array([2**29]), np.array([2**29])
        )
        x, y, z = to_point(cid)
        q.add_point(np.array([x[0], y[0], z[0]]))
    assert q.get_convex_hull() == FULL


def test_simple_polyline():
    # s2convex_hull_query_test.cc:141-152
    q = ConvexHullQuery()
    q.add_polyline(_parse("0:1, 0:9, 1:6, 2:6, 3:10, 4:10, 5:5, 4:0, 3:0, 2:5, 1:5"))
    result = q.get_convex_hull()
    expected = _parse("0:1, 0:9, 3:10, 4:10, 5:5, 4:0, 3:0")
    assert _boundary_equals(result, expected)


def test_cap_bound_expanded_to_hemisphere():
    # s2convex_hull_query_test.cc:154-166: a bound slightly smaller than
    # a hemisphere must be conservatively expanded, yielding full
    q = ConvexHullQuery()
    q.add_point(_pt(0, 0))
    q.add_point(_pt(0, 45))
    q.add_point(_pt(0, -135))
    assert q.get_convex_hull() == FULL


def _regular_loop(center: np.ndarray, radius_rad: float, n: int) -> np.ndarray:
    """S2Loop::MakeRegularLoop semantics: n vertices CCW around center."""
    z = center / np.linalg.norm(center)
    ref = np.array([1.0, 0.0, 0.0]) if abs(z[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    x = np.cross(z, ref)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    out = []
    for i in range(n):
        theta = 2 * math.pi * i / n
        d = math.cos(theta) * x + math.sin(theta) * y
        v = math.cos(radius_rad) * z + math.sin(radius_rad) * d
        out.append(v / np.linalg.norm(v))
    return np.asarray(out)


@pytest.mark.parametrize(
    "radius_deg,n",
    [(1, 3), (89, 3), (91, 3), (179, 3), (10, 100), (89, 1000)],
)
def test_loops_around_north_pole(radius_deg, n):
    # s2convex_hull_query_test.cc:168-195
    loop = _regular_loop(np.array([0.0, 0.0, 1.0]), math.radians(radius_deg), n)
    q = ConvexHullQuery()
    q.add_loop(loop)
    result = q.get_convex_hull()
    if radius_deg > 90:
        assert result == FULL
    else:
        assert _boundary_equals(result, loop)


def test_points_inside_hull_property():
    # s2convex_hull_query_test.cc:197-244: adding points inside the hull
    # never changes it (seeded rng, caps up to just under a hemisphere)
    from s2geometry_spark.kernel.contains import Loop

    rng = np.random.default_rng(42)
    n_checked = 0
    for _ in range(60):
        # random cap: center + area in [1e-15, 1.999*pi) steradians
        c = rng.normal(size=3)
        c /= np.linalg.norm(c)
        area = 10.0 ** rng.uniform(-15, math.log10(1.999 * math.pi))
        height = area / (2 * math.pi)

        def sample():
            # uniform in the cap: h uniform in [0, height]
            h = rng.uniform(0, height)
            theta = rng.uniform(0, 2 * math.pi)
            z = c
            ref = (
                np.array([1.0, 0.0, 0.0])
                if abs(z[0]) < 0.9
                else np.array([0.0, 1.0, 0.0])
            )
            x = np.cross(z, ref)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            r = math.sqrt(h * (2 - h))
            v = (1 - h) * z + r * (math.cos(theta) * x + math.sin(theta) * y)
            return v / np.linalg.norm(v)

        q = ConvexHullQuery()
        pts1 = [sample() for _ in range(int(rng.integers(3, 103)))]
        for p in pts1:
            q.add_point(p)
        hull = q.get_convex_hull()
        if isinstance(hull, str):
            continue
        if q.get_cap_bound().height() >= 1:
            continue
        loop = Loop(hull)
        added = 0
        for _ in range(200):
            p = sample()
            if bool(loop.contains(p[None])[0]):
                q.add_point(p)
                added += 1
        hull2 = q.get_convex_hull()
        assert not isinstance(hull2, str)
        assert _boundary_equals(hull2, hull), (len(pts1), added)
        n_checked += 1
    assert n_checked >= 30
