"""Port of s2hausdorff_distance_query_test.cc over
kernel/hausdorff.HausdorffDistanceQuery."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.closest_edge import Shape, parse_index
from s2geometry_spark.kernel.contains import Loop, Polygon, parse_points
from s2geometry_spark.kernel.hausdorff import (
    INF2,
    DirectedResult,
    HausdorffDistanceQuery,
    Result,
)


def chord2_deg(deg: float) -> float:
    s = 2 * math.sin(0.5 * min(math.pi, math.radians(deg)))
    return s * s


def chord2(x, y) -> float:
    d = np.asarray(x) - np.asarray(y)
    return float(d @ d)


def deg(d2: float) -> float:
    return math.degrees(2 * math.asin(0.5 * math.sqrt(min(d2, 4.0))))


def polyline_shape(sid: int, s: str) -> Shape:
    v = parse_points(s)
    return Shape(sid, 1, v[:-1], v[1:])


def point_shape(sid: int, s: str) -> Shape:
    v = parse_points(s)
    return Shape(sid, 0, v, v)


def full_polygon_shape(sid: int) -> Shape:
    return Shape(
        sid,
        2,
        np.zeros((0, 3)),
        np.zeros((0, 3)),
        polygon=Polygon([Loop(np.array([[0.0, 0.0, -1.0]]))]),
    )


def test_result_constructors_and_accessors():
    """test.cc:44-62."""
    p1 = parse_points("3:4")[0]
    p2 = parse_points("5:6")[0]
    d1 = chord2_deg(5)
    d2 = chord2_deg(5)
    r1 = DirectedResult(d1, p1)
    r2 = DirectedResult(d2, p2)
    r12 = Result(r1, r2)
    assert np.array_equal(r1.target_point, p1)
    assert r1.distance2 == d1
    assert np.array_equal(r2.target_point, p2)
    assert r2.distance2 == d2
    assert np.array_equal(r12.target_to_source.target_point, p1)
    assert np.array_equal(r12.source_to_target.target_point, p2)
    assert r12.distance2 == r2.distance2


def test_options_accessors():
    """test.cc:65-84: include_interiors defaults to True."""
    q = HausdorffDistanceQuery()
    assert q.include_interiors
    q.include_interiors = False
    assert not q.include_interiors


def test_simple_polyline_queries():
    """SimplePolylineQueriesSucceed (test.cc:87-208)."""
    a0 = parse_points("0:0, 0:1, 0:1.5")
    a1 = parse_points("0:2, 0:1.5, -10:1")
    b0 = parse_points("1:0, 1:1, 3:2")

    empty: list[Shape] = []
    a = [Shape(0, 1, a0[:-1], a0[1:]), Shape(1, 1, a1[:-1], a1[1:])]
    b = [Shape(0, 1, b0[:-1], b0[1:])]

    expected_a_to_b = chord2(a1[2], b0[1])
    expected_b_to_a = chord2(b0[2], a1[0])

    query = HausdorffDistanceQuery()

    assert query.get_directed_result(empty, a) is None
    assert query.get_directed_result(a, empty) is None
    assert query.get_directed_distance2(a, empty) == INF2
    assert not query.is_directed_distance_less(empty, a, chord2_deg(360))
    assert not query.is_directed_distance_less(a, empty, chord2_deg(360))

    directed_a_to_b = query.get_directed_result(a, b)
    directed_b_to_a = query.get_directed_result(b, a)
    directed_a_to_b_d2 = query.get_directed_distance2(a, b)

    assert directed_a_to_b is not None and directed_b_to_a is not None
    assert deg(directed_a_to_b.distance2) == pytest.approx(
        deg(expected_a_to_b), abs=1e-13
    )
    assert deg(directed_a_to_b_d2) == pytest.approx(
        deg(expected_a_to_b), abs=1e-13
    )
    assert deg(directed_b_to_a.distance2) == pytest.approx(
        deg(expected_b_to_a), abs=1e-13
    )

    # limits near the directed Hausdorff distance (radian-domain shifts)
    def shift2(d2: float, delta_rad: float) -> float:
        r = 2 * math.asin(0.5 * math.sqrt(min(d2, 4.0))) + delta_rad
        s = 2 * math.sin(0.5 * max(0.0, min(math.pi, r)))
        return s * s

    assert query.is_directed_distance_less(
        a, b, shift2(directed_a_to_b_d2, math.radians(1))
    )
    assert not query.is_directed_distance_less(
        a, b, shift2(directed_a_to_b_d2, -math.radians(1))
    )

    # undirected cases
    a_to_b = query.get_result(a, b)
    b_to_a = query.get_result(b, a)
    b_to_a_d2 = query.get_distance2(b, a)
    bb = query.get_result(b, b)
    assert a_to_b is not None and b_to_a is not None and bb is not None

    larger = max(directed_a_to_b.distance2, directed_b_to_a.distance2)
    smaller = min(directed_a_to_b.distance2, directed_b_to_a.distance2)
    average_rad = (
        2 * math.asin(0.5 * math.sqrt(larger))
        + 2 * math.asin(0.5 * math.sqrt(smaller))
    ) / 2
    average2 = (2 * math.sin(0.5 * average_rad)) ** 2

    assert query.is_distance_less(a, b, shift2(larger, 0.001))
    assert not query.is_distance_less(a, b, average2)
    assert not query.is_distance_less(a, b, shift2(smaller, -0.001))
    assert query.is_distance_less(b, b, 0.0)

    assert deg(a_to_b.distance2) == pytest.approx(
        deg(b_to_a.distance2), abs=1e-13
    )
    assert deg(bb.distance2) == 0
    assert a_to_b.distance2 == max(a_to_b.distance2, b_to_a.distance2)
    assert b_to_a_d2 == b_to_a.distance2


def test_point_vector_shape_queries():
    """PointVectorShapeQueriesSucceed (test.cc:212-277): a polyline
    target/source vs a point-vector shape."""
    a_pts = parse_points("2:0, 0:1, 1:2, 0:3, 0:4")
    b_pts = parse_points("1:0.5, 1:1.5, 1:2.5, 1:3.5")
    a = [Shape(0, 1, a_pts[:-1], a_pts[1:])]
    b = [Shape(0, 0, b_pts, b_pts)]

    query = HausdorffDistanceQuery()

    # Directed a→b is achieved at a vertex of a with max min-distance to
    # the POINTS of b; directed b→a at a point of b vs edges of a.
    from s2geometry_spark.kernel.distance import point_edge_dist2

    d2_a_to_b = point_edge_dist2(a_pts, b_pts, b_pts).min(axis=1).max()
    d2_b_to_a = (
        point_edge_dist2(b_pts, a_pts[:-1], a_pts[1:]).min(axis=1).max()
    )

    ab = query.get_directed_result(a, b)
    ba = query.get_directed_result(b, a)
    assert ab is not None and ba is not None
    assert ab.distance2 == pytest.approx(float(d2_a_to_b), rel=1e-15)
    assert ba.distance2 == pytest.approx(float(d2_b_to_a), rel=1e-15)

    und = query.get_result(a, b)
    assert und is not None
    assert und.distance2 == max(ab.distance2, ba.distance2)


def test_overlapping_polygons():
    """OverlappingPolygons (test.cc:279-337)."""
    a = parse_index("# # 1:1, 1:2, 3.5:1.5")
    b = parse_index("# # 0:0, 0:3, 3:3, 3:0")
    c = parse_index("# # 0:0, 0:2, 3:0")
    eps = 3.0e-3

    # include_interiors=False: the directed HD a→b is achieved at the
    # triangle vertex inside the quadrangle, ~1° from its nearest edge.
    q1 = HausdorffDistanceQuery(include_interiors=False)
    expected_target_1 = parse_points("1:2")[0]
    a_to_b_1 = q1.get_directed_result(a, b)
    assert a_to_b_1 is not None
    assert deg(a_to_b_1.distance2) == pytest.approx(1, abs=eps)
    assert np.array_equal(a_to_b_1.target_point, expected_target_1)
    assert q1.is_directed_distance_less(c, b, chord2_deg(1.0 + eps))

    # include_interiors=True: achieved at the vertex OUTSIDE, ~0.5°.
    q2 = HausdorffDistanceQuery(include_interiors=True)
    expected_target_2 = parse_points("3.5:1.5")[0]
    a_to_b_2 = q2.get_directed_result(a, b)
    assert a_to_b_2 is not None
    assert deg(a_to_b_2.distance2) == pytest.approx(0.5, abs=eps)
    assert np.array_equal(a_to_b_2.target_point, expected_target_2)
    # C fully contained in B → all points 0 distance
    assert q2.is_directed_distance_less(c, b, chord2_deg(eps))


def test_whole_world():
    """WholeWorld (test.cc:339-381)."""
    a = [point_shape(0, "1:1")]
    b = [full_polygon_shape(0)]

    q = HausdorffDistanceQuery(include_interiors=True)
    a_to_b = q.get_directed_result(a, b)
    assert a_to_b is not None
    assert a_to_b.distance2 == 0.0

    # full geometry has no vertices → no directed result
    assert q.get_directed_result(b, a) is None
    assert q.get_result(b, a) is None
    assert q.get_result(a, b) is None

    assert q.is_directed_distance_less(a, b, 0.0)
    assert not q.is_directed_distance_less(b, a, INF2)
    assert not q.is_distance_less(a, b, INF2)


def test_whole_world_same_reference():
    """WholeWorldSameReference (test.cc:383-404)."""
    a = [full_polygon_shape(0)]
    b = [full_polygon_shape(0)]
    q = HausdorffDistanceQuery(include_interiors=True)
    assert q.get_result(a, b) is None
    assert q.get_result(a, a) is None
    assert not q.is_distance_less(a, b, INF2)
    assert not q.is_distance_less(a, a, INF2)
