"""FurthestEdgeQuery fixtures — port of s2furthest_edge_query_test.cc
(NoEdges :72-83, the point-set distance core of OptionsNotModified
:85-105, DistanceEqualToLimit :133-158,
AntipodalPointInside/OutsideIndexedPolygon :183-235)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.closest_edge import (
    find_furthest_edges,
    parse_index,
)
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.distance import chord2_to_angle


def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
    return np.array([x, y, z], float)


def test_no_edges():
    # s2furthest_edge_query_test.cc:72-83
    results = find_furthest_edges([], np.array([[1.0, 0.0, 0.0]]))
    assert results == [[]]


def test_point_set_furthest():
    # the distance core of OptionsNotModified (:85-105): furthest of
    # 0:1 | 0:2 | 0:3 from 0:4 is the point 0:1 (edge 0), 3 degrees away
    shapes = parse_index("0:1 | 0:2 | 0:3 # #")
    results = find_furthest_edges(shapes, _pt(0, 4)[None], k=3)[0]
    assert results[0][1] == 0  # edge id of 0:1
    assert math.degrees(float(chord2_to_angle(results[0][2]))) == pytest.approx(
        3.0, abs=1e-12
    )
    # min_distance filter keeps only results greater than 1.5 degrees
    filtered = find_furthest_edges(
        shapes, _pt(0, 4)[None], k=3, min_distance_rad=math.radians(1.5)
    )[0]
    assert [r[1] for r in filtered] == [0, 1]


def test_distance_equal_to_limit():
    # s2furthest_edge_query_test.cc:133-158: antipodal target attains
    # exactly Straight (chord2 = 4); non-antipodal attains the edge max
    p0 = _pt(23, 12)
    p1 = _pt(47, 11)
    shapes = parse_index("23:12 # #")
    r = find_furthest_edges(shapes, (-p0)[None])[0]
    assert r[0][2] == 4.0  # exactly S1ChordAngle::Straight
    r1 = find_furthest_edges(shapes, (-p1)[None])[0]
    assert r1[0][2] < 4.0


def test_antipodal_point_inside_indexed_polygon():
    # s2furthest_edge_query_test.cc:183-220
    shapes = parse_index("# 0:0, 0:5, 5:5, 5:0 # 0:10, 0:15, 5:15, 5:10")
    target = -_pt(2, 12)

    # include_interiors: distance is exactly 180, interior of shape 1
    results = find_furthest_edges(
        shapes,
        target[None],
        include_interiors=True,
        min_distance_rad=math.radians(178),
    )[0]
    assert len(results) > 0
    sid, eid, d2 = results[0]
    assert d2 == 4.0
    assert sid == 1
    assert eid == -1  # interior, no specific edge

    # without interiors: a specific edge, edge id 3 (5:10 -> 0:10)
    results = find_furthest_edges(shapes, target[None])[0]
    sid, eid, d2 = results[0]
    assert d2 <= 4.0
    assert sid == 1
    assert eid == 3


def test_antipodal_point_outside_indexed_polygon():
    # s2furthest_edge_query_test.cc:222-235: target antipodal to the
    # polyline loop's interior (which has none); everything is below the
    # 179-degree threshold
    shapes = parse_index("# 0:0, 0:5, 5:5, 5:0 # 0:10, 0:15, 5:15, 5:10")
    target = -_pt(2, 2)
    results = find_furthest_edges(
        shapes,
        target[None],
        include_interiors=True,
        min_distance_rad=math.radians(179),
    )[0]
    assert results == []


class TestCrossingEdgeQuery:
    """GetCrossingEdges fixtures — port of s2crossing_edge_query_test.cc
    (PolylineCrossings :332-344, ShapeIdsAreCorrect :345-363, both via
    the TestPolylineCrossings completeness check at :307-331)."""

    @staticmethod
    def _check_polyline_crossings(index_str, a0, a1):
        from s2geometry_spark.kernel.closest_edge import (
            get_crossing_edges,
            parse_index,
        )
        from s2geometry_spark.kernel.predicates import crossing_sign

        shapes = parse_index(index_str)
        edges = get_crossing_edges(shapes, a0, a1)
        # every returned edge really crosses (sign >= 0)
        for sid, eid in edges:
            shape = shapes[sid]
            assert (
                crossing_sign(a0, a1, shape.edges_c[eid], shape.edges_d[eid])
                >= 0
            )
        # and no crossing edge is missing
        for shape in shapes:
            for e in range(len(shape.edges_c)):
                if crossing_sign(a0, a1, shape.edges_c[e], shape.edges_d[e]) >= 0:
                    assert edges.count((shape.shape_id, e)) == 1
        return edges

    def test_polyline_crossings(self):
        # three zig-zag lines near the equator
        index = (
            "# 0:0, 2:1, 0:2, 2:3, 0:4, 2:5, 0:6"
            " | 1:0, 3:1, 1:2, 3:3, 1:4, 3:5, 1:6"
            " | 2:0, 4:1, 2:2, 4:3, 2:4, 4:5, 2:6 #"
        )
        edges = self._check_polyline_crossings(index, _pt(1, 0), _pt(1, 4))
        assert len(edges) > 0
        # shape 2 (zig-zag between lat 2 and 4) is never crossed by the
        # lat-1 query edge
        assert all(sid != 2 for sid, _ in edges)
        assert self._check_polyline_crossings(index, _pt(5, 5), _pt(6, 6)) == []

    def test_shape_ids_are_correct(self):
        # two 100-vertex regular loops as polylines, a long query edge
        import math as m

        def regular(center, radius_deg, n):
            z = center / np.linalg.norm(center)
            ref = (
                np.array([1.0, 0.0, 0.0])
                if abs(z[0]) < 0.9
                else np.array([0.0, 1.0, 0.0])
            )
            x = np.cross(z, ref)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            pts = []
            for i in range(n + 1):
                th = 2 * m.pi * (i % n) / n
                d = m.cos(th) * x + m.sin(th) * y
                v = m.cos(m.radians(radius_deg)) * z + m.sin(
                    m.radians(radius_deg)
                ) * d
                pts.append(v / np.linalg.norm(v))
            return np.asarray(pts)

        from s2geometry_spark.kernel.closest_edge import (
            Shape,
            get_crossing_edges,
        )
        from s2geometry_spark.kernel.predicates import crossing_sign

        loops = [regular(_pt(0, 0), 5, 100), regular(_pt(0, 20), 5, 100)]
        shapes = [
            Shape(i, 1, v[:-1], v[1:]) for i, v in enumerate(loops)
        ]
        a0, a1 = _pt(1, -10), _pt(1, 30)
        edges = get_crossing_edges(shapes, a0, a1)
        assert len(edges) > 0
        seen_shapes = {sid for sid, _ in edges}
        assert seen_shapes == {0, 1}
        for sid, eid in edges:
            shape = shapes[sid]
            assert (
                crossing_sign(a0, a1, shape.edges_c[eid], shape.edges_d[eid])
                >= 0
            )
