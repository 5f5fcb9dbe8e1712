"""Ports of the three S2Closest*QueryBase MaxDistance proof-of-concept
tests (s2closest_edge_query_base_test.cc, s2closest_point_query_base_test.cc,
s2closest_cell_query_base_test.cc) plus s2shapeutil_shape_edge_id_test.cc.

The reference instantiates its templated best-first query bases with
S2MaxDistance (reversed ordering) to show the machinery serves furthest
queries too.  This engine expresses the same reflection through the
antipode identity |x-p|^2 + |-x-p|^2 = 4 (s2max_distance_targets.cc):
each furthest query runs the corresponding optimized closest query
against -x and maps d2 -> 4 - d2, so one machinery serves both
directions, exactly as the base template does.

ShapeEdgeId is represented as a plain (shape_id, edge_id) tuple
(kernel/vector_shapes.py:shape_edge_id); Python tuple comparison is
lexicographic with shape_id first, which is precisely the contract
s2shapeutil_shape_edge_id_test.cc pins.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import cellid as cid_np
from s2geometry_spark.kernel.cell_index import CellIndex, find_furthest_cells
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.closest_edge import find_furthest_edges, parse_index
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.point_index import PointIndex, find_furthest_points


def _pt(lat: float, lng: float) -> np.ndarray:
    x, y, z = latlng_to_xyz(np.array([lat]), np.array([lng]))
    return np.array([x[0], y[0], z[0]])


def _cid(s: str) -> CID:
    face, path = s.split("/")
    c = CID.from_face(int(face))
    for ch in path:
        c = c.child(int(ch))
    return c


def _chord2_to_degrees(d2: float) -> float:
    return math.degrees(2.0 * math.asin(0.5 * math.sqrt(d2)))


def test_closest_edge_query_base_max_distance():
    """s2closest_edge_query_base_test.cc:51-65: FurthestEdgeQuery over
    the point-vector index "0:0 | 1:0 | 2:0 | 3:0 # #", target 4:0,
    max_results=1 -> (shape 0, edge 0) at 4 degrees."""
    shapes = parse_index("0:0 | 1:0 | 2:0 | 3:0 # #")
    res = find_furthest_edges(shapes, _pt(4, 0)[None], k=1)
    assert len(res) == 1 and len(res[0]) == 1
    sid, eid, d2 = res[0][0]
    assert sid == 0
    assert eid == 0
    assert abs(_chord2_to_degrees(d2) - 4.0) < 1e-13


def test_closest_point_query_base_max_distance():
    """s2closest_point_query_base_test.cc:51-88: FurthestPointQuery over
    points 0:0, 1:0, 2:0, 3:0 with data 0..3, target 4:0,
    max_results=1 -> point 0:0, data 0, 4 degrees."""
    index = PointIndex()
    pts = [_pt(float(i), 0.0) for i in range(4)]
    for i, p in enumerate(pts):
        index.add(p, i)
    res = find_furthest_points(index, _pt(4, 0), max_results=1)
    assert len(res) == 1
    assert np.array_equal(res[0].point, pts[0])
    assert res[0].data == 0
    assert abs(_chord2_to_degrees(res[0].distance2) - 4.0) < 1e-13


def test_closest_cell_query_base_max_distance():
    """s2closest_cell_query_base_test.cc:53-91: FurthestCellQuery over
    cells {0/123, 0/22, 0/3} with label 1, target = center of 3/123
    (the antipodal cell) -> cell 0/123, label 1, length2 EXACTLY 4.0."""
    index = CellIndex()
    for tok in ("0/123", "0/22", "0/3"):
        index.add(_cid(tok), 1)
    index.build()
    x, y, z = cid_np.to_point(np.array([_cid("3/123").id], dtype=np.uint64))
    res = find_furthest_cells(index, np.array([x[0], y[0], z[0]]), max_results=1)
    assert len(res) == 1
    assert res[0].cell_id == _cid("0/123")
    assert res[0].label == 1
    assert res[0].distance2 == 4.0


def test_furthest_points_min_distance_and_k():
    """Options surface of the S2MaxDistance instantiation: max_results
    ordering is decreasing distance; min_distance is an exclusive lower
    bound (s2furthest_point_query.h set_min_distance semantics)."""
    index = PointIndex()
    pts = [_pt(float(i), 0.0) for i in range(4)]
    for i, p in enumerate(pts):
        index.add(p, i)
    res = find_furthest_points(index, _pt(4, 0), max_results=3)
    assert [r.data for r in res] == [0, 1, 2]
    d = [_chord2_to_degrees(r.distance2) for r in res]
    assert d[0] > d[1] > d[2]
    # exclusive bound at 2.5 degrees keeps only 0:0 and 1:0
    s = 2 * math.sin(math.radians(2.5) / 2)
    res = find_furthest_points(index, _pt(4, 0), max_results=4, min_distance2=s * s)
    assert [r.data for r in res] == [0, 1]


def test_shape_edge_id_comparisons():
    """s2shapeutil_shape_edge_id_test.cc:32-78: equality and the
    lexicographic shape-id-first ordering over (shape_id, edge_id)."""
    assert (1, 2) == (1, 2)
    assert (1, 2) != (3, 2)  # BothShapeIdUnequalIsUnequal
    assert (1, 2) != (1, 3)  # BothEdgeIdUnequalIsUnequal
    # LessThan / LessEq / GreaterThan / GreaterEq, shape_id first
    assert (1, 2) < (1, 3)
    assert (1, 9) < (2, 0)
    assert not (2, 0) < (1, 9)
    assert (1, 2) <= (1, 2)
    assert (1, 2) <= (1, 3)
    assert (1, 3) > (1, 2)
    assert (2, 0) > (1, 9)
    assert (1, 2) >= (1, 2)
    assert (2, 0) >= (1, 9)
