"""Final lax-polygon-layer + buffered-region tail ports:
IsFullPolygonPredicateNotCalled
(s2builderutil_lax_polygon_layer_test.cc:338-356),
IndexedLaxPolygonLayer.AddsShape / IgnoresEmptyShape (cc:358-380), and
S2ShapeIndexBufferedRegion.FullAfterBuffering
(s2shape_index_buffered_region_test.cc)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.builder import IdentitySnapFunction
from s2geometry_spark.kernel.closest_edge import parse_index
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.coverer import RegionCoverer
from s2geometry_spark.kernel.layers import Builder, LaxPolygonLayer
from s2geometry_spark.kernel.mutable_index import MutableIndex
from s2geometry_spark.kernel.region import ShapeIndexBufferedRegion
from s2geometry_spark.kernel.shapeutil import LaxPolygon

ALL_DB = [
    LaxPolygonLayer.DISCARD,
    LaxPolygonLayer.DISCARD_HOLES,
    LaxPolygonLayer.DISCARD_SHELLS,
    LaxPolygonLayer.KEEP,
]


def _cycle_equal(a: np.ndarray, b: np.ndarray) -> bool:
    if len(a) != len(b):
        return False
    return any(
        (np.roll(a, -k, axis=0) == b).all() for k in range(len(a))
    )


@pytest.mark.parametrize("db", ALL_DB)
def test_is_full_polygon_predicate_not_called(db):
    """The is-full predicate must not be consulted when at least one
    non-degenerate loop is present — the reference registers
    IsFullPolygonUnspecified (an erroring predicate) and asserts the
    build still succeeds."""

    def exploding_predicate() -> bool:
        raise AssertionError("IsFullPolygonPredicate was called")

    b = Builder(IdentitySnapFunction(0.0))
    layer = LaxPolygonLayer(degenerate_boundaries=db)
    b.start_layer(layer)
    b.add_polygon([parse_points("0:0, 0:1, 1:1")])
    b.add_is_full_polygon_predicate(exploding_predicate)
    err = b.build()
    assert err is None, err
    assert len(layer.loops) == 1


def test_indexed_lax_polygon_layer_adds_shape():
    """IndexedLaxPolygonLayer.AddsShape: the built polygon lands in the
    index as one shape with the input boundary."""
    b = Builder(IdentitySnapFunction(0.0))
    layer = LaxPolygonLayer()
    b.start_layer(layer)
    expected = parse_points("0:0, 0:10, 10:0")
    b.add_polygon([expected])
    err = b.build()
    assert err is None, err
    index = MutableIndex()
    index.add(LaxPolygon(layer.loops))
    assert index.num_shape_ids() == 1
    got = index.shapes[0].loops
    assert len(got) == 1
    assert _cycle_equal(np.asarray(got[0], float), expected)


def test_indexed_lax_polygon_layer_ignores_empty_shape():
    """IndexedLaxPolygonLayer.IgnoresEmptyShape: building with no input
    adds nothing to the index."""
    b = Builder(IdentitySnapFunction(0.0))
    layer = LaxPolygonLayer()
    b.start_layer(layer)
    err = b.build()
    assert err is None, err
    index = MutableIndex()
    if layer.loops:  # the reference adds only non-empty results
        index.add(LaxPolygon(layer.loops))
    assert index.num_shape_ids() == 0


def test_full_after_buffering():
    """FullAfterBuffering: the six octahedron vertices buffered by 60°
    cover the sphere — the covering is exactly the 6 face cells."""
    shapes = parse_index("0:0 | 0:90 | 0:180 | 0:-90 | 90:0 | -90:0 # #")
    region = ShapeIndexBufferedRegion(shapes, math.radians(60))
    covering = RegionCoverer(max_cells=1000).get_covering(region)
    assert len(covering) == 6
    assert all(c.is_face() for c in covering)


# --- Indexed* layer wrappers (one test each in the reference): the layer
# result is added to a MutableS2ShapeIndex only when non-empty -----------


def _build_layer(layer, add=lambda b: None):
    b = Builder(IdentitySnapFunction(0.0))
    b.start_layer(layer)
    add(b)
    err = b.build()
    assert err is None, err
    return layer


def test_indexed_lax_polyline_layer_adds_empty_shape():
    """IndexedLaxPolylineLayer.AddsEmptyShape
    (s2builderutil_lax_polyline_layer_test.cc)."""
    from s2geometry_spark.kernel.layers import LaxPolylineLayer

    layer = _build_layer(LaxPolylineLayer())
    index = MutableIndex()
    if layer.polyline is not None and len(layer.polyline) > 0:
        index.add(layer.polyline)
    assert index.num_shape_ids() == 0


def test_indexed_polyline_layer_adds_empty_shape():
    """IndexedS2PolylineLayer.AddsEmptyShape — adding an empty polyline
    still produces no indexed shape."""
    from s2geometry_spark.kernel.layers import PolylineLayer

    layer = _build_layer(
        PolylineLayer(), lambda b: b.add_polyline(np.zeros((0, 3)))
    )
    index = MutableIndex()
    if layer.polyline is not None and len(layer.polyline) > 0:
        index.add(layer.polyline)
    assert index.num_shape_ids() == 0


def test_indexed_point_vector_layer_adds_shapes():
    """IndexedS2PointVectorLayer.AddsShapes: two points land in the
    index as ONE point-vector shape preserving both points."""
    from s2geometry_spark.kernel.layers import PointVectorLayer
    from s2geometry_spark.kernel.vector_shapes import PointVectorShape

    p0 = parse_points("0:0")[0]
    p1 = parse_points("2:2")[0]

    def add(b):
        b.add_point(p0)
        b.add_point(p1)

    layer = _build_layer(PointVectorLayer(), add)
    index = MutableIndex()
    if layer.points:
        index.add(PointVectorShape(np.asarray(layer.points)))
    assert index.num_shape_ids() == 1
    shape = index.shapes[0]
    got = np.asarray(shape.points, float)
    assert len(got) == 2
    assert {tuple(v) for v in got} == {tuple(p0), tuple(p1)}


def test_indexed_point_vector_layer_does_not_add_empty_shape():
    from s2geometry_spark.kernel.layers import PointVectorLayer

    layer = _build_layer(PointVectorLayer())
    index = MutableIndex()
    if layer.points:
        index.add(np.asarray(layer.points))
    assert index.num_shape_ids() == 0


def test_indexed_polyline_vector_layer_adds_shapes():
    """IndexedS2PolylineVectorLayer.AddsShapes: two disjoint polylines
    come back as two indexed shapes with their vertices intact."""
    from s2geometry_spark.kernel.layers import PolylineVectorLayer
    from s2geometry_spark.kernel.shapeutil import LaxPolyline

    l0 = parse_points("0:0, 1:1")
    l1 = parse_points("2:2, 3:3")

    def add(b):
        b.add_polyline(l0)
        b.add_polyline(l1)

    layer = _build_layer(PolylineVectorLayer(), add)
    index = MutableIndex()
    for pl in layer.polylines:
        index.add(LaxPolyline(pl))
    assert index.num_shape_ids() == 2
    got = sorted(
        tuple(map(tuple, np.asarray(s.vertices, float)))
        for s in index.shapes
    )
    assert got == sorted(
        [tuple(map(tuple, l0)), tuple(map(tuple, l1))]
    )
