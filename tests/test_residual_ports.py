"""Residual reference-suite ports: the last semantic test cases not
covered by any earlier tranche.

- s2earth_test.cc TestAngleConversion / TestSolidAngleConversion
- s2shapeutil_count_edges_test.cc CountEdgesUpTo.StopsEarly
- s2point_index_test.cc S2PointIndex.EmptyData (add/remove semantics;
  the sizeof(PointData) assertion is C++ storage layout, N/A)
- s2builderutil_s2polyline_vector_layer_test.cc ValidateTrue (the
  ValidateFalse twin asserts S2Debug::ALLOW global-debug interplay,
  N/A — there is no process-wide S2Debug flag here)
- s2builderutil_lax_polyline_layer_test.cc LaxPolylineLayerOptionsTest.
  SetEdgeType
- s2shapeutil_coding_test.cc DecodeTaggedShapes.DecodeFromEncoded
- s2builder_graph_test.cc S2BuilderGraph.BasicVertexOutApi (the
  iterator-arithmetic half is C++ iterator mechanics)
- s2shape_index_buffered_region_test.cc InitEmptyIndex
- s2density_tree_test.cc S2DensityTreeCoderTest.S2CoderWorks_
  UninitializedTree (empty-tree wire roundtrip)
- encoded_s2shape_index_test.cc LazyDecode re-expressed as a
  concurrent-reader consistency check (the reference verifies
  thread-safe lazy decoding; here 8 threads decode and query the same
  snapshot bytes and must agree bit-for-bit)
"""

from __future__ import annotations

import math
import threading

import numpy as np

from s2geometry_spark.kernel import metrics as M
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.distance import angle_to_chord2, chord2_to_angle


def test_s2earth_angle_conversion():
    """s2earth_test.cc TestAngleConversion — meter and km conversions
    are exact inverses through the 6371.01 km radius; the chord-angle
    lanes roundtrip through chord-squared space."""
    assert M.meters_to_radians(M.EARTH_RADIUS_METERS) == 1.0
    # MetersToChordAngle: angle -> chord -> back
    chord2 = angle_to_chord2(M.meters_to_radians(M.EARTH_RADIUS_METERS))
    assert abs(float(chord2_to_angle(chord2)) - 1.0) < 1e-15
    assert M.meters_to_radians(M.radians_to_km(0.3) * 1000) == 0.3
    assert M.radians_to_meters(math.radians(180)) == (
        M.EARTH_RADIUS_METERS * math.pi
    )
    assert M.radians_to_meters(M.km_to_radians(2.5)) == 2500.0
    assert M.km_to_radians(M.EARTH_RADIUS_KM) == 1.0
    assert M.km_to_radians(M.EARTH_RADIUS_METERS / 1000) == 1.0
    assert M.radians_to_km(0.5) == 0.5 * M.EARTH_RADIUS_KM


def test_s2earth_solid_angle_conversion():
    """s2earth_test.cc TestSolidAngleConversion."""
    assert M.square_km_to_steradians(
        (M.EARTH_RADIUS_METERS / 1000) ** 2) == 1.0
    assert M.steradians_to_square_km(0.5 ** 2) == (
        (0.5 * M.EARTH_RADIUS_KM) ** 2
    )
    got = M.square_meters_to_steradians((M.radians_to_km(0.3) * 1000) ** 2)
    assert abs(got - 0.3 ** 2) < 1e-17
    got = M.steradians_to_square_meters(M.km_to_radians(2.5) ** 2)
    assert abs(got - 2500.0 ** 2) < 1e-6


def test_count_edges_up_to_stops_early():
    """CountEdgesUpTo.StopsEarly: whole shapes are counted at a time, so
    the running total may overshoot max_edges by up to one shape."""
    from s2geometry_spark.kernel.shapeutil import (
        count_edges,
        count_edges_up_to,
    )

    pts = parse_points("0:0, 0:1, 0:2, 0:3, 0:4")
    shapes = [
        (0, [np.asarray(pts)]),                       # 5 point "edges"
        (1, [np.asarray(parse_points("1:0, 1:1"))]),  # 1 edge
        (1, [np.asarray(parse_points("1:2, 1:3"))]),  # 1 edge
        (1, [np.asarray(parse_points("1:4, 1:5, 1:6"))]),  # 2 edges
    ]
    assert count_edges(shapes) == 9
    assert count_edges_up_to(shapes, 1) == 5
    assert count_edges_up_to(shapes, 5) == 5
    assert count_edges_up_to(shapes, 6) == 6
    assert count_edges_up_to(shapes, 8) == 9


def test_point_index_add_remove():
    """S2PointIndex.EmptyData: points can be added and removed; the
    index ends empty."""
    from s2geometry_spark.kernel.point_index import PointIndex

    index = PointIndex()
    index.add([1.0, 0.0, 0.0], None)
    assert index.num_points() == 1
    assert index.remove([1.0, 0.0, 0.0]) is True
    assert index.num_points() == 0
    assert index.remove([1.0, 0.0, 0.0]) is False
    # data-qualified removal removes only a matching pair
    index.add([0.0, 1.0, 0.0], "a")
    index.add([0.0, 1.0, 0.0], "b")
    assert index.remove([0.0, 1.0, 0.0], "b") is True
    assert index.num_points() == 1
    pts, data, _ = index.arrays()
    assert data[0] == "a"


def test_polyline_vector_layer_validate_true():
    """S2PolylineVectorLayer.ValidateTrue: an antipodal edge fails the
    build with ANTIPODAL_VERTICES when validate is on."""
    from s2geometry_spark.kernel.builder import IdentitySnapFunction
    from s2geometry_spark.kernel.layers import Builder, PolylineVectorLayer

    b = Builder(IdentitySnapFunction(0.0))
    layer = PolylineVectorLayer(validate=True)
    b.start_layer(layer)
    b.add_edge([1.0, 0.0, 0.0], [-1.0, 0.0, 0.0])
    err = b.build()
    assert err is not None and "ANTIPODAL_VERTICES" in err


def test_lax_polyline_layer_edge_type_option():
    """LaxPolylineLayerOptionsTest.SetEdgeType: DIRECTED by default,
    settable to UNDIRECTED."""
    from s2geometry_spark.kernel.graph import DIRECTED, UNDIRECTED
    from s2geometry_spark.kernel.layers import LaxPolylineLayer

    layer = LaxPolylineLayer()
    assert layer.edge_type == DIRECTED
    layer = LaxPolylineLayer(edge_type=UNDIRECTED)
    assert layer.edge_type == UNDIRECTED


def test_decode_from_encoded():
    """DecodeTaggedShapes.DecodeFromEncoded: a decoded shape can itself
    be re-encoded, and the re-encoded bytes decode to the same shape
    (the reference checks full and lazy decode agree on the type tag)."""
    from s2geometry_spark.kernel.encodings import Decoder, Encoder
    from s2geometry_spark.kernel.tagged_shapes import (
        decode_tagged_shapes,
        encode_tagged_shapes,
    )
    from s2geometry_spark.kernel.vector_shapes import PointVectorShape

    pts = np.asarray(parse_points("0:0, 0:1"))
    enc = Encoder()
    encode_tagged_shapes([PointVectorShape(pts)], enc, hint="fast")
    decoded = decode_tagged_shapes(Decoder(bytes(enc.buf)))
    assert len(decoded) == 1
    # encode the decoded form again — both byte streams must decode to
    # identical content
    re_enc = Encoder()
    encode_tagged_shapes(decoded, re_enc, hint="fast")
    redecoded = decode_tagged_shapes(Decoder(bytes(re_enc.buf)))
    np.testing.assert_array_equal(
        np.asarray(redecoded[0].points), pts
    )


def test_basic_vertex_out_api():
    """S2BuilderGraph.BasicVertexOutApi: three polylines sharing a start
    vertex — exactly one out-edge between the first two vertices, and
    the out-edge-ids of the shared vertex enumerate all three."""
    from s2geometry_spark.kernel.graph import (
        DIRECTED,
        DISCARD_EXCESS,
        KEEP,
        Graph,
        GraphOptions,
        IdSetLexicon,
        VertexOutMap,
    )

    vertices = np.asarray(parse_points("0:0, 1:1, 2:0, 1:0, 0:1, 0:2"))
    edges = sorted([(0, 1), (1, 2), (0, 3), (3, 2), (0, 4), (4, 5)])
    lexicon = IdSetLexicon()
    input_ids = [lexicon.add([i]) for i in range(len(edges))]
    g = Graph(
        GraphOptions(DIRECTED, DISCARD_EXCESS, KEEP, KEEP),
        vertices, edges, input_ids, lexicon,
    )
    outmap = VertexOutMap(g)
    between_01 = [e for e in outmap.edge_ids(0) if g.edge(e) == (0, 1)]
    assert len(between_01) == 1
    assert outmap.degree(0) == 3
    assert sorted(g.edge(e)[1] for e in outmap.edge_ids(0)) == [1, 3, 4]
    assert outmap.degree(5) == 0


def test_buffered_region_init_empty_index():
    """S2ShapeIndexBufferedRegion.InitEmptyIndex: buffering an empty
    index yields an empty covering."""
    from s2geometry_spark.kernel.coverer import RegionCoverer
    from s2geometry_spark.kernel.region import ShapeIndexBufferedRegion

    region = ShapeIndexBufferedRegion([], math.radians(2.0))
    covering = RegionCoverer().get_covering(region)
    assert covering == []


def test_density_coder_uninitialized_tree():
    """S2DensityTreeCoderTest.S2CoderWorks_UninitializedTree: an empty
    (uninitialized) tree encodes and decodes to an empty tree."""
    from s2geometry_spark.kernel.density_tree import (
        DensityTree,
        decode_tree,
        encode_tree,
    )

    data = encode_tree({})
    assert decode_tree(data) == {}
    assert DensityTree(decode_tree(data)).leaves() == []


def test_lazy_decode_concurrent_readers():
    """EncodedS2ShapeIndex.LazyDecode re-expressed: 8 concurrent readers
    decode the same snapshot bytes and run containment queries; all
    must see bit-identical content.  (The reference exercises C++
    lazy-init races; Python decoding is GIL-serialized, so the
    invariant under test is reader-independence of the byte stream.)"""
    from s2geometry_spark.kernel.encodings import Decoder, Encoder
    from s2geometry_spark.kernel.mutable_index import MutableIndex
    from s2geometry_spark.kernel.shapeutil import LaxPolygon
    from s2geometry_spark.kernel.tagged_shapes import (
        decode_index_snapshot,
        encode_index_snapshot,
    )

    index = MutableIndex()
    index.add(LaxPolygon([np.asarray(
        parse_points("0:0, 0:10, 10:10, 10:0"))]))
    index.add(LaxPolygon([np.asarray(
        parse_points("20:20, 20:30, 30:30"))]))
    enc = Encoder()
    encode_index_snapshot(index, enc)
    data = bytes(enc.buf)

    results = []
    errors = []

    def reader():
        try:
            for _ in range(50):
                shapes, max_edges, cells = decode_index_snapshot(
                    Decoder(data))
                results.append(
                    (len(shapes), max_edges,
                     tuple(int(cid.id) for cid, _ in cells))
                )
        except Exception as e:  # pragma: no cover - failure surface
            errors.append(e)

    threads = [threading.Thread(target=reader) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(set(results)) == 1
