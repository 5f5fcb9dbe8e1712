"""Ports of s2shapeutil_coding_test.cc plus the FULL
encoded_s2shape_index JavaByteCompatibility golden (shapes + index)."""

from __future__ import annotations

import numpy as np

from s2geometry_spark.kernel.encodings import Decoder, Encoder
from s2geometry_spark.kernel.mutable_index import MutableIndex
from s2geometry_spark.kernel.shapeutil import LaxPolygon, LaxPolyline
from s2geometry_spark.kernel.tagged_shapes import (
    S2PolylineShape,
    decode_index_snapshot,
    decode_tagged_shapes,
    encode_index_snapshot,
    encode_tagged_shapes,
)
from s2geometry_spark.kernel.vector_shapes import PointVectorShape
from tests.test_mutable_index import (
    latlng_pts,
    make_regular_loop,
    quadratic_validate,
)

JAVA_GOLDEN_HEX = (
    "100036020102000000B4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF913FFC7F"
    "B8B805F6EF3F28516A6D8FDBA13F27DCF7C958DEA13F28C809010408020010"
)


def test_full_java_byte_compatibility_encode():
    # encoded_s2shape_index_test.cc:365-385: the COMPLETE byte stream
    # (tagged shapes + index) for [released, polyline(1:1, 2:2)]
    index = MutableIndex()
    index.add(S2PolylineShape(latlng_pts("0:0, 1:1")))
    index.add(S2PolylineShape(latlng_pts("1:1, 2:2")))
    index.release(0)
    enc = Encoder()
    encode_index_snapshot(index, enc)
    assert bytes(enc.buf).hex().upper() == JAVA_GOLDEN_HEX


def test_full_java_byte_compatibility_decode():
    shapes, max_edges, cells = decode_index_snapshot(
        Decoder(bytes.fromhex(JAVA_GOLDEN_HEX)))
    assert max_edges == 10
    assert shapes[0] is None
    assert isinstance(shapes[1], S2PolylineShape)
    assert np.allclose(shapes[1].vertices, latlng_pts("1:1, 2:2"),
                       rtol=0, atol=0)
    assert len(cells) == 1
    assert cells[0][1] == [(1, False, (0,))]


def roundtrip_shapes(shapes, hint="compact"):
    enc = Encoder()
    encode_tagged_shapes(shapes, enc, hint=hint)
    return decode_tagged_shapes(Decoder(bytes(enc.buf)))


def test_tagged_polyline_roundtrip():
    got = roundtrip_shapes([S2PolylineShape(latlng_pts("0:0, 0:10, 10:10"))])
    assert (got[0].vertices == latlng_pts("0:0, 0:10, 10:10")).all()


def test_tagged_lax_polyline_roundtrip():
    v = latlng_pts("5:5, 5:6, 6:6")
    got = roundtrip_shapes([LaxPolyline(v)], hint="compact")
    assert (got[0].vertices == v).all()
    got = roundtrip_shapes([LaxPolyline(v)], hint="fast")
    assert (got[0].vertices == v).all()


def test_tagged_lax_polygon_roundtrip():
    loops = [make_regular_loop([1, 0, 0], 5.0, 8),
             make_regular_loop([1, 0.01, 0.01], 1.0, 6)]
    got = roundtrip_shapes([LaxPolygon(loops)])
    assert isinstance(got[0], LaxPolygon)
    assert len(got[0].loops) == 2
    for a, b in zip(got[0].loops, loops):
        assert (a == b).all()


def test_tagged_point_vector_roundtrip():
    pts = latlng_pts("1:1, 2:2, 3:3, 4:4")
    got = roundtrip_shapes([PointVectorShape(pts)])
    assert isinstance(got[0], PointVectorShape)
    assert (got[0].points == pts).all()


def test_tagged_mixed_with_null():
    v = latlng_pts("0:0, 1:1")
    got = roundtrip_shapes(
        [None, LaxPolyline(v), None, PointVectorShape(v)])
    assert got[0] is None and got[2] is None
    assert (got[1].vertices == v).all()
    assert (got[3].points == v).all()


def test_snapshot_roundtrip_with_index_rebuild():
    # decode the snapshot, rebuild the index from the decoded shapes,
    # and check the rebuilt decomposition matches the encoded cells
    index = MutableIndex()
    index.add(LaxPolygon([make_regular_loop([3, 2, 1], 10.0, 64)]))
    index.add(LaxPolyline(latlng_pts("10:10, 30:40")))
    enc = Encoder()
    encode_index_snapshot(index, enc)
    shapes, max_edges, cells = decode_index_snapshot(
        Decoder(bytes(enc.buf)))
    assert [(c.id, cl) for c, cl in cells] \
        == [(c.id, cl) for c, cl in index.cells()]
    rebuilt = MutableIndex(max_edges)
    for s in shapes:
        rebuilt.add(s)
    assert [(c.id, cl) for c, cl in rebuilt.cells()] \
        == [(c.id, cl) for c, cl in index.cells()]
    quadratic_validate(rebuilt)


MIXED_GOLDEN_HEX = (
    "2932007C00E4002E0192010310000000000000F03F000000000000000000000000000000"
    "008AAFF597C0FEEF3F1EDD892B0BDF913F00000000000000000418B4825F3C81FDEF3F27"
    "DCF7C958DE913F1EDD892B0BDF913FD44A8442C3F9EF3FCE5B5A6FA6DDA13F1EDD892B0B"
    "DF913FAE0218F586F3EF3F3C3F66D2BBCAAA3F1EDD892B0BDF913F05010220FC7FB8B805"
    "F6EF3F28516A6D8FDBA13F27DCF7C958DEA13F96E20626CAEFEF3F4BF8A48399C7AA3F27"
    "DCF7C958DEA13F96B6DB0611E7EF3FC0221C80C6D8B13F27DCF7C958DEA13FE2337CCA8F"
    "E9EF3F6C573C9B60C2AA3F0EC9EF48C7CBAA3F0C0001040418B4825F3C81FDEF3F27DCF7"
    "C958DE913F1EDD892B0BDF913FD44A8442C3F9EF3FCE5B5A6FA6DDA13F1EDD892B0BDF91"
    "3FAE0218F586F3EF3F3C3F66D2BBCAAA3F1EDD892B0BDF913F05010120000000000000F0"
    "3F00000000000000000000000000000000F6FF70710BECEF3F28516A6D8FDBB13F000000"
    "00000000003C4A985423D8EF3F199E8D966CD0B13F28516A6D8FDBB13FF6FF70710BECEF"
    "3F000000000000000028516A6D8FDBB13F28C83900010003010403040504070400073807"
    "0E1B24292B3213000009030002130000110300092B00010001000000010D000002230410"
    "04020400020113082106110A4113000111030101"
)


def test_decode_from_byte_string_golden():
    # s2shapeutil_coding_test.cc:67-96: a 5-shape mixed index golden —
    # point vector | lax polyline | 2-loop lax polygon | added lax
    # polyline | added lax polygon, plus the encoded index cells
    shapes, max_edges, cells = decode_index_snapshot(
        Decoder(bytes.fromhex(MIXED_GOLDEN_HEX)))
    assert max_edges == 10
    assert len(shapes) == 5
    assert isinstance(shapes[0], PointVectorShape)
    assert (shapes[0].points == latlng_pts("0:0, 0:1")).all()
    assert isinstance(shapes[1], LaxPolyline)
    assert (shapes[1].vertices == latlng_pts("1:1, 1:2, 1:3")).all()
    assert isinstance(shapes[2], LaxPolygon)
    assert len(shapes[2].loops) == 2
    assert (shapes[2].loops[0] == latlng_pts("2:2")).all()
    assert (shapes[2].loops[1] == latlng_pts("2:3, 2:4, 3:3")).all()
    assert isinstance(shapes[3], LaxPolyline)
    assert (shapes[3].vertices == latlng_pts("1:1, 1:2, 1:3")).all()
    assert isinstance(shapes[4], LaxPolygon)
    assert (shapes[4].loops[0] == latlng_pts("0:0, 0:4, 4:4, 4:0")).all()

    # rebuilding the index from the decoded shapes reproduces the
    # encoded cell decomposition exactly
    rebuilt = MutableIndex(max_edges)
    for s in shapes:
        rebuilt.add(s)
    assert [(c.id, cl) for c, cl in rebuilt.cells()] \
        == [(c.id, cl) for c, cl in cells]
    quadratic_validate(rebuilt)

    # and re-encoding the rebuilt index (FAST hint, as the golden was
    # produced by FastEncodeTaggedShapes) reproduces every byte
    enc = Encoder()
    encode_index_snapshot(rebuilt, enc, hint="fast")
    assert bytes(enc.buf).hex().upper() == MIXED_GOLDEN_HEX
