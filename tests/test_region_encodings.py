"""Port of s2region_test.cc: version-1 Encode/Decode of every region
type against the reference's golden hex strings (bit-for-bit)."""

import numpy as np
import pytest

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel import encodings as E
from s2geometry_spark.kernel.cid import CID, POS_BITS
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.predicates import ORIGIN
from s2geometry_spark.kernel.region import Cap, LatLng, LatLngRect

KCROSS1 = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1"
KCROSS_HOLE = "-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5"


def _norm(p):
    """Vector3::Normalize(): divide by sqrt(x*x + y*y + z*z) exactly as
    the reference does (util/math/vector.h Norm2) — np.linalg.norm's
    scaled BLAS nrm2 rounds differently by 1 ulp on some inputs."""
    x, y, z = (float(v) for v in p)
    n = (x * x + y * y + z * z) ** 0.5
    return np.array([x / n, y / n, z / n])


def _leaf_from_point(p):
    p = _norm(p)
    return int(K.from_point(np.array([p[0]]), np.array([p[1]]),
                            np.array([p[2]]))[0])


# Golden hex from s2region_test.cc:50-169 (version-1 encoding format).

def test_cap_encode_decode():
    cases = [
        ("000000000000F03F00000000000000000000000000000000"
         "000000000000F0BF", Cap.empty()),
        ("000000000000F03F00000000000000000000000000000000"
         "0000000000001040", Cap.full()),
        ("3F36105836A8E93F2A2460E5CE1AE13F2A2460E5CE1AD13F"
         "0000000000000000", Cap.from_point(_norm((3, 2, 1)))),
        ("00000000000000000000000000000000000000000000F03F"
         "0000000000001040",
         Cap.from_center_height(_norm((0, 0, 1)), 5)),
    ]
    for golden, cap in cases:
        enc = E.encode_cap(cap)
        assert enc.hex() == golden
        got = E.decode_cap(E.Decoder(bytes(enc.buf)))
        assert cap.approx_equals(got)


def test_cell_encode_decode():
    cell_ids = [
        ("F51392E0F35DCC43", _leaf_from_point((1, 2, 3))),
        ("6308962A95849980",
         int(K.from_latlng(np.array([39.0]), np.array([-120.0]))[0])),
        ("0057341200000060",
         CID((3 << POS_BITS) + (0x12345678 | 1)).parent(30 - 4).id),
        ("0000000000000010", CID.from_face(0).id),
    ]
    for golden, cid in cell_ids:
        enc = E.encode_cellid(cid)
        assert enc.hex() == golden
        assert E.decode_cellid(E.Decoder(bytes(enc.buf))) == cid


def test_cell_union_encode_decode():
    cases = [
        ("010000000000000000", []),
        ("0101000000000000000000000000000030", [CID.from_face(1).id]),
        ("0103000000000000003300000000000000AB8F74E308000000"
         "2734F8DEBC0A2391",
         [0x33, 0x8E3748FAB, 0x91230ABCDEF83427]),
    ]
    for golden, ids in cases:
        enc = E.encode_cell_union(ids)
        assert enc.hex() == golden
        assert E.decode_cell_union(E.Decoder(bytes(enc.buf))) == ids


def test_latlng_rect_encode_decode():
    cases = [
        ("01000000000000F03F0000000000000000182D4454FB210940"
         "182D4454FB2109C0", LatLngRect.empty()),
        ("01182D4454FB21F9BF182D4454FB21F93F182D4454FB2109C0"
         "182D4454FB210940", LatLngRect.full()),
        ("0165732D3852C1F03F182D4454FB21F93FF75B8A41358C0340"
         "8744E74A185706C0",
         LatLngRect.from_center_size(LatLng.from_degrees(80, 170),
                                     LatLng.from_degrees(40, 60))),
    ]
    for golden, rect in cases:
        enc = E.encode_latlng_rect(rect)
        assert enc.hex() == golden
        got = E.decode_latlng_rect(E.Decoder(bytes(enc.buf)))
        assert rect.approx_equals(got)


def test_point_region_encode_decode():
    cases = [
        ("013BED86AA997A84BF88EC8B48C53C653FACD2721A90FFEF3F", ORIGIN),
        ("0109AD578332DBCA3FBC9FDB9BB4E4EE3FE67E7C2CA7CEC33F",
         _norm((12.34, 56.78, 9.1011))),
    ]
    for golden, p in cases:
        enc = E.encode_point_region(p)
        assert enc.hex() == golden
        got = E.decode_point_region(E.Decoder(bytes(enc.buf)))
        assert np.array_equal(got, np.asarray(p, dtype=np.float64))


def test_loop_encode_decode():
    empty_loop = np.array([[0.0, 0.0, 1.0]])
    full_loop = np.array([[0.0, 0.0, -1.0]])
    cross = parse_points(KCROSS1)
    cases = [
        ("010100000000000000000000000000000000000000000000000000F03F"
         "000000000001000000000000F03F0000000000000000182D4454FB210940"
         "182D4454FB2109C0", empty_loop),
        ("010100000000000000000000000000000000000000000000000000F0BF"
         "010000000001182D4454FB21F9BF182D4454FB21F93F182D4454FB2109C0"
         "182D4454FB210940", full_loop),
        ("0108000000D44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA1BF"
         "B4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF91BF"
         "B4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF913F"
         "D44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA13F"
         "D44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA13F"
         "B4825F3C81FDEF3F27DCF7C958DE91BF1EDD892B0BDF913F"
         "B4825F3C81FDEF3F27DCF7C958DE91BF1EDD892B0BDF91BF"
         "D44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA1BF"
         "0000000000013EFC10E8F8DFA1BF3EFC10E8F8DFA13F"
         "389D52A246DF91BF389D52A246DF913F", cross),
    ]
    for golden, vertices in cases:
        enc = E.encode_loop(vertices)
        assert enc.hex() == golden
        got_v, got_depth = E.decode_loop(E.Decoder(bytes(enc.buf)))
        assert np.array_equal(got_v, vertices)
        assert got_depth == 0


def test_polygon_uncompressed_encode_decode():
    cross = parse_points(KCROSS1)
    hole = parse_points(KCROSS_HOLE)
    golden1 = (
        "010100010000000108000000D44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C9"
        "58DEA1BFB4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF91BFB4825F3C"
        "81FDEF3F27DCF7C958DE913F1EDD892B0BDF913FD44A8442C3F9EF3F7EDA2AB3"
        "41DC913F27DCF7C958DEA13FD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C9"
        "58DEA13FB4825F3C81FDEF3F27DCF7C958DE91BF1EDD892B0BDF913FB4825F3C"
        "81FDEF3F27DCF7C958DE91BF1EDD892B0BDF91BFD44A8442C3F9EF3F7EDA2AB3"
        "41DC91BF27DCF7C958DEA1BF0000000000013EFC10E8F8DFA1BF3EFC10E8F8DF"
        "A13F389D52A246DF91BF389D52A246DF913F013EFC10E8F8DFA1BF3EFC10E8F8"
        "DFA13F389D52A246DF91BF389D52A246DF913F"
    )
    enc = E.encode_polygon_uncompressed([(cross, 0)])
    assert enc.hex() == golden1
    loops = E.decode_polygon_uncompressed(E.Decoder(bytes(enc.buf)))
    assert len(loops) == 1 and np.array_equal(loops[0][0], cross)

    golden2 = (
        "010101020000000108000000D44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C9"
        "58DEA1BFB4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF91BFB4825F3C"
        "81FDEF3F27DCF7C958DE913F1EDD892B0BDF913FD44A8442C3F9EF3F7EDA2AB3"
        "41DC913F27DCF7C958DEA13FD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C9"
        "58DEA13FB4825F3C81FDEF3F27DCF7C958DE91BF1EDD892B0BDF913FB4825F3C"
        "81FDEF3F27DCF7C958DE91BF1EDD892B0BDF91BFD44A8442C3F9EF3F7EDA2AB3"
        "41DC91BF27DCF7C958DEA1BF0000000000013EFC10E8F8DFA1BF3EFC10E8F8DF"
        "A13F389D52A246DF91BF389D52A246DF913F0104000000C5D7FA4B60FFEF3F1E"
        "DD892B0BDF813F214C95C437DF81BFC5D7FA4B60FFEF3F1EDD892B0BDF813F21"
        "4C95C437DF813FC5D7FA4B60FFEF3F1EDD892B0BDF81BF214C95C437DF813FC5"
        "D7FA4B60FFEF3F1EDD892B0BDF81BF214C95C437DF81BF000100000001900C5E"
        "3B73DF81BF900C5E3B73DF813F399D52A246DF81BF399D52A246DF813F013EFC"
        "10E8F8DFA1BF3EFC10E8F8DFA13F389D52A246DF91BF389D52A246DF913F"
    )
    enc = E.encode_polygon_uncompressed([(cross, 0), (hole, 1)])
    assert enc.hex() == golden2
    loops = E.decode_polygon_uncompressed(E.Decoder(bytes(enc.buf)))
    assert len(loops) == 2
    assert np.array_equal(loops[0][0], cross)
    assert np.array_equal(loops[1][0], hole)
    assert loops[1][1] == 1


def test_polyline_encode_decode():
    semi = np.stack([
        LatLng.from_degrees(0, 0).to_point(),
        LatLng.from_degrees(0, 90).to_point(),
        LatLng.from_degrees(0, 180).to_point(),
    ])
    three = parse_points("0:0, 0:10, 10:20, 20:30")
    cases = [
        ("0100000000", np.zeros((0, 3))),
        ("0103000000000000000000F03F000000000000000000000000"
         "00000000075C143326A6913C000000000000F03F000000000000"
         "0000000000000000F0BF075C143326A6A13C0000000000000000", semi),
        ("0104000000000000000000F03F00000000000000000000000000"
         "000000171C818C8B83EF3F89730B7E1A3AC63F00000000000000"
         "0061B46C3A039DED3FE2DC829F868ED53F89730B7E1A3AC63F1B"
         "995E6FA10AEA3F1B2D5242F611DE3FF50B8A74A8E3D53F", three),
    ]
    for golden, vertices in cases:
        enc = E.encode_polyline(vertices)
        assert enc.hex() == golden
        got = E.decode_polyline(E.Decoder(bytes(enc.buf)))
        assert np.array_equal(got, np.asarray(vertices, dtype=np.float64)
                              .reshape(-1, 3))


def test_decode_truncated_raises():
    enc = E.encode_cap(Cap.full())
    with pytest.raises(ValueError):
        E.decode_cap(E.Decoder(bytes(enc.buf)[:-2]))
    enc = E.encode_polyline(parse_points("0:0, 0:10"))
    with pytest.raises(ValueError):
        E.decode_polyline(E.Decoder(bytes(enc.buf)[:-1]))


def test_polygon_compressed_goldens():
    """The two v4-compressed goldens (s2region_test.cc:123-128): the
    empty polygon and the full polygon, encoded with the COMPACT hint."""
    enc = E.encode_polygon([])
    assert enc.hex() == "041E00"
    assert E.decode_polygon(E.Decoder(bytes(enc.buf))) == []

    full_loop = np.array([[0.0, 0.0, -1.0]])
    enc = E.encode_polygon([(full_loop, 0)])
    assert enc.hex() == "040001010B000100"
    loops = E.decode_polygon(E.Decoder(bytes(enc.buf)))
    assert len(loops) == 1
    assert np.array_equal(loops[0][0], full_loop)


def test_polygon_compact_hint_roundtrip():
    """COMPACT-hint polygons with snapped vertices choose the compressed
    format and roundtrip exactly (s2polygon.cc:731-785)."""
    from s2geometry_spark.kernel import cellid as K

    cross = parse_points(KCROSS1)
    # Snap the vertices to leaf centers so the histogram picks level 30.
    ids = K.from_point(cross[:, 0], cross[:, 1], cross[:, 2])
    x, y, z = K.to_point(ids)
    snapped = np.stack([x, y, z], -1)
    enc = E.encode_polygon([(snapped, 0)])
    assert bytes(enc.buf)[0] == E.COMPRESSED_VERSION
    loops = E.decode_polygon(E.Decoder(bytes(enc.buf)))
    assert np.array_equal(loops[0][0], snapped)

    # Unsnapped vertices fall back to the lossless format.
    enc2 = E.encode_polygon([(cross, 0)])
    assert bytes(enc2.buf)[0] == E.LOSSLESS_VERSION
    loops2 = E.decode_polygon(E.Decoder(bytes(enc2.buf)))
    assert np.array_equal(loops2[0][0], cross)


def test_polyline_compact_roundtrip():
    """EncodeMostCompact: snapped polylines compress, unsnapped ones
    fall back to lossless (s2polyline.cc:477-536)."""
    from s2geometry_spark.kernel import cellid as K

    three = parse_points("0:0, 0:10, 10:20, 20:30")
    ids = K.from_point(three[:, 0], three[:, 1], three[:, 2])
    x, y, z = K.to_point(K.parent(ids, 20))
    snapped = np.stack([x, y, z], -1)

    enc = E.encode_polyline_compact(snapped)
    assert bytes(enc.buf)[0] == E.POLYLINE_COMPRESSED_VERSION
    assert len(enc.buf) < 24 * len(snapped)
    got = E.decode_polyline_any(E.Decoder(bytes(enc.buf)))
    assert np.array_equal(got, snapped)

    # Genuinely unsnapped points (no vertex is a cell center at any
    # level — note "0:0" IS the face-0 center, so `three` above would
    # legitimately choose the compressed format).
    unsnapped = parse_points("0.5:0.5, 10.3:20.7, 30.1:40.9")
    enc2 = E.encode_polyline_compact(unsnapped)
    assert bytes(enc2.buf)[0] == E.LOSSLESS_VERSION
    got2 = E.decode_polyline_any(E.Decoder(bytes(enc2.buf)))
    assert np.array_equal(got2, unsnapped)

    enc3 = E.encode_polyline_compact(np.zeros((0, 3)))
    assert E.decode_polyline_any(E.Decoder(bytes(enc3.buf))).shape == (0, 3)


def test_loop_compressed_bound_threshold():
    """Loops with >= 64 vertices encode their bound
    (s2loop.cc:1445-1463); decode still roundtrips the vertices."""
    from s2geometry_spark.kernel import cellid as K
    from s2geometry_spark.kernel.fractal import make_regular_points

    pts = make_regular_points(
        np.array([1.0, 1.0, 1.0]) / np.sqrt(3.0), 0.01, 64)
    ids = K.from_point(pts[:, 0], pts[:, 1], pts[:, 2])
    x, y, z = K.to_point(ids)
    snapped = np.stack([x, y, z], -1)
    enc = E.encode_loop_compressed(snapped, 0, 30)
    small = E.encode_loop_compressed(snapped[:8], 0, 30)
    # The 64-vertex loop carries a 33-byte bound; the 8-vertex one doesn't.
    got, depth = E.decode_loop_compressed(E.Decoder(bytes(enc.buf)), 30)
    assert np.array_equal(got, snapped)
    got8, _ = E.decode_loop_compressed(E.Decoder(bytes(small.buf)), 30)
    assert np.array_equal(got8, snapped[:8])


def test_compressed_encoded_polygon_requires_69_bytes():
    """S2Polygon.CompressedEncodedPolygonRequires69Bytes
    (s2polygon_test.cc): the leaf-snapped two-shell polygon encodes to
    exactly 3 polygon bytes + a 29-byte 3-vertex loop + a 37-byte
    4-vertex loop."""
    from s2geometry_spark.kernel.booleans import init_to_snapped
    from s2geometry_spark.kernel.contains import parse_polygon

    poly = parse_polygon("0:0, 0:2, 2:0; 0:0, 0:-2, -2:-2, -2:0")
    snapped = init_to_snapped(poly)
    loops = [(l.vertices, 0) for l in snapped.loops]
    enc = E.encode_polygon(loops)
    assert len(bytes(enc.buf)) == 69
    got = E.decode_polygon(E.Decoder(bytes(enc.buf)))
    assert len(got) == 2


def test_four_vertex_compressed_loop_requires_36_bytes():
    """S2LoopTestBase.FourVertexCompressedLoopRequires36Bytes
    (s2loop_test.cc): snapped_loop_a at kMaxLevel is 1 (nv) + 1
    (origin/bound byte) + 1 (depth) + 1 (faces) + 4x8 (vertices) + 1
    (no unsnapped vertex) = 37 encoder bytes, matching the reference's
    EXPECT_EQ(37, ...)."""
    pts = parse_points("0:178, -1:180, 0:-179, 1:-180")
    ids = K.from_point(pts[:, 0], pts[:, 1], pts[:, 2])
    x, y, z = K.to_point(ids)
    snapped = np.stack([x, y, z], -1)
    enc = E.encode_loop_compressed(snapped, 0, 30)
    assert len(bytes(enc.buf)) == 37
    got, depth = E.decode_loop_compressed(E.Decoder(bytes(enc.buf)), 30)
    assert np.array_equal(got, snapped)
    assert depth == 0
