"""Exact MutableS2ShapeIndex build + wire format: QuadraticValidate-style
content checks (mutable_s2shape_index_test.cc:70-150), the reference's
encoded byte sizes (encoded_s2shape_index_test.cc), and the
JavaByteCompatibility golden bytes."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel import coords
from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.clipping import (
    INTERSECTS_RECT_ERROR_UV_DIST,
    clip_to_padded_face,
)
from s2geometry_spark.kernel.encodings import Decoder, Encoder
from s2geometry_spark.kernel.mutable_index import (
    CELL_PADDING,
    MutableIndex,
    _shape_edges,
)
from s2geometry_spark.kernel.shape_index_coding import (
    decode_index_cell,
    decode_shape_index,
    encode_index_cell,
    encode_shape_index,
)
from s2geometry_spark.kernel.shapeutil import (
    LaxPolygon,
    LaxPolyline,
    contains_brute_force,
)


def norm_ref(v) -> np.ndarray:
    """Vector3::Normalize (util/math/vector.h:191-197): multiply by the
    reciprocal, as the reference does — NOT numpy division."""
    v = np.asarray(v, dtype=np.float64)
    n = math.sqrt(float((v * v).sum()))
    return v * (1.0 / n)


def latlng_pts(spec: str) -> np.ndarray:
    pts = []
    for tok in spec.split(","):
        lat, lng = (float(x) for x in tok.strip().split(":"))
        x, y, z = coords.latlng_to_xyz(np.array([lat]), np.array([lng]))
        pts.append([x[0], y[0], z[0]])
    return np.asarray(pts)


def make_regular_loop(center, radius_deg: float, n: int) -> np.ndarray:
    """S2Loop::MakeRegularLoop (s2loop.cc:1466-1491), bit-faithful:
    frame = GetFrame(center); p_i = FromFrame(frame, (r cosθ, r sinθ, z))
    .Normalize() with reciprocal-multiply normalization."""
    from s2geometry_spark.kernel.polyline import _get_frame

    center = norm_ref(center)
    frame = _get_frame(center)
    radius = math.radians(radius_deg)
    r, z = math.sin(radius), math.cos(radius)
    step = 2 * math.pi / n
    out = []
    for i in range(n):
        a = i * step
        p = np.array([r * math.cos(a), r * math.sin(a), z])
        out.append(norm_ref(frame @ p))
    return np.asarray(out)


# ---------------------------------------------------------------------------
# QuadraticValidate (mutable_s2shape_index_test.cc:70-150)
# ---------------------------------------------------------------------------


def quadratic_validate(index: MutableIndex) -> None:
    """Every (cell, shape) pair: the clipped edge set equals the edges
    whose clipped UV segment intersects the cell's padded bound, and
    contains_center matches brute force."""
    cells = index.cells()
    # cells must be disjoint and sorted
    for (a, _), (b, _) in zip(cells, cells[1:]):
        assert a.range_max().id < b.range_min().id
    for cid, clipped in cells:
        cell = Cell(cid)
        face = cid.face()
        pad = CELL_PADDING + INTERSECTS_RECT_ERROR_UV_DIST
        u_lo, u_hi, v_lo, v_hi = cell.get_bound_uv_expanded(pad)
        rect = (u_lo, v_lo, u_hi, v_hi)
        center = cell.get_center()
        by_shape = {sid: (cc, set(eids)) for sid, cc, eids in clipped}
        for shape_id, shape in enumerate(index.shapes):
            if shape is None:
                assert shape_id not in by_shape
                continue
            expect_edges = set()
            for eid, (v0, v1) in enumerate(_shape_edges(shape)):
                seg = clip_to_padded_face(v0, v1, face, CELL_PADDING)
                if seg is None:
                    continue
                (au, av), (bu, bv) = seg
                if _intersects(au, av, bu, bv, rect):
                    expect_edges.add(eid)
            has_interior = getattr(shape, "dim", 2) == 2
            expect_cc = has_interior and contains_brute_force(shape, center)
            got_cc, got_edges = by_shape.get(shape_id, (False, set()))
            assert got_edges == expect_edges, (
                f"cell {cid!r} shape {shape_id}: {got_edges} != {expect_edges}")
            assert got_cc == expect_cc, (
                f"cell {cid!r} shape {shape_id}: contains_center")


def _intersects(au, av, bu, bv, rect) -> bool:
    from s2geometry_spark.kernel.clipping import intersects_rect

    return intersects_rect(np.array([au, av]), np.array([bu, bv]),
                           (rect[0], rect[2], rect[1], rect[3]))


def test_empty_index():
    index = MutableIndex()
    assert index.cells() == []


def test_one_polyline_edge_cells():
    index = MutableIndex()
    index.add(LaxPolyline(latlng_pts("1:1, 2:2")))
    cells = index.cells()
    assert len(cells) == 1
    cid, clipped = cells[0]
    assert clipped == [(0, False, (0,))]
    quadratic_validate(index)


def test_loop_index_contents():
    index = MutableIndex()
    index.add(LaxPolygon([make_regular_loop([3, 2, 1], 20.0, 256)]))
    quadratic_validate(index)
    # a 20-degree 256-gon spans whole cells: some cell must be marked
    # interior (contains_center), including interior-only cells with no
    # edges (the SkipCellRange / tracker path)
    assert any(cc for _, cl in index.cells() for _, cc, _ in cl)
    assert any(cc and not eids
               for _, cl in index.cells() for _, cc, eids in cl)


def test_two_shapes_with_released_slot():
    index = MutableIndex()
    index.add(LaxPolyline(latlng_pts("0:0, 1:1")))
    index.add(LaxPolyline(latlng_pts("1:1, 2:2")))
    index.release(0)
    quadratic_validate(index)
    cells = index.cells()
    assert len(cells) == 1
    assert cells[0][1] == [(1, False, (0,))]


def test_mixed_shapes_validate():
    index = MutableIndex()
    index.add(LaxPolyline(latlng_pts("10:10, 10:20, 20:20")))
    index.add(LaxPolygon([make_regular_loop([1, 0.5, 0.25], 3.0, 32)]))
    index.add(LaxPolyline(latlng_pts("-5:100, 5:120")))
    quadratic_validate(index)


# ---------------------------------------------------------------------------
# Wire format — encoded_s2shape_index_test.cc byte sizes
# ---------------------------------------------------------------------------


def index_bytes(index: MutableIndex, max_edges: int = 10) -> bytes:
    enc = Encoder()
    encode_shape_index(index.cells(), index.num_shape_ids(), enc,
                       max_edges_per_cell=max_edges)
    return bytes(enc.buf)


def roundtrip(index: MutableIndex) -> bytes:
    raw = index_bytes(index)
    max_edges, cells = decode_shape_index(Decoder(raw),
                                          index.num_shape_ids())
    assert max_edges == 10
    assert [(c.id, cl) for c, cl in cells] \
        == [(c.id, cl) for c, cl in index.cells()]
    return raw


def test_encoded_empty():
    # encoded_s2shape_index_test.cc:111-114: 4 bytes
    index = MutableIndex()
    assert len(roundtrip(index)) == 4


def test_encoded_one_edge():
    # encoded_s2shape_index_test.cc:116-120: 8 bytes
    index = MutableIndex()
    index.add(LaxPolyline(latlng_pts("1:1, 2:2")))
    assert len(roundtrip(index)) == 8


@pytest.mark.parametrize(
    "num_edges,expected_bytes",
    [(4, 8), (8, 8), (16, 16), (64, 77), (256, 327), (4096, 8813)],
)
def test_encoded_regular_loops(num_edges, expected_bytes):
    # encoded_s2shape_index_test.cc:122-146 (the 65536-edge case is
    # exercised separately below at a coarser gate for runtime)
    index = MutableIndex()
    index.add(LaxPolygon(
        [make_regular_loop([3, 2, 1], 0.1, num_edges)]))
    assert len(roundtrip(index)) == expected_bytes


@pytest.mark.skipif("not __import__('os').environ.get('S2_SLOW_TESTS')")
def test_encoded_regular_loop_65536():
    # encoded_s2shape_index_test.cc:131: {65536, 168291} — ~40 s in
    # Python (19771 index cells), so gated behind S2_SLOW_TESTS=1;
    # verified green in BASELINE.md's round-5 final-session notes
    index = MutableIndex()
    index.add(LaxPolygon(
        [make_regular_loop([3, 2, 1], 0.1, 65536)]))
    assert len(index_bytes(index)) == 168291


def test_java_byte_compatibility():
    # encoded_s2shape_index_test.cc:365-385: the index portion of the
    # reference's own golden hex (after the two tagged shapes)
    index = MutableIndex()
    index.add(LaxPolyline(latlng_pts("0:0, 1:1")))
    index.add(LaxPolyline(latlng_pts("1:1, 2:2")))
    index.release(0)
    raw = roundtrip(index)
    assert raw.hex().upper() == "28C809010408020010"


def test_index_cell_coding_cases():
    # exercise every branch of S2ShapeIndexCell::Encode/Decode
    cases_single = [
        [(0, False, (3, 4, 5, 6))],          # contiguous range
        [(0, True, (7,))],                   # one edge + center
        [(0, False, ())],                    # general n=0
        [(0, True, (2, 9, 10, 11, 40))],     # general with runs
        [(0, False, tuple(range(5, 25)))],   # range too long for tag 0
    ]
    for clipped in cases_single:
        enc = Encoder()
        encode_index_cell(clipped, 1, enc)
        assert decode_index_cell(1, Decoder(bytes(enc.buf))) == clipped
    cases_multi = [
        [(1, False, (0,))],
        [(0, True, ()), (2, False, (5, 6, 7))],
        [(0, False, (1, 2)), (1, True, ()), (3, True, (0, 8, 9))],
        [(2, True, tuple(range(20)))],
    ]
    for clipped in cases_multi:
        enc = Encoder()
        encode_index_cell(clipped, 4, enc)
        assert decode_index_cell(4, Decoder(bytes(enc.buf))) == clipped


def test_edge_run_coding():
    from s2geometry_spark.kernel.shape_index_coding import (
        _decode_edges,
        _encode_edges,
    )

    for edges in ([0], [5], [0, 1, 2], [3, 17, 18, 19, 20, 99],
                  list(range(30)), [2, 4, 6, 8], [0, 1000000]):
        enc = Encoder()
        _encode_edges(edges, enc)
        assert _decode_edges(len(edges), Decoder(bytes(enc.buf))) == edges
