"""s2polyline_test.cc closing tranche: Intersects family,
SubsampleVertices, and the compressed encoding surface.

(The reference's copy/move-construction and SpaceUsed tests are C++
object-semantics checks with no Python counterpart and are not
ported.)
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.encodings import (
    Decoder,
    Encoder,
    decode_polyline_any,
    encode_polyline,
    encode_polyline_compact,
)
from s2geometry_spark.kernel.polyline import (
    approx_equals,
    polylines_intersect,
    subsample_vertices,
)


def _pl(s):
    if not s.strip():
        return np.zeros((0, 3))
    return parse_points(s)


# --- Intersects family (cc:376-420) ----------------------------------------


def test_intersects_empty_polyline():
    assert not polylines_intersect(np.zeros((0, 3)), _pl("1:1, 4:4"))


def test_intersects_one_point_polyline():
    assert not polylines_intersect(_pl("1:1, 4:4"), _pl("1:1"))


def test_intersects():
    line1 = _pl("1:1, 4:4")
    assert polylines_intersect(line1, _pl("1:2, 2:1"))
    assert not polylines_intersect(line1, _pl("1:2, 2:3"))
    assert polylines_intersect(line1, _pl("1:2, 2:3, 4:3"))


def test_intersects_at_vertex():
    line1 = _pl("1:1, 4:4, 4:6")
    assert polylines_intersect(line1, _pl("1:1, 1:2"))
    assert polylines_intersect(line1, _pl("5:1, 4:4, 2:2"))


def test_intersects_vertex_on_edge():
    h_lr = _pl("0:1, 0:3")
    v_bt = _pl("-1:2, 0:2, 1:2")
    h_rl = _pl("0:3, 0:1")
    v_tb = _pl("1:2, 0:2, -1:2")
    assert polylines_intersect(h_lr, v_bt)
    assert polylines_intersect(h_lr, v_tb)
    assert polylines_intersect(h_rl, v_bt)
    assert polylines_intersect(h_rl, v_tb)


# --- SubsampleVertices (cc:442-506) ----------------------------------------


def _check_subsample(polyline_str, tolerance_degrees, expected):
    v = _pl(polyline_str)
    idx = subsample_vertices(v, np.radians(tolerance_degrees))
    got = ",".join(str(i) for i in idx)
    assert got == expected, (polyline_str, tolerance_degrees, got)


def test_subsample_vertices_trivial_inputs():
    _check_subsample("", 1.0, "")
    _check_subsample("0:1", 1.0, "0")
    _check_subsample("10:10, 11:11", 5.0, "0,1")
    _check_subsample("-1:0, 0:0, 1:0", 1e-15, "0,2")
    _check_subsample("-1:0, 0:0, 1:1", 0.0, "0,1,2")
    _check_subsample("-1:0, 0:0, 1:1", -1.0, "0,1,2")
    _check_subsample("0:1, 0:2, 0:3, 0:4, 0:5", 1.0, "0,4")
    # invalid polyline with adjacent duplicate vertices
    _check_subsample("0:1, 0:1, 0:1, 0:2", 0.0, "0,3")


def test_subsample_vertices_simple_example():
    s = "0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4"
    _check_subsample(s, 3.0, "0,9")
    _check_subsample(s, 2.0, "0,6,9")
    _check_subsample(s, 0.9, "0,2,6,9")
    _check_subsample(s, 0.4, "0,1,2,3,4,6,9")
    _check_subsample(s, 0, "0,1,2,3,4,5,6,7,8,9")


def test_subsample_vertices_guarantees():
    _check_subsample("10:10, 12:12, 10:10", 5.0, "0")
    _check_subsample("0:0, 1:1, 0:0, 0:120, 0:130", 5.0, "0,3,4")
    _check_subsample(
        "90:0, 50:180, 20:180, -20:180, -50:180, -90:0, 30:0, 90:0",
        5.0, "0,2,4,5,6,7",
    )
    _check_subsample("10:10, 10:20, 10:30, 10:15, 10:40", 5.0, "0,2,3,4")
    _check_subsample(
        "10:10, 10:20, 10:30, 10:10, 10:30, 10:40", 5.0, "0,2,3,5"
    )
    _check_subsample("10:10, 12:12, 9:9, 10:20, 10:30", 5.0, "0,4")


# --- Encoding surface (cc:559-631) -----------------------------------------


def test_encode_decode():
    v = _pl("0:0, 0:10, 10:20, 20:30")
    enc = encode_polyline(v)
    got = decode_polyline_any(Decoder(bytes(enc.buf)))
    assert approx_equals(got, v, 0.0)


def test_encode_decode_compressed():
    v = _pl("0:0, 0:10, 10:20, 20:30")
    compact = encode_polyline_compact(v)
    uncompressed = encode_polyline(v)
    assert len(bytes(compact.buf)) < len(bytes(uncompressed.buf))
    got = decode_polyline_any(Decoder(bytes(compact.buf)))
    assert approx_equals(got, v, np.radians(1e-7))


def test_encode_most_compact_empty():
    enc = encode_polyline_compact(np.zeros((0, 3)))
    got = decode_polyline_any(Decoder(bytes(enc.buf)))
    assert len(got) == 0


def test_encode_uncompressed_empty():
    enc = encode_polyline(np.zeros((0, 3)))
    got = decode_polyline_any(Decoder(bytes(enc.buf)))
    assert len(got) == 0


def test_decode_compressed_bad_data():
    with pytest.raises(Exception):
        decode_polyline_any(Decoder(b"bad data"))


def test_decode_compressed_max_cell_level():
    # version 2, level 30 (kMaxCellLevel), count 0
    data = bytes([2, 30, 0, 0, 0, 0])
    got = decode_polyline_any(Decoder(data))
    assert len(got) == 0


def test_decode_compressed_cell_level_too_high():
    data = bytes([2, 31, 0, 0, 0, 0])
    with pytest.raises(Exception):
        decode_polyline_any(Decoder(data))
