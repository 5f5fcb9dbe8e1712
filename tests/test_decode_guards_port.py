"""Decode-robustness guard ports: the s2lax_polygon_shape_test.cc Bad*
suite (cc:500-545), S2PointRegion DecodeUnitLength / DecodeNonUnitLength
(s2point_region_test.cc:69-98), and
MutableS2ShapeIndex.DecoderCatchesInvalidIndex
(mutable_s2shape_index_test.cc) — every malformed prefix must be
rejected with a reason, never crash or silently succeed."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.encodings import (
    Decoder,
    Encoder,
    decode_point_region,
)
from s2geometry_spark.kernel.tagged_shapes import decode_lax_polygon


def _decode_lax(data: bytes) -> str:
    """DecodeS2LaxPolygonShape (test.cc:500-511): returns the error
    message, or "" on success."""
    try:
        decode_lax_polygon(Decoder(data))
        return ""
    except ValueError as e:
        return str(e)


def test_insufficient_data_in_encoder():
    assert "Insufficient data" in _decode_lax(b"")


def test_bad_version_number():
    assert "Bad version number" in _decode_lax(b"\xfb")


def test_bad_loop_number():
    assert "number of loops" in _decode_lax(b"\x01")


def test_bad_vertices_init():
    assert "decode vertices" in _decode_lax(b"\x01\x03")


def test_bad_vertices():
    blob = (b"\x014\xd9\x97\xf0\xf0."
            b"\x08\x08\x08\x08\x08\x08\x08\x08\x08\x08\x08\x00\x08\x08"
            b"\xf0\xf0\xf0\xf0\xf0\xf0\xf0\xf0\xf0\xf0\xf0\xf0\xf0\x00"
            b"\xa9\x11\x11\x0c")
    assert len(blob) == 39
    assert _decode_lax(blob) != ""


def test_bad_loop_offsets():
    assert "loop offsets" in _decode_lax(b"\x01\x95\xa3C\x00\xfb")


def test_point_region_decode_unit_length():
    """DecodeUnitLength: a unit vector decodes fine."""
    enc = Encoder()
    enc.put8(1)
    for v in (1.0, 0.0, 0.0):
        enc.putdouble(v)
    got = decode_point_region(Decoder(bytes(enc.buf)))
    assert np.array_equal(got, np.array([1.0, 0.0, 0.0]))


def test_point_region_decode_non_unit_length():
    """DecodeNonUnitLength: (1,1,1) must be rejected, not asserted."""
    enc = Encoder()
    enc.put8(1)
    for v in (1.0, 1.0, 1.0):
        enc.putdouble(v)
    with pytest.raises(ValueError):
        decode_point_region(Decoder(bytes(enc.buf)))


def test_decoder_catches_invalid_index():
    """DecoderCatchesInvalidIndex: an index snapshot advertising one
    face cell but encoding no shapes must fail to decode."""
    from s2geometry_spark.kernel.tagged_shapes import decode_index_snapshot

    encoded = b"E\x00P\xe0\x08\x10\x00"
    with pytest.raises(Exception):
        decode_index_snapshot(Decoder(encoded))
