"""Tagged shape coding (s2shapeutil_coding.cc:49-156): the shape half
of the reference's index snapshot format.

Fast/CompactEncodeTaggedShapes writes an EncodedStringVector with one
entry per shape id — a varint32 type tag followed by that shape's own
encoding (a released/null shape id is an empty string) — and
FullDecodeShapeFactory inverts it.  Combined with
kernel/shape_index_coding.py this reproduces the complete
`CompactEncodeTaggedShapes(index, enc); index.Encode(enc)` byte stream
(encoded_s2shape_index.h:79-95).

Type tags (s2polygon.h:699, s2polyline.h:340, s2point_vector_shape.h:40,
s2lax_polyline_shape.h:45, s2lax_polygon_shape.h:90):
1=S2Polygon::Shape, 2=S2Polyline::Shape, 3=S2PointVectorShape,
4=S2LaxPolylineShape, 5=S2LaxPolygonShape.
"""

from __future__ import annotations

import numpy as np

from .encoded_vectors import (
    EncodedS2PointVector,
    EncodedStringVector,
    EncodedUintVector,
    StringVectorEncoder,
    encode_s2point_vector,
    encode_uint_vector,
)
from .encodings import Decoder, Encoder
from .shapeutil import LaxPolygon, LaxPolyline
from .vector_shapes import PointVectorShape

POLYGON_TAG = 1
POLYLINE_TAG = 2
POINT_VECTOR_TAG = 3
LAX_POLYLINE_TAG = 4
LAX_POLYGON_TAG = 5

LAX_POLYGON_VERSION = 1  # s2lax_polygon_shape.cc:67


class S2PolylineShape:
    """S2Polyline::Shape (tag 2): the heavyweight polyline — its wire
    format is the version-1 region encoding, hint-independent."""

    dim = 1

    def __init__(self, vertices):
        self.vertices = np.asarray(vertices, float).reshape(-1, 3)

    def num_edges(self) -> int:
        return max(0, len(self.vertices) - 1)

    def edge(self, e: int):
        return self.vertices[e], self.vertices[e + 1]


class S2PolygonShape:
    """S2Polygon::Shape (tag 1): loops in (vertices, depth) form; wire
    format is the polygon region encoding (compressed when snapped)."""

    dim = 2

    def __init__(self, loops):
        self.loops = [(np.asarray(v, float).reshape(-1, 3), int(d))
                      for v, d in loops]

    def edges(self):
        for v, _d in self.loops:
            n = len(v)
            for i in range(n):
                yield v[i], v[(i + 1) % n]

    def num_edges(self) -> int:
        return sum(len(v) for v, _ in self.loops)


def _encode_shape(shape, enc: Encoder, hint: str) -> None:
    from . import encodings as E

    if isinstance(shape, S2PolygonShape):
        enc.put_varint32(POLYGON_TAG)
        E.encode_polygon([(v, d) for v, d in shape.loops], enc)
    elif isinstance(shape, S2PolylineShape):
        enc.put_varint32(POLYLINE_TAG)
        E.encode_polyline(shape.vertices, enc)
    elif isinstance(shape, PointVectorShape):
        enc.put_varint32(POINT_VECTOR_TAG)
        encode_s2point_vector(shape.points, enc, hint=hint)
    elif isinstance(shape, LaxPolyline):
        enc.put_varint32(LAX_POLYLINE_TAG)
        encode_s2point_vector(shape.vertices, enc, hint=hint)
    elif isinstance(shape, LaxPolygon):
        enc.put_varint32(LAX_POLYGON_TAG)
        enc.put8(LAX_POLYGON_VERSION)
        enc.put_varint32(len(shape.loops))
        vertices = (np.vstack(shape.loops) if shape.loops
                    else np.zeros((0, 3)))
        encode_s2point_vector(vertices, enc, hint=hint)
        if len(shape.loops) > 1:
            starts = np.cumsum([0] + [len(l) for l in shape.loops])
            encode_uint_vector([int(s) for s in starts], 4, enc)
    else:
        raise ValueError(f"unsupported shape type: {type(shape).__name__}")


def encode_tagged_shapes(shapes, enc: Encoder, hint: str = "compact") -> None:
    """Fast/CompactEncodeTaggedShapes (s2shapeutil_coding.cc:135-156):
    one string per shape id; None encodes as zero bytes."""
    sv = StringVectorEncoder()
    for shape in shapes:
        sub = sv.add_via_encoder()
        if shape is None:
            continue
        _encode_shape(shape, sub, hint)
    sv.encode(enc)


def _decode_shape(tag: int, dec: Decoder):
    from . import encodings as E

    if tag == POLYGON_TAG:
        return S2PolygonShape(E.decode_polygon(dec))
    if tag == POLYLINE_TAG:
        return S2PolylineShape(E.decode_polyline_any(dec))
    if tag == POINT_VECTOR_TAG:
        pv = EncodedS2PointVector()
        if not pv.init(dec):
            raise ValueError("bad point vector")
        return PointVectorShape(pv.decode())
    if tag == LAX_POLYLINE_TAG:
        pv = EncodedS2PointVector()
        if not pv.init(dec):
            raise ValueError("bad lax polyline")
        return LaxPolyline(pv.decode())
    if tag == LAX_POLYGON_TAG:
        return decode_lax_polygon(dec)
    raise ValueError(f"unsupported shape tag {tag}")


def decode_lax_polygon(dec: Decoder):
    """S2LaxPolygonShape::Init (s2lax_polygon_shape.cc Decode): version
    byte, varint loop count, encoded point vector, loop offsets.  Every
    malformed prefix raises ValueError with a reason, mirroring the
    reference's S2Error messages (the s2lax_polygon_shape_test.cc
    Bad* decode-guard suite)."""
    try:
        version = dec.get8()
    except Exception:
        raise ValueError("Insufficient data to decode version")
    if version != LAX_POLYGON_VERSION:
        raise ValueError(f"Bad version number: {version}")
    try:
        num_loops = dec.get_varint32()
    except Exception:
        raise ValueError("Failed to decode number of loops")
    pv = EncodedS2PointVector()
    try:
        ok = pv.init(dec)
    except Exception:
        ok = False
    if not ok:
        raise ValueError("Failed to decode vertices")
    try:
        vertices = pv.decode().reshape(-1, 3)
    except Exception as e:
        raise ValueError(f"Failed to decode vertices: {e}")
    if num_loops == 0:
        return LaxPolygon([])
    if num_loops == 1:
        return LaxPolygon([vertices])
    starts = EncodedUintVector()
    try:
        ok = starts.init(dec, 4)
    except Exception:
        ok = False
    if not ok:
        raise ValueError("Failed to decode loop offsets")
    s = starts.decode()
    if len(s) < num_loops + 1 or int(s[-1]) > len(vertices):
        raise ValueError("Failed to decode loop offsets")
    return LaxPolygon(
        [vertices[s[i]:s[i + 1]] for i in range(num_loops)])


def decode_tagged_shapes(dec: Decoder) -> list:
    """FullDecodeShapeFactory (s2shapeutil_coding.cc:158-176)."""
    sv = EncodedStringVector()
    if not sv.init(dec):
        raise ValueError("corrupted encoded shapes")
    shapes = []
    for i in range(len(sv)):
        raw = sv[i]
        if not raw:
            shapes.append(None)
            continue
        sub = Decoder(raw)
        tag = sub.get_varint32()
        shapes.append(_decode_shape(tag, sub))
    return shapes


def encode_index_snapshot(index, enc: Encoder, hint: str = "compact",
                          max_edges_per_cell: int = 10) -> None:
    """The complete snapshot byte stream (encoded_s2shape_index.h:79-84):
    CompactEncodeTaggedShapes(index, enc); index.Encode(enc)."""
    from .shape_index_coding import encode_shape_index

    encode_tagged_shapes(index.shapes, enc, hint=hint)
    encode_shape_index(index.cells(), index.num_shape_ids(), enc,
                       max_edges_per_cell=max_edges_per_cell)


def decode_index_snapshot(dec: Decoder):
    """Inverts encode_index_snapshot: returns (shapes, max_edges, cells)."""
    from .shape_index_coding import decode_shape_index

    shapes = decode_tagged_shapes(dec)
    max_edges, cells = decode_shape_index(dec, len(shapes))
    return shapes, max_edges, cells
