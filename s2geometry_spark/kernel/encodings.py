"""Lossless (version-1) binary region encodings (s2region encode/decode).

The engine's data plane stores geometry in Parquet columns, but the
reference's wire format is part of its public API surface: every S2Region
implements Encode/Decode with a stable byte layout (s2cap.cc:329-353,
s2cell.cc:322-332, s2cell_union.cc:531-560, s2latlng_rect.cc:361-380,
s2point_region.cc:55-75, s2loop.cc:640-700, s2polygon.cc:787-805,
s2polyline.cc:435-457).  This module reproduces those layouts bit-for-bit
(verified against the version-1 golden hex strings in s2region_test.cc)
so Parquet-resident geometry can round-trip to systems that speak the
reference wire format.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .intervals import R1Interval, S1Interval
from .region import Cap, LatLngRect

LOSSLESS_VERSION = 1


class Encoder:
    """util/coding/coder.h Encoder over a bytearray (little-endian)."""

    def __init__(self) -> None:
        self.buf = bytearray()

    def put8(self, v: int) -> None:
        self.buf.append(v & 0xFF)

    def put32(self, v: int) -> None:
        self.buf += struct.pack("<I", v & 0xFFFFFFFF)

    def put64(self, v: int) -> None:
        self.buf += struct.pack("<Q", v & (2**64 - 1))

    def putdouble(self, v: float) -> None:
        self.buf += struct.pack("<d", v)

    def putn(self, raw: bytes) -> None:
        self.buf += raw

    def put_varint32(self, v: int) -> None:
        v &= 0xFFFFFFFF
        while v >= 0x80:
            self.buf.append((v & 0x7F) | 0x80)
            v >>= 7
        self.buf.append(v)

    def put_varint64(self, v: int) -> None:
        v &= 2**64 - 1
        while v >= 0x80:
            self.buf.append((v & 0x7F) | 0x80)
            v >>= 7
        self.buf.append(v)

    def hex(self) -> str:
        return bytes(self.buf).hex().upper()


class Decoder:
    """util/coding/coder.h Decoder; raises ValueError when truncated."""

    def __init__(self, buf: bytes) -> None:
        self.buf = bytes(buf)
        self.pos = 0

    def avail(self) -> int:
        return len(self.buf) - self.pos

    def _take(self, n: int) -> bytes:
        if self.avail() < n:
            raise ValueError("decoder underrun")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def get8(self) -> int:
        return self._take(1)[0]

    def get32(self) -> int:
        return struct.unpack("<I", self._take(4))[0]

    def get64(self) -> int:
        return struct.unpack("<Q", self._take(8))[0]

    def getdouble(self) -> float:
        return struct.unpack("<d", self._take(8))[0]

    def getn(self, n: int) -> bytes:
        return self._take(n)

    def get_varint32(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.get8()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out & 0xFFFFFFFF
            shift += 7
            if shift > 35:
                raise ValueError("varint32 overflow")

    def get_varint64(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.get8()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out & (2**64 - 1)
            shift += 7
            if shift > 70:
                raise ValueError("varint64 overflow")


# ---------------------------------------------------------------------------
# S2Cap: 4 raw doubles, no version byte (s2cap.cc:329-353)
# ---------------------------------------------------------------------------


def encode_cap(cap: Cap, enc: Encoder | None = None) -> Encoder:
    enc = enc or Encoder()
    enc.putdouble(float(cap.center[0]))
    enc.putdouble(float(cap.center[1]))
    enc.putdouble(float(cap.center[2]))
    enc.putdouble(float(cap.length2))
    return enc


def decode_cap(dec: Decoder) -> Cap:
    x, y, z = dec.getdouble(), dec.getdouble(), dec.getdouble()
    return Cap(np.array([x, y, z]), dec.getdouble())


# ---------------------------------------------------------------------------
# S2CellId / S2Cell: the raw 64-bit id (s2cell_id.h Encode; s2cell.cc:322)
# ---------------------------------------------------------------------------


def encode_cellid(cid: int, enc: Encoder | None = None) -> Encoder:
    enc = enc or Encoder()
    enc.put64(int(cid))
    return enc


def decode_cellid(dec: Decoder) -> int:
    return dec.get64()


# ---------------------------------------------------------------------------
# S2CellUnion: version + uint64 count + ids (s2cell_union.cc:531-560)
# ---------------------------------------------------------------------------


def encode_cell_union(ids, enc: Encoder | None = None) -> Encoder:
    enc = enc or Encoder()
    enc.put8(LOSSLESS_VERSION)
    enc.put64(len(ids))
    for cid in ids:
        enc.put64(int(cid))
    return enc


def decode_cell_union(
    dec: Decoder, max_num_cells: int = 1_000_000
) -> list[int]:
    """Refuses unions above max_num_cells like the reference's
    --s2cell_union_decode_max_num_cells guard (s2cell_union.cc:47,
    544-554)."""
    version = dec.get8()
    if version > LOSSLESS_VERSION:
        raise ValueError(f"unknown S2CellUnion version {version}")
    n = dec.get64()
    if n > max_num_cells:
        raise ValueError(f"cell union too large to decode: {n}")
    return [dec.get64() for _ in range(n)]


# ---------------------------------------------------------------------------
# S2LatLngRect: version + lat.lo, lat.hi, lng.lo, lng.hi
# (s2latlng_rect.cc:361-380)
# ---------------------------------------------------------------------------


def encode_latlng_rect(rect: LatLngRect, enc: Encoder | None = None) -> Encoder:
    enc = enc or Encoder()
    enc.put8(LOSSLESS_VERSION)
    enc.putdouble(rect.lat.lo)
    enc.putdouble(rect.lat.hi)
    enc.putdouble(rect.lng.lo)
    enc.putdouble(rect.lng.hi)
    return enc


def decode_latlng_rect(dec: Decoder) -> LatLngRect:
    version = dec.get8()
    if version > LOSSLESS_VERSION:
        raise ValueError(f"unknown S2LatLngRect version {version}")
    lat_lo, lat_hi = dec.getdouble(), dec.getdouble()
    lng_lo, lng_hi = dec.getdouble(), dec.getdouble()
    return LatLngRect(R1Interval(lat_lo, lat_hi), S1Interval(lng_lo, lng_hi))


# ---------------------------------------------------------------------------
# S2PointRegion: version + 3 doubles (s2point_region.cc:55-75)
# ---------------------------------------------------------------------------


def encode_point_region(p, enc: Encoder | None = None) -> Encoder:
    enc = enc or Encoder()
    enc.put8(LOSSLESS_VERSION)
    p = np.asarray(p, dtype=np.float64)
    for i in range(3):
        enc.putdouble(float(p[i]))
    return enc


def decode_point_region(dec: Decoder) -> np.ndarray:
    """S2PointRegion::Decode (s2point_region.cc): rejects non-unit
    vectors instead of asserting (DecodeNonUnitLength)."""
    version = dec.get8()
    if version > LOSSLESS_VERSION:
        raise ValueError(f"unknown S2PointRegion version {version}")
    p = np.array([dec.getdouble() for _ in range(3)])
    if abs(float(p @ p) - 1.0) > 5e-14:
        raise ValueError("S2PointRegion point is not unit length")
    return p


# ---------------------------------------------------------------------------
# S2Polyline (uncompressed): version + uint32 count + raw vertex doubles
# (s2polyline.cc:435-457)
# ---------------------------------------------------------------------------


def encode_polyline(vertices, enc: Encoder | None = None) -> Encoder:
    enc = enc or Encoder()
    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    enc.put8(LOSSLESS_VERSION)
    enc.put32(len(v))
    enc.putn(v.astype("<f8").tobytes())
    return enc


def decode_polyline(dec: Decoder) -> np.ndarray:
    version = dec.get8()
    if version != LOSSLESS_VERSION:
        raise ValueError(f"unknown S2Polyline version {version}")
    n = dec.get32()
    raw = dec.getn(24 * n)
    return np.frombuffer(raw, dtype="<f8").reshape(-1, 3).copy()


# ---------------------------------------------------------------------------
# S2Loop: version + uint32 nv + vertices + origin_inside + int32 depth +
# rect bound (s2loop.cc:640-700)
# ---------------------------------------------------------------------------


def loop_rect_bound(vertices: np.ndarray) -> LatLngRect:
    """S2Loop::InitBound (s2loop.cc:256-283): empty/full for the
    single-vertex sentinels, else the edge-aware RectBounder over the
    closed chain extended to any contained pole."""
    from .bounder import LatLngRectBounder
    from .contains import Loop

    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    if len(v) == 0:
        # uninitialized loop (s2loop_test.cc EncodeDecodeUninitialized)
        return LatLngRect.empty()
    loop = Loop(v)
    if loop.is_empty_or_full:
        return LatLngRect.full() if loop.is_full else LatLngRect.empty()
    b = LatLngRectBounder()
    for p in v:
        b.add_point(p)
    b.add_point(v[0])
    rect = b.get_bound()
    if bool(loop.contains(np.array([[0.0, 0.0, 1.0]]))[0]):
        rect = LatLngRect(
            R1Interval(rect.lat.lo, 0.5 * math.pi), S1Interval.full()
        )
    if rect.lng.is_full() and bool(
        loop.contains(np.array([[0.0, 0.0, -1.0]]))[0]
    ):
        rect = LatLngRect(R1Interval(-0.5 * math.pi, rect.lat.hi), rect.lng)
    return rect


def encode_loop(vertices, depth: int = 0,
                enc: Encoder | None = None) -> Encoder:
    from .contains import Loop

    enc = enc or Encoder()
    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    loop = Loop(v)
    enc.put8(LOSSLESS_VERSION)
    enc.put32(len(v))
    enc.putn(v.astype("<f8").tobytes())
    enc.put8(1 if loop.origin_inside else 0)
    enc.put32(depth)
    encode_latlng_rect(loop_rect_bound(v), enc)
    return enc


def decode_loop(dec: Decoder) -> tuple[np.ndarray, int]:
    """Returns (vertices, depth); origin_inside and the bound are
    re-derived on decode exactly like DecodeInternal re-checks them."""
    version = dec.get8()
    if version != LOSSLESS_VERSION:
        raise ValueError(f"unknown S2Loop version {version}")
    n = dec.get32()
    raw = dec.getn(24 * n)
    vertices = np.frombuffer(raw, dtype="<f8").reshape(-1, 3).copy()
    dec.get8()  # origin_inside (re-derivable)
    depth = dec.get32()
    decode_latlng_rect(dec)  # bound (re-derivable)
    return vertices, depth


# ---------------------------------------------------------------------------
# S2Polygon (uncompressed, version 1): version + owns_loops + has_holes +
# uint32 num_loops + loops + bound (s2polygon.cc:787-805)
# ---------------------------------------------------------------------------


def encode_polygon_uncompressed(loops, enc: Encoder | None = None) -> Encoder:
    """loops: sequence of (vertices, depth) pairs in polygon order."""
    enc = enc or Encoder()
    enc.put8(LOSSLESS_VERSION)
    enc.put8(1)  # obsolete owns_loops_, always true
    enc.put8(1 if any(depth & 1 for _v, depth in loops) else 0)
    enc.put32(len(loops))
    bound = LatLngRect.empty()
    for v, depth in loops:
        encode_loop(v, depth, enc)
        if depth == 0:
            bound = bound.union(loop_rect_bound(v))
    encode_latlng_rect(bound, enc)
    return enc


def decode_polygon_uncompressed(dec: Decoder) -> list[tuple[np.ndarray, int]]:
    version = dec.get8()
    if version != LOSSLESS_VERSION:
        raise ValueError(f"unknown S2Polygon version {version}")
    dec.get8()  # owns_loops
    dec.get8()  # has_holes
    n = dec.get32()
    loops = [decode_loop(dec) for _ in range(n)]
    decode_latlng_rect(dec)  # bound
    return loops


# ---------------------------------------------------------------------------
# Compressed (version 4) encodings: snap-level point codec
# (s2loop.cc:1377-1443, s2polygon.cc:731-785/1485-1534,
#  s2polyline.cc:477-536)
# ---------------------------------------------------------------------------

COMPRESSED_VERSION = 4  # loops/polygons (s2polygon.cc:111)
POLYLINE_COMPRESSED_VERSION = 2  # s2polyline.cc:76
MAX_CELL_LEVEL = 30
_K_ORIGIN_INSIDE = 1  # CompressedLoopProperty bit 0 (s2loop.cc:96-100)
_K_BOUND_ENCODED = 2  # bit 1
_MIN_VERTICES_FOR_BOUND = 64  # s2loop.cc:1458


def _choose_snap_format(vertices: np.ndarray):
    """The shared histogram heuristic (s2polygon.cc:749-785,
    s2polyline.cc:491-525): snap level = level with most snapped
    vertices (lowest wins ties); compressed iff
    4*nv + 26*num_unsnapped < 24*nv."""
    from .point_compression import xyz_face_siti

    _f, _si, _ti, cell_level = xyz_face_siti(vertices)
    nv = len(vertices)
    histogram = np.zeros(MAX_CELL_LEVEL + 2, dtype=np.int64)
    for lvl in cell_level:
        histogram[int(lvl) + 1] += 1
    snap_level = int(np.argmax(histogram[1:]))
    num_snapped = int(histogram[1:][snap_level])
    exact_point_size = 24 + 2
    compressed_size = 4 * nv + exact_point_size * (nv - num_snapped)
    lossless_size = 24 * nv
    return snap_level, compressed_size < lossless_size


def encode_loop_compressed(vertices, depth: int, snap_level: int,
                           enc: Encoder | None = None) -> Encoder:
    """S2Loop::EncodeCompressed (s2loop.cc:1377-1398)."""
    from .contains import Loop
    from .point_compression import encode_points_compressed

    enc = enc or Encoder()
    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    enc.put_varint32(len(v))
    encode_points_compressed(v, snap_level, enc)
    properties = _K_ORIGIN_INSIDE if Loop(v).origin_inside else 0
    if len(v) >= _MIN_VERTICES_FOR_BOUND:
        properties |= _K_BOUND_ENCODED
    enc.put_varint32(properties)
    enc.put_varint32(depth)
    if properties & _K_BOUND_ENCODED:
        encode_latlng_rect(loop_rect_bound(v), enc)
    return enc


def decode_loop_compressed(dec: Decoder,
                           snap_level: int) -> tuple[np.ndarray, int]:
    """S2Loop::DecodeCompressed (s2loop.cc:1400-1443)."""
    from .point_compression import decode_points_compressed

    nv = dec.get_varint32()
    if nv == 0:
        raise ValueError("compressed loop must have vertices")
    vertices = decode_points_compressed(dec, snap_level, nv)
    properties = dec.get_varint32()
    depth = dec.get_varint32()
    if properties & _K_BOUND_ENCODED:
        decode_latlng_rect(dec)
    return vertices, depth


def encode_polygon_compressed(loops, snap_level: int,
                              enc: Encoder | None = None) -> Encoder:
    """S2Polygon::EncodeCompressed (s2polygon.cc:1485-1503)."""
    enc = enc or Encoder()
    enc.put8(COMPRESSED_VERSION)
    enc.put8(snap_level)
    enc.put_varint32(len(loops))
    for v, depth in loops:
        encode_loop_compressed(v, depth, snap_level, enc)
    return enc


def encode_polygon(loops, enc: Encoder | None = None) -> Encoder:
    """S2Polygon::Encode with the default COMPACT hint
    (s2polygon.cc:731-785): zero vertices -> compressed at the max
    level; otherwise the snap-level histogram picks the format."""
    enc = enc or Encoder()
    loops = [(np.asarray(v, dtype=np.float64).reshape(-1, 3), d)
             for v, d in loops]
    all_vertices = (np.concatenate([v for v, _d in loops])
                    if loops else np.zeros((0, 3)))
    if len(all_vertices) == 0:
        return encode_polygon_compressed(loops, MAX_CELL_LEVEL, enc)
    snap_level, use_compressed = _choose_snap_format(all_vertices)
    if use_compressed:
        return encode_polygon_compressed(loops, snap_level, enc)
    return encode_polygon_uncompressed(loops, enc)


def decode_polygon(dec: Decoder) -> list[tuple[np.ndarray, int]]:
    """S2Polygon::Decode: dispatch on the version byte
    (s2polygon.cc:807-819)."""
    version = dec.buf[dec.pos]
    if version == LOSSLESS_VERSION:
        return decode_polygon_uncompressed(dec)
    if version == COMPRESSED_VERSION:
        dec.get8()
        snap_level = dec.get8()
        if snap_level > MAX_CELL_LEVEL:
            raise ValueError(f"bad snap level {snap_level}")
        n = dec.get_varint32()
        return [decode_loop_compressed(dec, snap_level) for _ in range(n)]
    raise ValueError(f"unknown S2Polygon version {version}")


def encode_polyline_compact(vertices, enc: Encoder | None = None) -> Encoder:
    """S2Polyline::EncodeMostCompact (s2polyline.cc:477-536)."""
    from .point_compression import encode_points_compressed

    enc = enc or Encoder()
    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    if len(v) == 0:
        enc.put8(POLYLINE_COMPRESSED_VERSION)
        enc.put8(MAX_CELL_LEVEL)
        enc.put_varint32(0)
        return enc
    snap_level, use_compressed = _choose_snap_format(v)
    if not use_compressed:
        return encode_polyline(v, enc)
    enc.put8(POLYLINE_COMPRESSED_VERSION)
    enc.put8(snap_level)
    enc.put_varint32(len(v))
    encode_points_compressed(v, snap_level, enc)
    return enc


def decode_polyline_any(dec: Decoder) -> np.ndarray:
    """S2Polyline::Decode: lossless or compressed
    (s2polyline.cc:445-457, 538-560)."""
    from .point_compression import decode_points_compressed

    version = dec.get8()
    if version == LOSSLESS_VERSION:
        n = dec.get32()
        raw = dec.getn(24 * n)
        return np.frombuffer(raw, dtype="<f8").reshape(-1, 3).copy()
    if version == POLYLINE_COMPRESSED_VERSION:
        snap_level = dec.get8()
        if snap_level > MAX_CELL_LEVEL:
            raise ValueError(f"bad snap level {snap_level}")
        n = dec.get_varint32()
        if n == 0:
            return np.zeros((0, 3))
        return decode_points_compressed(dec, snap_level, n)
    raise ValueError(f"unknown S2Polyline version {version}")
