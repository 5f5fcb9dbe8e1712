"""Lazily-decodable encoded vectors — the s2coding wire formats.

Re-derivations (same byte streams, array/Python form) of:

- EncodedUintVector        (encoded_uint_vector.h:189-226)
- EncodedStringVector      (encoded_string_vector.cc:39-96)
- EncodedS2CellIdVector    (encoded_s2cell_id_vector.cc:37-150)
- EncodedS2PointVector     (encoded_s2point_vector.cc:106-258 UNCOMPRESSED,
                            encoded_s2point_vector.cc:263-560 CELL_IDS)

These are the reference's zero-copy on-demand containers.  In this engine
the COLUMNAR path is Parquet (the lake's encoding); these classes exist
for wire-format parity — interchange with systems that speak the
reference's encoded blobs (e.g. S2 shape-index snapshots), gated byte-for-
byte by the reference's own expected-size fixtures.

All byte streams are little-endian.  Values are plain Python ints masked
to 64 bits; points are float64 triples encoded as raw IEEE doubles.
"""

from __future__ import annotations

import struct

import numpy as np

from .encodings import Encoder, Decoder

_MASK64 = (1 << 64) - 1
MAX_LEVEL = 30

# ---------------------------------------------------------------------------
# Fixed-length little-endian uints (encoded_uint_vector.h:107-136)
# ---------------------------------------------------------------------------


def encode_uint_with_length(value: int, length: int, enc: Encoder) -> None:
    """EncodeUintWithLength (encoded_uint_vector.h:141-154): `length`
    little-endian bytes; REQUIRES value < 256**length."""
    v = value & _MASK64
    for _ in range(length):
        enc.put8(v & 0xFF)
        v >>= 8
    if v:
        raise ValueError("value does not fit in length bytes")


def get_uint_with_length(buf: bytes, offset: int, length: int) -> int:
    """GetUintWithLength (encoded_uint_vector.h:156-193)."""
    return int.from_bytes(buf[offset:offset + length], "little")


# ---------------------------------------------------------------------------
# EncodedUintVector (encoded_uint_vector.h:195-318)
# ---------------------------------------------------------------------------


def encode_uint_vector(values, sizeof_t: int, enc: Encoder) -> None:
    """EncodeUintVector (encoded_uint_vector.h:205-226).

    Format: varint64 of ``(n * sizeof_t) | (len - 1)`` followed by n
    values of `len` bytes each, where `len` is the byte width of the
    largest value (>= 1).  `sizeof_t` in {2, 4, 8} mirrors the C++
    template parameter — it scales the size field so the decoder can
    recover both n and len from one varint.
    """
    if sizeof_t not in (2, 4, 8):
        raise ValueError("sizeof_t must be 2, 4, or 8")
    one_bits = 1
    for x in values:
        one_bits |= int(x) & _MASK64
    length = ((one_bits.bit_length() - 1) >> 3) + 1
    if length > sizeof_t:
        raise ValueError("value wider than sizeof_t")
    enc.put_varint64((len(values) * sizeof_t) | (length - 1))
    for x in values:
        encode_uint_with_length(int(x) & _MASK64, length, enc)


class EncodedUintVector:
    """EncodedUintVector<T> (encoded_uint_vector.h:50-104): constant-time
    init over an encoded buffer; elements decoded on access."""

    def __init__(self) -> None:
        self._data = b""
        self._n = 0
        self._len = 1
        self._sizeof = 8

    def init(self, dec: Decoder, sizeof_t: int) -> bool:
        """Init (encoded_uint_vector.h:229-240). Returns False on error."""
        if sizeof_t not in (2, 4, 8):
            raise ValueError("sizeof_t must be 2, 4, or 8")
        try:
            size_len = dec.get_varint64()
        except ValueError:
            return False
        self._sizeof = sizeof_t
        self._n = size_len // sizeof_t
        self._len = (size_len & (sizeof_t - 1)) + 1
        nbytes = self._n * self._len
        if dec.avail() < nbytes:
            return False
        self._data = dec.getn(nbytes)
        return True

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> int:
        if not 0 <= i < self._n:
            raise IndexError(i)
        return get_uint_with_length(self._data, i * self._len, self._len)

    def lower_bound(self, target: int) -> int:
        """First index with value >= target (encoded_uint_vector.h:284-297);
        REQUIRES non-decreasing elements."""
        lo, hi = 0, self._n
        while lo < hi:
            mid = (lo + hi) >> 1
            if self[mid] < target:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def decode(self) -> list[int]:
        return [self[i] for i in range(self._n)]

    def encode(self, enc: Encoder) -> None:
        """Re-encode (encoded_uint_vector.h:308-316) — byte-identical."""
        enc.put_varint64((self._n * self._sizeof) | (self._len - 1))
        enc.putn(self._data)


# ---------------------------------------------------------------------------
# EncodedStringVector (encoded_string_vector.cc:39-96)
# ---------------------------------------------------------------------------


class StringVectorEncoder:
    """StringVectorEncoder (encoded_string_vector.h:46-77): accumulates
    strings, then writes offsets (EncodedUintVector<u64>, first implicit
    zero dropped) followed by the concatenated data."""

    def __init__(self) -> None:
        self._data = Encoder()
        self._offsets: list[int] = []

    def add(self, s: bytes | str) -> None:
        if isinstance(s, str):
            s = s.encode()
        self._offsets.append(len(self._data.buf))
        self._data.putn(s)

    def add_via_encoder(self) -> Encoder:
        """AddViaEncoder: the next string is whatever the caller appends
        to the returned (shared) encoder before the next call here."""
        self._offsets.append(len(self._data.buf))
        return self._data

    def encode(self, enc: Encoder) -> None:
        # offsets_[i] holds the START of string i; Encode appends the end
        # sentinel and drops the always-zero first entry, so what's written
        # is the END offset of each string (strings are contiguous)
        ends = self._offsets[1:] + [len(self._data.buf)] \
            if self._offsets else []
        encode_uint_vector(ends, 8, enc)
        enc.putn(bytes(self._data.buf))

    @staticmethod
    def encode_all(strings, enc: Encoder) -> None:
        sv = StringVectorEncoder()
        for s in strings:
            sv.add(s)
        sv.encode(enc)


class EncodedStringVector:
    """EncodedStringVector (encoded_string_vector.cc:57-96)."""

    def __init__(self) -> None:
        self._offsets = EncodedUintVector()
        self._data = b""

    def init(self, dec: Decoder) -> bool:
        if not self._offsets.init(dec, 8):
            return False
        if len(self._offsets) > 0:
            length = self._offsets[len(self._offsets) - 1]
            if dec.avail() < length:
                return False
            self._data = dec.getn(length)
        else:
            self._data = b""
        return True

    def __len__(self) -> int:
        return len(self._offsets)

    def __getitem__(self, i: int) -> bytes:
        start = self._offsets[i - 1] if i > 0 else 0
        limit = self._offsets[i]
        if start <= limit <= len(self._data):
            return self._data[start:limit]
        return b""

    def decode(self) -> list[bytes]:
        return [self[i] for i in range(len(self))]

    def encode(self, enc: Encoder) -> None:
        self._offsets.encode(enc)
        enc.putn(self._data)


# ---------------------------------------------------------------------------
# EncodedS2CellIdVector (encoded_s2cell_id_vector.cc:37-150)
# ---------------------------------------------------------------------------


def _encode_base_shift(enc: Encoder, shift: int, base: int,
                       base_len: int) -> None:
    """EncodeBaseShift (encoded_s2cell_id_vector.cc:37-59)."""
    shift_code = shift >> 1
    if shift & 1:
        shift_code = min(31, shift_code + 29)
    enc.put8((shift_code << 3) | base_len)
    if shift_code == 31:
        enc.put8(shift >> 1)
    base_bytes = (base & _MASK64) >> (64 - 8 * max(1, base_len))
    encode_uint_with_length(base_bytes, base_len, enc)


def encode_s2cellid_vector(ids, enc: Encoder) -> None:
    """EncodeS2CellIdVector (encoded_s2cell_id_vector.cc:61-150):
    v[i] = base + (deltas[i] << shift); base is 0-7 MSBs of the minimum
    id, shift strips the trailing zeros common to all ids (odd shift ⇔
    all ids at one level), deltas are an EncodedUintVector<u64>."""
    ids = [int(c) & _MASK64 for c in ids]
    v_or, v_and, v_min, v_max = 0, _MASK64, _MASK64, 0
    for c in ids:
        v_or |= c
        v_and &= c
        v_min = min(v_min, c)
        v_max = max(v_max, c)

    e_base, e_base_len, e_shift, e_max_delta_msb = 0, 0, 0, 0
    if v_or > 0:
        # countr_zero(v_or) & ~1, capped at 56
        tz = (v_or & -v_or).bit_length() - 1
        e_shift = min(56, tz & ~1)
        if v_and & (1 << e_shift):
            e_shift += 1  # all ids at the same level
        e_bytes = _MASK64
        for blen in range(8):
            t_base = v_min & ~(_MASK64 >> (8 * blen)) if blen else 0
            t_max_delta_msb = max(
                0, ((v_max - t_base) >> e_shift).bit_length() - 1)
            t_bytes = blen + len(ids) * ((t_max_delta_msb >> 3) + 1)
            if t_bytes < e_bytes:
                e_base, e_base_len = t_base, blen
                e_max_delta_msb, e_bytes = t_max_delta_msb, t_bytes
        if (e_shift & 1) and (e_max_delta_msb & 7) != 7:
            e_shift -= 1

    _encode_base_shift(enc, e_shift, e_base, e_base_len)
    encode_uint_vector([(c - e_base) >> e_shift for c in ids], 8, enc)


class EncodedS2CellIdVector:
    """EncodedS2CellIdVector (encoded_s2cell_id_vector.h:56-120):
    values decode as (base + (deltas[i] << shift))."""

    def __init__(self) -> None:
        self._deltas = EncodedUintVector()
        self._base = 0
        self._shift = 0
        self._base_len = 0

    def init(self, dec: Decoder) -> bool:
        if dec.avail() < 2:
            return False
        code_plus_len = dec.get8()
        shift_code = code_plus_len >> 3
        if shift_code == 31:
            shift_code = 29 + dec.get8()
            if shift_code > 56:
                return False
        self._base_len = code_plus_len & 7
        if dec.avail() < self._base_len:
            return False
        base = get_uint_with_length(dec.getn(self._base_len), 0,
                                    self._base_len)
        base = (base << (64 - 8 * max(1, self._base_len))) & _MASK64
        if shift_code >= 29:
            self._shift = 2 * (shift_code - 29) + 1
            base |= 1 << (self._shift - 1)
        else:
            self._shift = 2 * shift_code
        self._base = base
        return self._deltas.init(dec, 8)

    def __len__(self) -> int:
        return len(self._deltas)

    def __getitem__(self, i: int) -> int:
        return ((self._deltas[i] << self._shift) + self._base) & _MASK64

    def lower_bound(self, target: int) -> int:
        """encoded_s2cell_id_vector.h:104-116: seek in delta space with
        round-up shifting; REQUIRES sorted ids."""
        target &= _MASK64
        if target <= self._base:
            return 0
        # End(kMaxLevel).id() == 0xC000000000000001 (FromFace(5).child_end(30))
        if target >= 0xC000000000000001:
            return len(self)
        return self._deltas.lower_bound(
            (target - self._base + (1 << self._shift) - 1) >> self._shift)

    def decode(self) -> list[int]:
        return [self[i] for i in range(len(self))]

    def encode(self, enc: Encoder) -> None:
        _encode_base_shift(enc, self._shift, self._base, self._base_len)
        self._deltas.encode(enc)


# ---------------------------------------------------------------------------
# EncodedS2PointVector (encoded_s2point_vector.cc)
# ---------------------------------------------------------------------------

UNCOMPRESSED = 0
CELL_IDS = 1
_FORMAT_BITS = 3
_BLOCK_SHIFT = 4
_BLOCK_SIZE = 1 << _BLOCK_SHIFT  # 16 values/block (s2point_vector.cc:282)
_EXCEPTION = _MASK64


def interleave_bit_pairs(v0: int, v1: int) -> int:
    """InterleaveUint32BitPairs (encoded_s2point_vector.cc:53-66)."""
    a, b = v0 & 0xFFFFFFFF, v1 & 0xFFFFFFFF
    for sh, m in ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                  (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333)):
        a = (a | (a << sh)) & m
        b = (b | (b << sh)) & m
    return (a | (b << 2)) & _MASK64


def deinterleave_bit_pairs(code: int) -> tuple[int, int]:
    """DeinterleaveUint32BitPairs (encoded_s2point_vector.cc:71-93)."""
    out = []
    for v in (code & _MASK64, (code >> 2) & _MASK64):
        for sh, m in ((2, 0x3333333333333333), (4, 0x0F0F0F0F0F0F0F0F),
                      (8, 0x00FF00FF00FF00FF), (16, 0x0000FFFF0000FFFF)):
            v &= m
            v |= v >> sh
        out.append(v & 0xFFFFFFFF)
    return out[0], out[1]


def _bit_mask(n: int) -> int:
    return 0 if n == 0 else _MASK64 >> (64 - n)


def _max_bits_for_level(level: int) -> int:
    return 2 * level + 3


def _base_shift(level: int, base_bits: int) -> int:
    return max(0, _max_bits_for_level(level) - base_bits)


def _pack_points(points: np.ndarray) -> bytes:
    return np.ascontiguousarray(
        np.asarray(points, dtype="<f8").reshape(-1, 3)).tobytes()


def encode_s2point_vector_fast(points, enc: Encoder) -> None:
    """EncodeS2PointVectorFast (encoded_s2point_vector.cc:209-230):
    varint64 header (size << 3 | UNCOMPRESSED) + raw LE doubles."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    enc.put_varint64((len(pts) << _FORMAT_BITS) | UNCOMPRESSED)
    enc.putn(_pack_points(pts))


def _choose_best_level(points: np.ndarray) -> tuple[int, list]:
    """ChooseBestLevel (encoded_s2point_vector.cc:593-632)."""
    from . import coords as C

    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    if len(pts) == 0:
        return -1, []
    face, si, ti, level = C.xyz_to_face_siti(pts[:, 0], pts[:, 1], pts[:, 2])
    cell_points = list(zip(level.tolist(), face.tolist(),
                           si.astype(np.uint32).tolist(),
                           ti.astype(np.uint32).tolist()))
    counts = np.zeros(MAX_LEVEL + 1, dtype=np.int64)
    for lv, *_ in cell_points:
        if lv >= 0:
            counts[lv] += 1
    best_level = int(np.argmax(counts))  # ties -> smallest level
    if counts[best_level] <= 0.05 * len(pts):
        return -1, cell_points
    return best_level, cell_points


def _convert_cells_to_values(cell_points, level: int) -> tuple[list[int], bool]:
    """ConvertCellsToValues (encoded_s2point_vector.cc:639-668)."""
    values: list[int] = []
    have_exceptions = False
    shift = MAX_LEVEL - level
    for lv, face, si, ti in cell_points:
        if lv != level:
            values.append(_EXCEPTION)
            have_exceptions = True
        else:
            sj = ((((face & 3) << 30) | (si >> 1)) >> shift) & 0xFFFFFFFF
            tj = ((((face & 4) << 29) | ti) >> (shift + 1)) & 0xFFFFFFFF
            values.append(interleave_bit_pairs(sj, tj))
    return values, have_exceptions


def _choose_base(values, level: int, have_exceptions: bool) -> tuple[int, int]:
    """ChooseBase (encoded_s2point_vector.cc:670-717): shared bit prefix
    of min/max, clamped to 56 encodable bits; returns (base, base_bits)."""
    v_min, v_max = _EXCEPTION, 0
    for v in values:
        if v != _EXCEPTION:
            v_min = min(v_min, v)
            v_max = max(v_max, v)
    if v_min == _EXCEPTION:
        return 0, 0
    min_delta_bits = 8 if (have_exceptions or len(values) == 1) else 4
    excluded_bits = max((v_min ^ v_max).bit_length(),
                        min_delta_bits, _base_shift(level, 56))
    base = v_min & ~_bit_mask(excluded_bits)
    if base == 0:
        base_bits = 0
    else:
        low_bit = (base & -base).bit_length() - 1
        base_bits = (_max_bits_for_level(level) - low_bit + 7) & ~7
    return v_min & ~_bit_mask(_base_shift(level, base_bits)), base_bits


def _can_encode(d_min: int, d_max: int, delta_bits: int, overlap_bits: int,
                have_exceptions: bool) -> bool:
    """CanEncode (encoded_s2point_vector.cc:721-735)."""
    d_min &= ~_bit_mask(delta_bits - overlap_bits)
    max_delta = _bit_mask(delta_bits)
    if have_exceptions:
        if max_delta < _BLOCK_SIZE:
            return False
        max_delta -= _BLOCK_SIZE
    return d_min > (~max_delta & _MASK64) or d_min + max_delta >= d_max


def _get_block_code(values, base: int,
                    have_exceptions: bool) -> tuple[int, int, int]:
    """GetBlockCode (encoded_s2point_vector.cc:741-824): returns
    (delta_bits, offset_bits, overlap_bits) for one block."""
    b_min, b_max = _EXCEPTION, 0
    for v in values:
        if v != _EXCEPTION:
            b_min = min(b_min, v)
            b_max = max(b_max, v)
    if b_min == _EXCEPTION:
        return 4, 0, 0  # all-exceptions block
    b_min -= base
    b_max -= base

    delta_bits = (max(1, (b_max - b_min).bit_length() - 1) + 3) & ~3
    overlap_bits = 0
    if not _can_encode(b_min, b_max, delta_bits, 0, have_exceptions):
        if _can_encode(b_min, b_max, delta_bits, 4, have_exceptions):
            overlap_bits = 4
        else:
            delta_bits += 4
            if not _can_encode(b_min, b_max, delta_bits, 0, have_exceptions):
                overlap_bits = 4

    if len(values) == 1 and not have_exceptions:
        delta_bits = 8  # single-value block would waste 4 bits

    max_delta = _bit_mask(delta_bits) - (_BLOCK_SIZE if have_exceptions else 0)
    offset_bits = 0
    if b_max > max_delta:
        offset_shift = delta_bits - overlap_bits
        mask = _bit_mask(offset_shift)
        min_offset = (b_max - max_delta + mask) & ~mask
        offset_bits = (min_offset.bit_length() - offset_shift + 7) & ~7
        if offset_bits == 64:
            overlap_bits = 4
    return delta_bits, offset_bits, overlap_bits


def encode_s2point_vector_compact(points, enc: Encoder) -> None:
    """EncodeS2PointVectorCompact (encoded_s2point_vector.cc:324-590):
    points snapped to one S2CellId level are (sj,tj)-bit-pair-interleaved
    into 64-bit values and encoded per 16-value block as
    base + offset[block] + delta; non-encodable points ride along as raw
    24-byte exceptions indexed by reserved low deltas."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    level, cell_points = _choose_best_level(pts)
    if level < 0:
        encode_s2point_vector_fast(pts, enc)
        return

    values, have_exceptions = _convert_cells_to_values(cell_points, level)
    base, base_bits = _choose_base(values, level, have_exceptions)

    num_blocks = (len(values) + _BLOCK_SIZE - 1) >> _BLOCK_SHIFT
    base_bytes = base_bits >> 3
    last_block_count = len(values) - _BLOCK_SIZE * (num_blocks - 1)
    enc.put8(CELL_IDS | (int(have_exceptions) << 3)
             | ((last_block_count - 1) << 4))
    enc.put8(base_bytes | (level << 3))
    encode_uint_with_length(base >> _base_shift(level, base_bits),
                            base_bytes, enc)

    blocks = StringVectorEncoder()
    for i in range(0, len(values), _BLOCK_SIZE):
        block_vals = values[i:i + _BLOCK_SIZE]
        delta_bits, offset_bits, overlap_bits = _get_block_code(
            block_vals, base, have_exceptions)

        block = blocks.add_via_encoder()
        offset_bytes = offset_bits >> 3
        delta_nibbles = delta_bits >> 2
        overlap_nibbles = overlap_bits >> 2
        block.put8((offset_bytes - overlap_nibbles)
                   | (overlap_nibbles << 3) | (delta_nibbles - 1) << 4)

        offset = _MASK64
        num_exceptions = 0
        for v in block_vals:
            if v == _EXCEPTION:
                num_exceptions += 1
            else:
                offset = min(offset, v - base)
        if num_exceptions == len(block_vals):
            offset = 0

        offset_shift = delta_bits - overlap_bits
        offset &= ~_bit_mask(offset_shift)
        if offset > 0:
            encode_uint_with_length(offset >> offset_shift, offset_bytes,
                                    block)

        delta_bytes = (delta_nibbles + 1) >> 1
        exceptions: list[np.ndarray] = []
        for j, v in enumerate(block_vals):
            if v == _EXCEPTION:
                delta = len(exceptions)
                exceptions.append(pts[i + j])
            else:
                delta = v - (offset + base)
                if have_exceptions:
                    delta += _BLOCK_SIZE
            if (delta_nibbles & 1) and (j & 1):
                # pack into the high nibble of the previous delta's last byte
                last_byte = block.buf[-1]
                del block.buf[-1]
                delta = (delta << 4) | (last_byte & 0xF)
            encode_uint_with_length(delta, delta_bytes, block)
        if exceptions:
            block.putn(_pack_points(np.asarray(exceptions)))
    blocks.encode(enc)


def encode_s2point_vector(points, enc: Encoder, hint: str = "compact") -> None:
    """EncodeS2PointVector (encoded_s2point_vector.cc:108-120)."""
    if hint == "fast":
        encode_s2point_vector_fast(points, enc)
    elif hint == "compact":
        encode_s2point_vector_compact(points, enc)
    else:
        raise ValueError(f"unknown coding hint: {hint}")


class EncodedS2PointVector:
    """EncodedS2PointVector (encoded_s2point_vector.h:50-206): lazy
    per-element decoding of either format."""

    def __init__(self) -> None:
        self.format = -1
        self._n = 0
        # UNCOMPRESSED
        self._raw = b""
        # CELL_IDS
        self._blocks = EncodedStringVector()
        self._base = 0
        self._level = 0
        self._have_exceptions = False

    def init(self, dec: Decoder) -> bool:
        if dec.avail() < 1:
            return False
        fmt = dec.buf[dec.pos] & ((1 << _FORMAT_BITS) - 1)
        if fmt == UNCOMPRESSED:
            return self._init_uncompressed(dec)
        if fmt == CELL_IDS:
            return self._init_cell_ids(dec)
        return False

    def _init_uncompressed(self, dec: Decoder) -> bool:
        self.format = UNCOMPRESSED
        try:
            size = dec.get_varint64() >> _FORMAT_BITS
        except ValueError:
            return False
        if size > 0x7FFFFFFF:
            return False
        nbytes = size * 24
        if dec.avail() < nbytes:
            return False
        self._raw = dec.getn(nbytes)
        self._n = size
        return True

    def _init_cell_ids(self, dec: Decoder) -> bool:
        """InitCellIdsFormat (encoded_s2point_vector.cc:826-857)."""
        self.format = CELL_IDS
        if dec.avail() < 2:
            return False
        header1 = dec.get8()
        header2 = dec.get8()
        self._have_exceptions = (header1 & 8) != 0
        last_block_count = (header1 >> 4) + 1
        base_bytes = header2 & 7
        self._level = header2 >> 3
        if self._level > MAX_LEVEL:
            return False
        if dec.avail() < base_bytes:
            return False
        base = get_uint_with_length(dec.getn(base_bytes), 0, base_bytes)
        self._base = (base << _base_shift(self._level, base_bytes << 3)) \
            & _MASK64
        if not self._blocks.init(dec):
            return False
        self._n = _BLOCK_SIZE * (len(self._blocks) - 1) + last_block_count
        return self._n <= 0x7FFFFFFF

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> np.ndarray:
        if not 0 <= i < self._n:
            raise IndexError(i)
        if self.format == UNCOMPRESSED:
            return np.frombuffer(self._raw, dtype="<f8",
                                 count=3, offset=24 * i).copy()
        return self._decode_cell_ids(i)

    def _decode_cell_ids(self, i: int) -> np.ndarray:
        """DecodeCellIdsFormat (encoded_s2point_vector.cc:859-941)."""
        from . import coords as C

        block = self._blocks[i >> _BLOCK_SHIFT]
        if not block:
            raise ValueError("invalid block header")
        pos = 0
        header = block[pos]
        pos += 1
        overlap_nibbles = (header >> 3) & 1
        offset_bytes = (header & 7) + overlap_nibbles
        delta_nibbles = (header >> 4) + 1

        offset = 0
        if offset_bytes > 0:
            offset_shift = (delta_nibbles - overlap_nibbles) << 2
            if offset_shift >= 64:
                raise ValueError("invalid offset_shift")
            if pos + offset_bytes > len(block):
                raise ValueError("offset outside block")
            offset = get_uint_with_length(block, pos, offset_bytes) \
                << offset_shift
            pos += offset_bytes

        delta_nibble_offset = (i & (_BLOCK_SIZE - 1)) * delta_nibbles
        delta_bytes = (delta_nibbles + 1) >> 1
        dpos = pos + (delta_nibble_offset >> 1)
        if dpos + delta_bytes > len(block):
            raise ValueError("delta outside block")
        delta = get_uint_with_length(block, dpos, delta_bytes)
        delta >>= (delta_nibble_offset & 1) << 2
        delta &= _bit_mask(delta_nibbles << 2)

        if self._have_exceptions:
            if delta < _BLOCK_SIZE:
                block_size = min(_BLOCK_SIZE,
                                 self._n - (i & ~(_BLOCK_SIZE - 1)))
                pos += (block_size * delta_nibbles + 1) >> 1
                pos += delta * 24
                if pos + 24 > len(block):
                    raise ValueError("exception outside block")
                return np.frombuffer(block, dtype="<f8", count=3,
                                     offset=pos).copy()
            delta -= _BLOCK_SIZE

        value = (self._base + offset + delta) & _MASK64
        shift = MAX_LEVEL - self._level
        sj, tj = deinterleave_bit_pairs(value)
        si = (((sj << 1) | 1) << shift) & 0x7FFFFFFF
        ti = (((tj << 1) | 1) << shift) & 0x7FFFFFFF
        face = (((sj << shift) & 0xFFFFFFFF) >> 30) \
            | ((((tj << (shift + 1)) & 0xFFFFFFFF) >> 29) & 4)
        x, y, z = C.normalize_xyz(*C.face_siti_to_xyz(
            np.asarray([face]),
            np.asarray([si], dtype=np.int64),
            np.asarray([ti], dtype=np.int64)))
        return np.array([x[0], y[0], z[0]])

    def decode(self) -> np.ndarray:
        if self._n == 0:
            return np.zeros((0, 3))
        return np.vstack([self[i] for i in range(self._n)])

    def encode(self, enc: Encoder) -> None:
        """Re-encode (encoded_s2point_vector.cc:183-201)."""
        if self.format == UNCOMPRESSED:
            encode_s2point_vector_fast(self.decode(), enc)
        else:
            encode_s2point_vector_compact(self.decode(), enc)
