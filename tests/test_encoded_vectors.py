"""Ports of encoded_uint_vector_test.cc, encoded_string_vector_test.cc,
encoded_s2cell_id_vector_test.cc, and encoded_s2point_vector_test.cc —
exact encoded byte sizes plus lossless roundtrips."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.encodings import Decoder, Encoder
from s2geometry_spark.kernel.encoded_vectors import (
    EncodedS2CellIdVector,
    EncodedS2PointVector,
    EncodedStringVector,
    EncodedUintVector,
    StringVectorEncoder,
    deinterleave_bit_pairs,
    encode_s2cellid_vector,
    encode_s2point_vector,
    encode_uint_vector,
    interleave_bit_pairs,
)

MAX_LEVEL = 30
SENTINEL = (1 << 64) - 1  # S2CellId::Sentinel()


def cid(s: str) -> int:
    return int(K.from_debug_string(s)[0])


def begin(level: int) -> int:
    return int(K.child_begin(K.from_face([0]), level)[0])


def end(level: int) -> int:
    return int(K.child_end(K.from_face([5]), level)[0])


def to_point(raw_id: int) -> np.ndarray:
    x, y, z = K.to_point(np.asarray([raw_id], dtype=np.uint64))
    return np.array([x[0], y[0], z[0]])


# ---------------------------------------------------------------------------
# EncodedUintVector (encoded_uint_vector_test.cc)
# ---------------------------------------------------------------------------


def roundtrip_uints(values, sizeof_t, expected_bytes=None):
    enc = Encoder()
    encode_uint_vector(values, sizeof_t, enc)
    if expected_bytes is not None:
        assert len(enc.buf) == expected_bytes
    dec = Decoder(bytes(enc.buf))
    v = EncodedUintVector()
    assert v.init(dec, sizeof_t)
    assert v.decode() == list(values)
    # re-encode must be byte-identical
    enc2 = Encoder()
    v.encode(enc2)
    assert bytes(enc2.buf) == bytes(enc.buf)
    return v


@pytest.mark.parametrize(
    "values,sizeof_t,expected_bytes",
    [
        ([], 4, 1),                                     # Empty
        ([0], 8, 2),                                    # Zero
        ([0, 0, 0], 2, 4),                              # RepeatedZeros
        ([(1 << 64) - 1], 8, 9),                        # MaxInt
        ([0, 255, 1, 254], 8, 5),                       # OneByte
        ([0, 255, 256, 254], 8, 9),                     # TwoBytes
        ([0xFFFFFF, 0x0102, 0, 0x050403], 8, 13),       # ThreeBytes
        ([(1 << 64) - 1, 0, 0x0102030405060708], 8, 25),  # EightBytes
    ],
)
def test_encoded_uint_vector_sizes(values, sizeof_t, expected_bytes):
    roundtrip_uints(values, sizeof_t, expected_bytes)


def test_encoded_uint_vector_lower_bound():
    # encoded_uint_vector_test.cc:91-132: sorted vectors at every byte
    # length; lower_bound agrees with std::lower_bound for each element
    # and its predecessor
    for bytes_per_value in range(1, 9):
        limit = (1 << (8 * bytes_per_value)) - 1
        n = 10
        values = sorted(
            {limit * i // (n - 1) for i in range(n - 1)} | {limit})
        v = roundtrip_uints(values, 8)
        for x in values:
            expect = next(i for i, val in enumerate(values) if val >= x)
            assert v.lower_bound(x) == expect
            if x > 0:
                expect_prev = next(
                    i for i, val in enumerate(values) if val >= x - 1)
                assert v.lower_bound(x - 1) == expect_prev


# ---------------------------------------------------------------------------
# EncodedStringVector (encoded_string_vector_test.cc)
# ---------------------------------------------------------------------------


def roundtrip_strings(strings, expected_bytes):
    enc = Encoder()
    StringVectorEncoder.encode_all(strings, enc)
    assert len(enc.buf) == expected_bytes
    dec = Decoder(bytes(enc.buf))
    v = EncodedStringVector()
    assert v.init(dec)
    assert v.decode() == [s.encode() if isinstance(s, str) else s
                          for s in strings]
    # EncodedStringVector::Encode must reproduce the bytes
    enc2 = Encoder()
    v.encode(enc2)
    assert bytes(enc2.buf) == bytes(enc.buf)
    return v


@pytest.mark.parametrize(
    "strings,expected_bytes",
    [
        ([], 1),                                        # Empty
        ([""], 2),                                      # EmptyString
        (["", "", ""], 4),                              # RepeatedEmptyStrings
        (["apples"], 8),                                # OneString
        (["fuji", "mutsu"], 12),                        # TwoStrings
        (["x" * 10000, "y" * 100000], 110007),          # TwoBigStrings
    ],
)
def test_encoded_string_vector_sizes(strings, expected_bytes):
    roundtrip_strings(strings, expected_bytes)


def test_encoded_string_vector_subscript():
    enc = Encoder()
    StringVectorEncoder.encode_all(["pink lady", "gala"], enc)
    v = EncodedStringVector()
    assert v.init(Decoder(bytes(enc.buf)))
    assert len(v) == 2
    assert v[0] == b"pink lady"
    assert v[1] == b"gala"


def test_string_vector_add_via_encoder():
    sv = StringVectorEncoder()
    e = sv.add_via_encoder()
    e.putn(b"abc")
    e = sv.add_via_encoder()
    e.putn(b"defg")
    enc = Encoder()
    sv.encode(enc)
    v = EncodedStringVector()
    assert v.init(Decoder(bytes(enc.buf)))
    assert v.decode() == [b"abc", b"defg"]


# ---------------------------------------------------------------------------
# EncodedS2CellIdVector (encoded_s2cell_id_vector_test.cc)
# ---------------------------------------------------------------------------


def roundtrip_cellids(ids, expected_bytes=None):
    enc = Encoder()
    encode_s2cellid_vector(ids, enc)
    if expected_bytes is not None:
        assert len(enc.buf) == expected_bytes
    v = EncodedS2CellIdVector()
    assert v.init(Decoder(bytes(enc.buf)))
    assert v.decode() == [i & ((1 << 64) - 1) for i in ids]
    enc2 = Encoder()
    v.encode(enc2)
    assert bytes(enc2.buf) == bytes(enc.buf)
    return v


def test_cellid_vector_small_cases():
    roundtrip_cellids([], 2)                            # Empty
    roundtrip_cellids([0], 3)                           # None
    roundtrip_cellids([0, 0], 4)                        # NoneNone
    roundtrip_cellids([SENTINEL], 10)                   # Sentinel
    roundtrip_cellids([cid("0/00")], 3)                 # MaximumShiftCell
    roundtrip_cellids([SENTINEL, SENTINEL], 11)         # SentinelSentinel
    roundtrip_cellids([0, SENTINEL, 0], 26)             # NoneSentinelNone
    roundtrip_cellids([0x6, 0xE, 0x7E], 5)              # InvalidCells
    roundtrip_cellids([0x3, 0x7, 0x177], 5)             # OneByteLeafCells
    roundtrip_cellids([0xC, 0x1C, 0x47C], 5)            # OneByteLevel29
    roundtrip_cellids([0x30, 0x70, 0x1770], 6)          # OneByteLevel28
    roundtrip_cellids([0x300, 0x1C00, 0x7000, 0xFF00], 6)  # MixedLevels
    roundtrip_cellids(                                  # …WithPrefix
        [0x1234567800000300, 0x1234567800001C00,
         0x1234567800007000, 0x123456780000FF00], 10)
    roundtrip_cellids(                                  # RangeWithBaseValue
        [0x00FFFF0000000000, 0x0100FC0000000000,
         0x0100500000000000, 0x0100330000000000], 9)


def test_cellid_vector_max_shift_range():
    # encoded_s2cell_id_vector_test.cc:158-183: shift 27+29=56 is valid,
    # 28+29 is rejected
    ok = bytes([(31 << 3) + 1, 27, 1, 0])
    v = EncodedS2CellIdVector()
    assert v.init(Decoder(ok))
    bad = bytes([(31 << 3) + 1, 28, 1, 0])
    v2 = EncodedS2CellIdVector()
    assert not v2.init(Decoder(bad))


def test_cellid_vector_six_face_cells():
    ids = [int(K.from_face([f])[0]) for f in range(6)]
    roundtrip_cellids(ids, 8)


def test_cellid_vector_four_level10_children():
    parent = K.from_debug_string("3/012301230")
    cur = K.child_begin(parent)
    ids = [int(cur[0])]
    for _ in range(3):
        cur = K.next_id(cur)
        ids.append(int(cur[0]))
    roundtrip_cellids(ids, 8)


def test_cellid_vector_covering_cells():
    ids = [
        0x414A617F00000000, 0x414A61C000000000, 0x414A624000000000,
        0x414A63C000000000, 0x414A647000000000, 0x414A64C000000000,
        0x414A653000000000, 0x414A704000000000, 0x414A70C000000000,
        0x414A714000000000, 0x414A71B000000000, 0x414A7A7C00000000,
        0x414A7AC000000000, 0x414A8A4000000000, 0x414A8BC000000000,
        0x414A8C4000000000, 0x414A8D7000000000, 0x414A8DC000000000,
        0x414A914000000000, 0x414A91C000000000, 0x414A924000000000,
        0x414A942C00000000, 0x414A95C000000000, 0x414A96C000000000,
        0x414AB0C000000000, 0x414AB14000000000, 0x414AB34000000000,
        0x414AB3C000000000, 0x414AB44000000000, 0x414AB4C000000000,
        0x414AB6C000000000, 0x414AB74000000000, 0x414AB8C000000000,
        0x414AB94000000000, 0x414ABA1000000000, 0x414ABA3000000000,
        0x414ABBC000000000, 0x414ABE4000000000, 0x414ABEC000000000,
        0x414ABF4000000000, 0x46B5454000000000, 0x46B545C000000000,
        0x46B5464000000000, 0x46B547C000000000, 0x46B5487000000000,
        0x46B548C000000000, 0x46B5494000000000, 0x46B54A5400000000,
        0x46B54AC000000000, 0x46B54B4000000000, 0x46B54BC000000000,
        0x46B54C7000000000, 0x46B54C8004000000, 0x46B54EC000000000,
        0x46B55AD400000000, 0x46B55B4000000000, 0x46B55BC000000000,
        0x46B55C4000000000, 0x46B55C8100000000, 0x46B55DC000000000,
        0x46B55E4000000000, 0x46B5604000000000, 0x46B560C000000000,
        0x46B561C000000000, 0x46CA424000000000, 0x46CA42C000000000,
        0x46CA43C000000000, 0x46CA444000000000, 0x46CA45C000000000,
        0x46CA467000000000, 0x46CA469000000000, 0x46CA5FC000000000,
        0x46CA604000000000, 0x46CA60C000000000, 0x46CA674000000000,
        0x46CA679000000000, 0x46CA67F000000000, 0x46CA684000000000,
        0x46CA855000000000, 0x46CA8C4000000000, 0x46CA8CC000000000,
        0x46CA8E5400000000, 0x46CA8EC000000000, 0x46CA8F0100000000,
        0x46CA8FC000000000, 0x46CA900400000000, 0x46CA98C000000000,
        0x46CA994000000000, 0x46CA99C000000000, 0x46CA9A4000000000,
        0x46CA9AC000000000, 0x46CA9BD500000000, 0x46CA9E4000000000,
        0x46CA9EC000000000, 0x46CAF34000000000, 0x46CAF4C000000000,
        0x46CAF54000000000,
    ]
    assert len(ids) == 97
    roundtrip_cellids(ids, 488)


def test_cellid_vector_lower_bound_limits():
    first = begin(MAX_LEVEL)
    last = end(MAX_LEVEL) - 2  # End(kMaxLevel).prev(): id - 2*lsb = id - 2
    v = roundtrip_cellids([first, last])
    assert v.lower_bound(0) == 0
    assert v.lower_bound(first) == 0
    assert v.lower_bound(first + 2) == 1       # first.next()
    assert v.lower_bound(last - 2) == 1        # last.prev()
    assert v.lower_bound(last) == 1
    assert v.lower_bound(last + 2) == 2        # last.next()
    assert v.lower_bound(SENTINEL) == 2


# ---------------------------------------------------------------------------
# EncodedS2PointVector (encoded_s2point_vector_test.cc)
# ---------------------------------------------------------------------------


def encoded_value_to_point(value: int, level: int) -> np.ndarray:
    """EncodedValueToPoint (encoded_s2point_vector_test.cc:90-107)."""
    from s2geometry_spark.kernel import coords as C

    sj, tj = deinterleave_bit_pairs(value)
    shift = MAX_LEVEL - level
    si = (((sj << 1) | 1) << shift) & 0x7FFFFFFF
    ti = (((tj << 1) | 1) << shift) & 0x7FFFFFFF
    face = (((sj << shift) & 0xFFFFFFFF) >> 30) \
        | ((((tj << (shift + 1)) & 0xFFFFFFFF) >> 29) & 4)
    x, y, z = C.normalize_xyz(*C.face_siti_to_xyz(
        np.asarray([face]), np.asarray([si], dtype=np.int64),
        np.asarray([ti], dtype=np.int64)))
    return np.array([x[0], y[0], z[0]])


def norm(v) -> np.ndarray:
    v = np.asarray(v, dtype=np.float64)
    return v / np.sqrt((v * v).sum())


def roundtrip_points(points, hint, expected_bytes=None):
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    enc = Encoder()
    encode_s2point_vector(pts, enc, hint=hint)
    if expected_bytes is not None:
        assert len(enc.buf) == expected_bytes
    v = EncodedS2PointVector()
    assert v.init(Decoder(bytes(enc.buf)))
    assert len(v) == len(pts)
    got = v.decode().reshape(-1, 3)
    assert got.shape == pts.shape
    assert (got == pts).all()  # bit-exact roundtrip
    # re-encode must be byte-identical
    enc2 = Encoder()
    v.encode(enc2)
    assert bytes(enc2.buf) == bytes(enc.buf)
    return v


def test_point_vector_empty():
    roundtrip_points(np.zeros((0, 3)), "fast", 1)
    roundtrip_points(np.zeros((0, 3)), "compact", 1)


def test_point_vector_one_point():
    roundtrip_points([[1, 0, 0]], "fast", 25)
    roundtrip_points([[1, 0, 0]], "compact", 6)


def test_point_vector_one_point_with_exceptions_no_overlap():
    a = np.array([1.0, 0.0, 0.0])
    points = [norm([1, 2, 3])] + [a] * 15 + [a]
    roundtrip_points(points, "compact", 48)


def test_point_vector_one_point_with_exceptions_with_overlap():
    a = to_point(0x946DF618D0000000)
    b = to_point(0x947209E070000000)
    points = [norm([1, 2, 3])] + [a] * 15 + [b]
    roundtrip_points(points, "compact", 54)


def test_point_vector_cellid_with_exception():
    roundtrip_points(
        [to_point(cid("1/23")), norm([0.1, 0.2, 0.3])], "compact", 31)


def test_point_vector_points_at_multiple_levels():
    roundtrip_points(
        [to_point(cid("2/11001310230102")),
         to_point(cid("1/23322")),
         to_point(cid("3/3")),
         to_point(cid("1/23323")),
         to_point(cid("2/12101023022012"))],
        "compact", 83)


BLOCK = 16


def test_point_vector_no_overlap_or_extra_delta_bits_needed():
    level = 3
    points = [encoded_value_to_point(0, level)] * BLOCK
    points += [encoded_value_to_point(x, level)
               for x in (0x72, 0x74, 0x75, 0x7E)]
    roundtrip_points(points, "compact", 10 + BLOCK // 2)


def test_point_vector_overlap_needed():
    level = 3
    points = [encoded_value_to_point(0, level)] * BLOCK
    points += [encoded_value_to_point(x, level)
               for x in (0x78, 0x7A, 0x7C, 0x84)]
    roundtrip_points(points, "compact", 10 + BLOCK // 2)


def test_point_vector_extra_delta_bits_needed():
    level = 3
    points = [encoded_value_to_point(0, level)] * BLOCK
    points += [encoded_value_to_point(x, level)
               for x in (0x08, 0x4E, 0x82, 0x104)]
    roundtrip_points(points, "compact", 13 + BLOCK // 2)


def test_point_vector_extra_delta_bits_and_overlap_needed():
    level = 5
    points = [encoded_value_to_point(0, level)] * BLOCK
    points += [encoded_value_to_point(x, level)
               for x in (0xF08, 0xF4E, 0xF82, 0x1004)]
    roundtrip_points(points, "compact", 14 + BLOCK // 2)


def test_point_vector_sixty_four_bit_offset():
    level = MAX_LEVEL
    last = end(level) - 2
    points = [to_point(begin(level))] * BLOCK
    points.append(to_point(last))
    points.append(to_point(last - 2))
    roundtrip_points(points, "compact", 16 + BLOCK // 2)


def test_point_vector_all_exceptions_block():
    points = [encoded_value_to_point(0, MAX_LEVEL)] * BLOCK
    points.append(norm([0.1, 0.2, 0.3]))
    points.append(norm([0.3, 0.2, 0.1]))
    roundtrip_points(points, "compact", 72)
    roundtrip_points(points, "fast", 434)


def test_point_vector_first_at_all_levels():
    # First S2CellId at each level encodes in 6 bytes
    for level in range(MAX_LEVEL + 1):
        roundtrip_points([to_point(begin(level))], "compact", 6)


def test_point_vector_last_at_all_levels():
    # Last S2CellId at each level encodes in 6-13 bytes
    for level in range(MAX_LEVEL + 1):
        lsb = 1 << (2 * (MAX_LEVEL - level))
        last = end(level) - 2 * lsb
        enc = Encoder()
        encode_s2point_vector([to_point(last)], enc, hint="compact")
        assert 6 <= len(enc.buf) <= 13
        v = EncodedS2PointVector()
        assert v.init(Decoder(bytes(enc.buf)))
        assert (v.decode().reshape(-1, 3) == to_point(last)).all()


def test_interleave_roundtrip():
    rng = np.random.RandomState(7)
    for _ in range(200):
        a = int(rng.randint(0, 1 << 31))
        b = int(rng.randint(0, 1 << 31))
        code = interleave_bit_pairs(a, b)
        assert deinterleave_bit_pairs(code) == (a, b)


def test_point_vector_random_cell_centers():
    # mixed levels + raw exceptions, both hints, lossless
    rng = np.random.RandomState(42)
    points = []
    for _ in range(100):
        kind = rng.randint(3)
        if kind == 0:
            lat, lng = rng.uniform(-80, 80), rng.uniform(-180, 180)
            leaf = int(K.from_latlng(np.asarray([lat]),
                                     np.asarray([lng]))[0])
            points.append(to_point(leaf))
        elif kind == 1:
            lat, lng = rng.uniform(-80, 80), rng.uniform(-180, 180)
            leaf = K.from_latlng(np.asarray([lat]), np.asarray([lng]))
            parent = K.parent(leaf, 12)
            points.append(to_point(int(parent[0])))
        else:
            points.append(norm(rng.randn(3)))
    roundtrip_points(points, "fast")
    roundtrip_points(points, "compact")


# ---------------------------------------------------------------------------
# Remaining reference cases: the all-levels size ladders, fractal
# stress, roundtrip-from-encoded, and the decoder fuzz regressions.
# ---------------------------------------------------------------------------


def test_point_vector_max_face_siti_at_all_levels():
    """MaxFaceSiTiAtAllLevels (encoded_s2point_vector_test.cc:339-360):
    the cell 5/222...22 (maximal face/si/ti) at each level; one byte
    bigger than FirstAtAllLevels at levels 7,11,15,19,23,27."""
    leaf = 0xB555555555555555
    for level in range(MAX_LEVEL + 1):
        pid = int(K.parent(np.asarray([leaf], dtype=np.uint64), level)[0])
        expected = 6 if level < 4 else 6 + (level + 1) // 4
        roundtrip_points([to_point(pid)], "compact", expected)


def test_point_vector_last_two_points_at_all_levels():
    """LastTwoPointsAtAllLevels (test.cc:361-375): two 4-bit deltas cost
    only 4 bits more than the singleton 8-bit-delta encoding."""
    for level in range(MAX_LEVEL + 1):
        lsb = 1 << (2 * (MAX_LEVEL - level))
        last = end(level) - 2 * lsb
        prev = last - 2 * lsb
        expected = 6 + (level + 2) // 4
        roundtrip_points([to_point(last), to_point(prev)], "compact", expected)


def test_point_vector_many_duplicate_points_at_all_levels():
    """ManyDuplicatePointsAtAllLevels (test.cc:376-394): 32 copies of the
    last cell at each level — under 1 byte per point; level 30 pays one
    extra byte (7-byte base + per-block offsets)."""
    for level in range(MAX_LEVEL + 1):
        lsb = 1 << (2 * (MAX_LEVEL - level))
        last = end(level) - 2 * lsb
        expected = 23 + (level + 2) // 4
        if level == 30:
            expected += 1
        roundtrip_points([to_point(last)] * 32, "compact", expected)


def test_point_vector_snapped_fractal_loops():
    """SnappedFractalLoops (test.cc:395-416): leaf-snapped fractal loop
    vertices roundtrip losslessly under COMPACT and beat the raw 24·n
    encoding (the reference prints s2 vs lax sizes; the assertion that
    matters is lossless compact coding of realistic snapped data)."""
    from s2geometry_spark.kernel.fractal import Fractal, frame_at, random_point

    rng = np.random.RandomState(20260819)
    for num_points in (3, 48, 768):
        f = Fractal(rng)
        f.set_level_for_approx_max_edges(num_points)
        frame = frame_at(rng, random_point(rng))
        verts = f.make_vertices(frame, 10.0 / 6371.0)
        lat = np.degrees(np.arcsin(np.clip(verts[:, 2], -1, 1)))
        lng = np.degrees(np.arctan2(verts[:, 1], verts[:, 0]))
        leaf = K.from_latlng(lat, lng)
        points = [to_point(int(i)) for i in np.asarray(leaf, dtype=np.uint64)]
        enc = Encoder()
        encode_s2point_vector(np.asarray(points), enc, hint="compact")
        assert len(enc.buf) < 24 * len(points)
        roundtrip_points(points, "compact", len(enc.buf))


@pytest.mark.parametrize("hint", ["fast", "compact"])
def test_point_vector_roundtrip_encoding(hint):
    """RoundtripEncodingFast / RoundtripEncodingCompact (test.cc:418-463):
    a full block of equal values plus a tail with exceptions-free deltas,
    encoded, decoded, re-encoded from the decoded form — all lossless
    (roundtrip_points already re-encodes from the EncodedS2PointVector)."""
    level = 3
    points = [encoded_value_to_point(0, level)] * 16
    for v in (0x78, 0x7A, 0x7C, 0x84):
        points.append(encoded_value_to_point(v, level))
    roundtrip_points(points, hint)


@pytest.mark.parametrize(
    "blob",
    [
        b"i\370\305\201",
        b"\201\252\305+\010\023\304\n\274\3271^7\261\261iiY\261\261\261\261"
        b"\261\253\313\220\254DDDDV\320",
        b"\351\010\010\010\010\010\0107\274\361\030fo[\210O\363\214]\010\021n"
        b"\265W=(\014\014\014\014\203\034",
        b"\331\010\010\014\363+\214O\230\200\230{$$\314$\210b\222\034\210\210"
        b"\232\210\210\212\214\034",
    ],
    ids=["regression1", "regression2", "regression3", "regression4"],
)
def test_point_vector_decode_never_crashes(blob):
    """DecodeNeverCrashesRegression1-4 (test.cc:536-558): malformed input
    must fail CLEANLY — init returns False, or decode raises the typed
    validation error (the analog of the reference's S2Error path).  No
    hangs, no unbounded allocation, no low-level faults."""
    v = EncodedS2PointVector()
    if v.init(Decoder(blob)):
        try:
            v.decode()
        except ValueError:
            pass  # validated failure — the S2Error-returning path


def test_cellid_vector_fractal_shape_index_cells():
    """FractalS2ShapeIndexCells (encoded_s2cell_id_vector_test.cc:199):
    the cell ids of a fractal loop's shape index compress to a few bytes
    per cell.  (The reference pins 966 cells / 2902 bytes from its own
    C++ RNG stream; with our RNG the invariants are the ~3 bytes/cell
    ratio and the lossless roundtrip.)"""
    from s2geometry_spark.kernel.contains import parse_points
    from s2geometry_spark.kernel.fractal import Fractal, frame_at
    from s2geometry_spark.kernel.mutable_index import MutableIndex
    from s2geometry_spark.kernel.shapeutil import LaxPolygon

    rng = np.random.RandomState(7)
    f = Fractal(rng)
    f.set_level_for_approx_max_edges(3 * 1024)
    center = parse_points("47.677:-122.206")[0]
    verts = f.make_vertices(frame_at(rng, center), np.radians(1.0))
    index = MutableIndex()
    index.add(LaxPolygon([verts]))
    ids = [cell_id.id for cell_id, _ in index.cells()]
    assert len(ids) > 300
    enc = Encoder()
    encode_s2cellid_vector(ids, enc)
    assert len(enc.buf) < 4 * len(ids)
    roundtrip_cellids(ids, len(enc.buf))


def test_cellid_vector_init_never_crashes_regression():
    """EncodedS2CellIdVectorInitNeverCrashesRegression
    (encoded_s2cell_id_vector_test.cc:287-295): a size_·len_ overflow
    used to let Init proceed into a segfault; Init must reject (or
    lower_bound must complete) on this blob."""
    blob = bytes([32, 135, 128, 128, 128, 48, 39, 132, 143, 84])
    v = EncodedS2CellIdVector()
    if v.init(Decoder(blob)):
        v.lower_bound(7059594055645134713)
