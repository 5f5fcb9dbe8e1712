"""Decoder-robustness fuzz (the reference's
EncodedS2CellIdVectorInitNeverCrashes / fuzzing harnesses,
encoded_s2cell_id_vector_test.cc:277-320): random and truncated byte
streams must either fail init cleanly or decode without crashing —
never raise anything but ValueError, never loop, never read out of
bounds."""

from __future__ import annotations

import numpy as np

from s2geometry_spark.kernel.encodings import Decoder, Encoder
from s2geometry_spark.kernel.encoded_vectors import (
    EncodedS2CellIdVector,
    EncodedS2PointVector,
    EncodedStringVector,
    EncodedUintVector,
    encode_s2cellid_vector,
    encode_s2point_vector,
)
from s2geometry_spark.kernel.shape_index_coding import decode_shape_index


def _try_cellid_vector(raw: bytes) -> None:
    v = EncodedS2CellIdVector()
    try:
        ok = v.init(Decoder(raw))
    except ValueError:
        return
    if not ok:
        return
    n = min(len(v), 100)
    for i in range(n):
        _ = v[i]
    _ = v.lower_bound(1 << 40)


def test_cellid_vector_fuzz_random_bytes():
    rng = np.random.RandomState(1234)
    for _ in range(500):
        n = int(rng.randint(0, 24))
        _try_cellid_vector(bytes(rng.randint(0, 256, n, dtype=np.uint8)))


def test_cellid_vector_fuzz_truncations():
    # every truncation of a valid encoding must fail cleanly or decode
    enc = Encoder()
    encode_s2cellid_vector(
        [0x414A617F00000000, 0x414A61C000000000, 0x46CAF54000000000], enc)
    raw = bytes(enc.buf)
    for k in range(len(raw)):
        _try_cellid_vector(raw[:k])


def test_uint_and_string_vector_fuzz():
    rng = np.random.RandomState(99)
    for _ in range(300):
        n = int(rng.randint(0, 20))
        raw = bytes(rng.randint(0, 256, n, dtype=np.uint8))
        v = EncodedUintVector()
        try:
            if v.init(Decoder(raw), 8):
                for i in range(min(len(v), 50)):
                    _ = v[i]
        except ValueError:
            pass
        sv = EncodedStringVector()
        try:
            if sv.init(Decoder(raw)):
                _ = sv.decode()
        except ValueError:
            pass


def test_point_vector_fuzz():
    rng = np.random.RandomState(7)
    # random garbage
    for _ in range(300):
        n = int(rng.randint(0, 40))
        raw = bytes(rng.randint(0, 256, n, dtype=np.uint8))
        v = EncodedS2PointVector()
        try:
            if v.init(Decoder(raw)):
                for i in range(min(len(v), 20)):
                    _ = v[i]
        except ValueError:
            pass
    # truncations of a valid CELL_IDS encoding
    from s2geometry_spark.kernel import cellid as K

    leafs = K.from_latlng(np.array([10.0, 11.0, 12.0]),
                          np.array([20.0, 21.0, 22.0]))
    x, y, z = K.to_point(leafs)
    pts = np.stack([x, y, z], -1)
    enc = Encoder()
    encode_s2point_vector(pts, enc, hint="compact")
    raw = bytes(enc.buf)
    for k in range(len(raw)):
        v = EncodedS2PointVector()
        try:
            if v.init(Decoder(raw[:k])):
                for i in range(len(v)):
                    _ = v[i]
        except ValueError:
            pass


def test_shape_index_decode_fuzz():
    rng = np.random.RandomState(42)
    for _ in range(300):
        n = int(rng.randint(0, 30))
        raw = bytes(rng.randint(0, 256, n, dtype=np.uint8))
        try:
            decode_shape_index(Decoder(raw), 2)
        except ValueError:
            pass
