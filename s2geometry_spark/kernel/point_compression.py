"""S2EncodePointsCompressed / S2DecodePointsCompressed
(s2point_compression.cc): cell-center points at a snap level stored as
2nd-derivative-coded, zig-zag'd, bit-interleaved varints over (pi, qi)
coordinates, with face run-length encoding and raw-double escape for
off-center points.  This is the vertex codec behind the version-4
compressed loop/polygon/polyline encodings."""

from __future__ import annotations

import numpy as np

from . import coords
from .encodings import Decoder, Encoder

NUM_FACES = 6
MAX_LEVEL = 30
MAX_SI_TI = 1 << (MAX_LEVEL + 1)
_DERIVATIVE_ORDER = 2  # kDerivativeEncodingOrder

_M32 = 0xFFFFFFFF


def _i32(v: int) -> int:
    """Wrap to two's-complement int32 (the coder relies on overflow)."""
    return ((v & _M32) ^ 0x80000000) - 0x80000000


class NthDerivativeCoder:
    """util/coding/nth-derivative.h: code the nth discrete derivative;
    integer wraparound makes the transform lossless."""

    def __init__(self, n: int):
        if not (0 <= n <= 10):
            n = 0
        self.n = n
        self.m = 0
        self.memory = [0] * 10

    def encode(self, k: int) -> int:
        for i in range(self.m):
            delta = _i32(k - self.memory[i])
            self.memory[i] = k
            k = delta
        if self.m < self.n:
            self.memory[self.m] = k
            self.m += 1
        return k

    def decode(self, k: int) -> int:
        if self.m < self.n:
            self.m += 1
        for i in range(self.m - 1, -1, -1):
            k = self.memory[i] = _i32(self.memory[i] + k)
        return k


def zigzag_encode(n: int) -> int:
    """transforms.h:42-46."""
    return ((n << 1) ^ (n >> 31)) & _M32 if n < 0 else (n << 1) & _M32


def zigzag_decode(n: int) -> int:
    return _i32((n >> 1) ^ (-(n & 1) & _M32))


def interleave_uint32(val0: int, val1: int) -> int:
    """util/bits/bit-interleave: bit i of val0 -> bit 2i of the result,
    bit i of val1 -> bit 2i+1."""
    def spread(v: int) -> int:
        v &= _M32
        v = (v | (v << 16)) & 0x0000FFFF0000FFFF
        v = (v | (v << 8)) & 0x00FF00FF00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v << 2)) & 0x3333333333333333
        v = (v | (v << 1)) & 0x5555555555555555
        return v

    return spread(val0) | (spread(val1) << 1)


def deinterleave_uint32(code: int) -> tuple[int, int]:
    def squash(v: int) -> int:
        v &= 0x5555555555555555
        v = (v | (v >> 1)) & 0x3333333333333333
        v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
        v = (v | (v >> 16)) & _M32
        return v

    return squash(code), squash(code >> 1)


def siti_to_piqi(si: int, level: int) -> int:
    """SiTitoPiQi (s2point_compression.cc:182-191)."""
    si = min(int(si), MAX_SI_TI - 1)
    return si >> (MAX_LEVEL + 1 - level)


def piqi_to_st(pi: int, level: int) -> float:
    """PiQitoST (s2point_compression.cc:193-199)."""
    return (pi + 0.5) / (1 << level)


def face_piqi_to_xyz(face: int, pi: int, qi: int, level: int) -> np.ndarray:
    """FacePiQitoXYZ (s2point_compression.cc:201-205)."""
    x, y, z = coords.face_uv_to_xyz(
        np.int64(face),
        coords.st_to_uv(np.float64(piqi_to_st(pi, level))),
        coords.st_to_uv(np.float64(piqi_to_st(qi, level))),
    )
    x, y, z = float(x), float(y), float(z)
    n = (x * x + y * y + z * z) ** 0.5
    return np.array([x / n, y / n, z / n])


def xyz_face_siti(points: np.ndarray):
    """GetXYZFaceSiTiVertices: per-point (face, si, ti, cell_level)."""
    p = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    return coords.xyz_to_face_siti(p[:, 0], p[:, 1], p[:, 2])


def encode_points_compressed(points: np.ndarray, level: int,
                             enc: Encoder | None = None,
                             face_siti=None) -> Encoder:
    """S2EncodePointsCompressed (s2point_compression.cc:321-352).

    face_siti optionally supplies precomputed (face, si, ti, cell_level)
    arrays (the reference API takes S2XYZFaceSiTi structs, so callers may
    pass values that differ from recomputation, e.g. for points exactly
    on a face edge)."""
    enc = enc or Encoder()
    p = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    face, si, ti, cell_level = (face_siti if face_siti is not None
                                else xyz_face_siti(p))

    # face run-length encoding: varint64 of kNumFaces*count + face
    runs: list[list[int]] = []
    for f in face:
        f = int(f)
        if runs and runs[-1][0] == f:
            runs[-1][1] += 1
        else:
            runs.append([f, 1])
    for f, count in runs:
        enc.put_varint64(NUM_FACES * count + f)

    pi_coder = NthDerivativeCoder(_DERIVATIVE_ORDER)
    qi_coder = NthDerivativeCoder(_DERIVATIVE_ORDER)
    for i in range(len(p)):
        pi = siti_to_piqi(int(si[i]), level)
        qi = siti_to_piqi(int(ti[i]), level)
        if i == 0:
            # fixed-length first point: interleaved pi/qi truncated to
            # (level+7)//8*2 little-endian bytes
            inter = interleave_uint32(pi_coder.encode(pi) & _M32,
                                      qi_coder.encode(qi) & _M32)
            nbytes = (level + 7) // 8 * 2
            enc.putn(inter.to_bytes(8, "little")[:nbytes])
        else:
            zz = interleave_uint32(zigzag_encode(pi_coder.encode(pi)),
                                   zigzag_encode(qi_coder.encode(qi)))
            enc.put_varint64(zz)

    off_center = [i for i in range(len(p)) if int(cell_level[i]) != level]
    enc.put_varint32(len(off_center))
    for i in off_center:
        enc.put_varint32(i)
        enc.putn(p[i].astype("<f8").tobytes())
    return enc


def decode_points_compressed(dec: Decoder, level: int,
                             num_points: int) -> np.ndarray:
    """S2DecodePointsCompressed (s2point_compression.cc:354-391)."""
    runs: list[tuple[int, int]] = []
    parsed = 0
    while parsed < num_points:
        face_and_count = dec.get_varint64()
        f = face_and_count % NUM_FACES
        count = face_and_count // NUM_FACES
        if count <= 0:
            raise ValueError("bad face run")
        runs.append((f, count))
        parsed += count

    faces_iter = (f for f, count in runs for _ in range(count))
    pi_coder = NthDerivativeCoder(_DERIVATIVE_ORDER)
    qi_coder = NthDerivativeCoder(_DERIVATIVE_ORDER)
    out = np.zeros((num_points, 3))
    for i in range(num_points):
        if i == 0:
            nbytes = (level + 7) // 8 * 2
            inter = int.from_bytes(dec.getn(nbytes), "little")
            pi_raw, qi_raw = deinterleave_uint32(inter)
            pi = pi_coder.decode(_i32(pi_raw))
            qi = qi_coder.decode(_i32(qi_raw))
        else:
            zz = dec.get_varint64()
            pi_zz, qi_zz = deinterleave_uint32(zz)
            pi = pi_coder.decode(zigzag_decode(pi_zz))
            qi = qi_coder.decode(zigzag_decode(qi_zz))
        out[i] = face_piqi_to_xyz(int(next(faces_iter)), pi, qi, level)

    num_off_center = dec.get_varint32()
    if num_off_center > num_points:
        raise ValueError("bad off-center count")
    for _ in range(num_off_center):
        idx = dec.get_varint32()
        if idx >= num_points:
            raise ValueError("bad off-center index")
        out[idx] = np.frombuffer(dec.getn(24), dtype="<f8")
    return out
