"""Vectorized S2CellId operations over NumPy uint64 arrays.

Ports the bit-trick hierarchy algebra of the reference
(s2cell_id.h:57-76, 583-746; s2cell_id.cc:119-598) as branch-free NumPy.

Signedness convention (the "bias codec"): Spark LongType is signed, but
every range/merge algorithm relies on *unsigned* cell-id order
(s2cell_union.h:58-60).  We therefore store
``cell_id_s = int64(uint64_id - 2**63)`` in DataFrames — subtracting the
bias flips the MSB and preserves total order.  All kernels here operate
on raw uint64; use :func:`bias` / :func:`unbias` at the DataFrame edge.
"""

from __future__ import annotations

import numpy as np

from . import coords
from .hilbert import (
    MAX_LEVEL,
    MAX_SIZE,
    NUM_FACES,
    POS_BITS,
    from_face_ij,
    to_face_ij_orientation,
)

_U64 = np.uint64
_BIAS = np.uint64(1) << np.uint64(63)

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)  # S2CellId::Sentinel
NONE_ID = np.uint64(0)
WRAP_OFFSET = _U64(NUM_FACES) << _U64(POS_BITS)  # kWrapOffset


# ---------------------------------------------------------------- bias codec
def bias(ids: np.ndarray) -> np.ndarray:
    """uint64 cell id → order-preserving signed int64 (storage form)."""
    return (np.asarray(ids, dtype=np.uint64) ^ _BIAS).view(np.int64)


def unbias(ids_s: np.ndarray) -> np.ndarray:
    """signed int64 storage form → raw uint64 cell id."""
    return np.asarray(ids_s, dtype=np.int64).view(np.uint64) ^ _BIAS


# ---------------------------------------------------------------- basics
def lsb(ids: np.ndarray) -> np.ndarray:
    """Lowest set bit (s2cell_id.h:499): ``id & (~id + 1)``."""
    ids = np.asarray(ids, dtype=np.uint64)
    return ids & (~ids + _U64(1))


def lsb_for_level(level) -> np.ndarray:
    """s2cell_id.h:502: ``1 << 2*(kMaxLevel - level)``."""
    level = np.asarray(level, dtype=np.uint64)
    return _U64(1) << (_U64(2) * (_U64(MAX_LEVEL) - level))


def level(ids: np.ndarray) -> np.ndarray:
    """level = 30 - tz/2 (s2cell_id.h:595-603). Exact: log2 of a power of 2."""
    low = lsb(ids)
    tz = np.log2(low.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def is_leaf(ids: np.ndarray) -> np.ndarray:
    return (np.asarray(ids, dtype=np.uint64) & _U64(1)) != 0


def is_face(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    return (ids & (lsb_for_level(0) - _U64(1))) == 0


def is_valid(ids: np.ndarray) -> np.ndarray:
    """s2cell_id.h:583-585."""
    ids = np.asarray(ids, dtype=np.uint64)
    face_ok = (ids >> _U64(POS_BITS)) < NUM_FACES
    lsb_ok = (lsb(ids) & _U64(0x1555555555555555)) != 0
    return face_ok & lsb_ok


def face(ids: np.ndarray) -> np.ndarray:
    return (np.asarray(ids, dtype=np.uint64) >> _U64(POS_BITS)).astype(np.int64)


def from_face(f) -> np.ndarray:
    """Face cell: (face << kPosBits) + lsb_for_level(0) (s2cell_id.h:552)."""
    f = np.asarray(f, dtype=np.uint64)
    return (f << _U64(POS_BITS)) + lsb_for_level(0)


# ---------------------------------------------------------------- hierarchy
def parent(ids: np.ndarray, lvl) -> np.ndarray:
    """parent(l) = (id & -lsb(l)) | lsb(l)  (s2cell_id.h:662-668)."""
    ids = np.asarray(ids, dtype=np.uint64)
    nlsb = lsb_for_level(lvl)
    return (ids & (~nlsb + _U64(1))) | nlsb


def immediate_parent(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    nlsb = lsb(ids) << _U64(2)
    return (ids & (~nlsb + _U64(1))) | nlsb


def child(ids: np.ndarray, k) -> np.ndarray:
    """child(k) = id + (2k+1-4) * (lsb >> 2)  (s2cell_id.h:677-686)."""
    ids = np.asarray(ids, dtype=np.uint64)
    new_lsb = lsb(ids) >> _U64(2)
    k = np.asarray(k, dtype=np.int64)
    off = (2 * k - 3).astype(np.int64)  # 2k+1-4
    return ids + (off.view(np.uint64) * new_lsb)


def child_begin(ids: np.ndarray, lvl=None) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    old_lsb = lsb(ids)
    if lvl is None:
        return ids - old_lsb + (old_lsb >> _U64(2))
    return ids - old_lsb + lsb_for_level(lvl)


def child_end(ids: np.ndarray, lvl=None) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    old_lsb = lsb(ids)
    if lvl is None:
        return ids + old_lsb + (old_lsb >> _U64(2))
    return ids + old_lsb + lsb_for_level(lvl)


def child_position(ids: np.ndarray, lvl) -> np.ndarray:
    """(id >> (2*(30-l)+1)) & 3  (s2cell_id.h:635-640)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lvl = np.asarray(lvl, dtype=np.uint64)
    shift = _U64(2) * (_U64(MAX_LEVEL) - lvl) + _U64(1)
    return ((ids >> shift) & _U64(3)).astype(np.int64)


def range_min(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    return ids - (lsb(ids) - _U64(1))


def range_max(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    return ids + (lsb(ids) - _U64(1))


def contains(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a contains b ⇔ range_min(a) ≤ b ≤ range_max(a) (s2cell_id.h:650-654)."""
    b = np.asarray(b, dtype=np.uint64)
    return (b >= range_min(a)) & (b <= range_max(a))


def intersects(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (range_min(b) <= range_max(a)) & (range_max(b) >= range_min(a))


def next_id(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    return ids + (lsb(ids) << _U64(1))


def prev_id(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    return ids - (lsb(ids) << _U64(1))


def advance(ids: np.ndarray, steps: np.ndarray) -> np.ndarray:
    """Clamped Hilbert-order advance (s2cell_id.cc:119-137)."""
    ids = np.asarray(ids, dtype=np.uint64)
    steps = np.asarray(steps, dtype=np.int64)
    shift = (2 * (MAX_LEVEL - level(ids)) + 1).astype(np.uint64)
    min_steps = -((ids >> shift).astype(np.int64))
    max_steps = ((WRAP_OFFSET + lsb(ids) - ids) >> shift).astype(np.int64)
    steps = np.clip(steps, min_steps, max_steps)
    return ids + (steps.view(np.uint64) << shift)


def common_ancestor_level(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """GetCommonAncestorLevel (s2cell_id.cc:193-207); -1 if none."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    bits = a ^ b
    bits = np.maximum(bits, lsb(a))
    bits = np.maximum(bits, lsb(b))
    # bit_width(bits): exponent of highest set bit + 1.  float64 mantissa is
    # not wide enough for exact log2 of arbitrary 64-bit ints, so isolate the
    # MSB first by smearing bits rightward (classic fill), then log2 of
    # (smeared+1)>>1 — a power of two, exact in float64.
    s = bits
    for sh in (1, 2, 4, 8, 16, 32):
        s = s | (s >> _U64(sh))
    msb_pow = (s >> _U64(1)) + _U64(1)  # 1 << (bit_width-1)
    width = np.log2(msb_pow.astype(np.float64)).astype(np.int64) + 1
    # max(61 - bit_width, -1) >> 1, arithmetic shift (s2cell_id.cc:205-206)
    return np.maximum(61 - width, -1) >> 1


def maximum_tile(ids: np.ndarray, limit: np.ndarray) -> np.ndarray:
    """Largest cell with same range_min not extending to/past limit
    (exact vectorized port of s2cell_id.cc:168-191)."""
    ids, limit = np.broadcast_arrays(
        np.asarray(ids, dtype=np.uint64), np.asarray(limit, dtype=np.uint64)
    )
    ids = ids.copy()
    start = range_min(ids)
    done = start >= range_min(limit)
    out = np.where(done, limit, ids)
    active = ~done
    # Too-large branch: shrink via child(0) until range_max < limit.
    shrink = active & (range_max(ids) >= limit)
    while shrink.any():
        out[shrink] = child(out[shrink], 0)
        shrink = shrink & (range_max(out) >= limit)
    # Grow branch: take parent while range_min preserved and range_max < limit.
    grow = active & ~(active & (range_max(ids) >= limit))
    while grow.any():
        grow = grow & ~is_face(out)
        if not grow.any():
            break
        lv = level(out)
        par = parent(np.where(grow, out, from_face(0)), np.maximum(lv - 1, 0))
        ok = grow & (range_min(par) == start) & (range_max(par) < limit)
        out = np.where(ok, par, out)
        grow = ok
    return out


# ---------------------------------------------------------------- tokens
def to_token(ids: np.ndarray) -> list[str]:
    """Hex token, trailing zero nibbles stripped; 0 → "X" (s2cell_id.cc:217-233)."""
    out = []
    for v in np.asarray(ids, dtype=np.uint64).tolist():
        if v == 0:
            out.append("X")
        else:
            out.append(format(v, "016x").rstrip("0"))
    return out


def from_token(tokens) -> np.ndarray:
    """Inverse (s2cell_id.cc:235-254); malformed → 0 (None id)."""
    out = np.zeros(len(tokens), dtype=np.uint64)
    for idx, tok in enumerate(tokens):
        if tok is None or len(tok) > 16 or len(tok) == 0:
            continue
        if tok == "X":
            continue
        val = 0
        ok = True
        for ch in tok:
            if "0" <= ch <= "9":
                d = ord(ch) - 48
            elif "a" <= ch <= "f":
                d = ord(ch) - 87
            elif "A" <= ch <= "F":
                d = ord(ch) - 55
            else:
                ok = False
                break
            val = (val << 4) | d
        if ok:
            out[idx] = val << (4 * (16 - len(tok)))
    return out


def to_debug_string(ids: np.ndarray) -> list[str]:
    """"face/pos₁pos₂…" (s2cell_id.cc:600-612)."""
    fc = face(ids)
    lv = level(ids)
    out = []
    for one_id, f, l in zip(np.asarray(ids, dtype=np.uint64).tolist(), fc.tolist(), lv.tolist()):
        digits = "".join(
            str((one_id >> (2 * (MAX_LEVEL - k) + 1)) & 3) for k in range(1, l + 1)
        )
        out.append(f"{f}/{digits}")
    return out


def from_debug_string(s: str) -> np.ndarray:
    """Parse "face/pos₁pos₂…" (inverse of to_debug_string; s2cell_id.cc:614-633)."""
    f, _, digits = s.partition("/")
    out = from_face([int(f)])
    for d in digits:
        out = child(out, int(d))
    return out


# ---------------------------------------------------------------- geometry
def from_latlng(lat_deg: np.ndarray, lng_deg: np.ndarray) -> np.ndarray:
    """lat/lng degrees → leaf cell id (s2cell_id.cc:309-317)."""
    x, y, z = coords.latlng_to_xyz(lat_deg, lng_deg)
    return from_point(x, y, z)


def from_point(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    f, u, v = coords.xyz_to_face_uv(x, y, z)
    i = coords.st_to_ij(coords.uv_to_st(u))
    j = coords.st_to_ij(coords.uv_to_st(v))
    return from_face_ij(f, i, j)


def get_center_siti(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """GetCenterSiTi (s2cell_id.h:555-581)."""
    ids = np.asarray(ids, dtype=np.uint64)
    f, i, j, _ = to_face_ij_orientation(ids)
    leaf = is_leaf(ids)
    low2 = (ids >> _U64(2)).astype(np.int64)
    delta = np.where(leaf, 1, np.where(((i ^ low2) & 1) != 0, 2, 0))
    return f, 2 * i + delta, 2 * j + delta


def to_point_raw(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    f, si, ti = get_center_siti(ids)
    return coords.face_siti_to_xyz(f, si, ti)


def to_point(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    return coords.normalize_xyz(*to_point_raw(ids))


def to_latlng(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return coords.xyz_to_latlng(*to_point_raw(ids))


def get_size_ij(lvl) -> np.ndarray:
    return np.asarray(1, dtype=np.int64) << (MAX_LEVEL - np.asarray(lvl, dtype=np.int64))


def get_bound_uv(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """GetBoundUV (s2cell_id.cc:395-416): (u_lo, u_hi, v_lo, v_hi)."""
    ids = np.asarray(ids, dtype=np.uint64)
    _, i, j, _ = to_face_ij_orientation(ids)
    cell_size = get_size_ij(level(ids))
    i_lo = i & -cell_size
    j_lo = j & -cell_size
    u_lo = coords.st_to_uv(coords.ij_to_st_min(i_lo))
    u_hi = coords.st_to_uv(coords.ij_to_st_min(i_lo + cell_size))
    v_lo = coords.st_to_uv(coords.ij_to_st_min(j_lo))
    v_hi = coords.st_to_uv(coords.ij_to_st_min(j_lo + cell_size))
    return u_lo, u_hi, v_lo, v_hi


# ---------------------------------------------------------------- neighbors
def _from_face_ij_wrap(f: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """FromFaceIJWrap (s2cell_id.cc:458-489), vectorized."""
    i = np.clip(np.asarray(i, dtype=np.int64), -1, MAX_SIZE)
    j = np.clip(np.asarray(j, dtype=np.int64), -1, MAX_SIZE)
    scale = 1.0 / MAX_SIZE
    limit = np.nextafter(1.0, 2.0)  # 1.0 + DBL_EPSILON
    u = np.clip(scale * (2 * (i - MAX_SIZE // 2) + 1), -limit, limit)
    v = np.clip(scale * (2 * (j - MAX_SIZE // 2) + 1), -limit, limit)
    x, y, z = coords.face_uv_to_xyz(f, u, v)
    nf, nu, nv = coords.xyz_to_face_uv(x, y, z)
    return from_face_ij(nf, coords.st_to_ij(0.5 * (nu + 1)), coords.st_to_ij(0.5 * (nv + 1)))


def _from_face_ij_same(
    f: np.ndarray, i: np.ndarray, j: np.ndarray, same: np.ndarray
) -> np.ndarray:
    out = np.empty(np.broadcast(f, i, j).shape, dtype=np.uint64)
    same = np.broadcast_to(same, out.shape)
    f, i, j = (np.broadcast_to(a, out.shape) for a in (f, i, j))
    if same.any():
        out[same] = from_face_ij(f[same], np.clip(i[same], 0, MAX_SIZE - 1), np.clip(j[same], 0, MAX_SIZE - 1))
    wrap = ~same
    if wrap.any():
        out[wrap] = _from_face_ij_wrap(f[wrap], i[wrap], j[wrap])
    return out


def edge_neighbors(ids: np.ndarray) -> np.ndarray:
    """GetEdgeNeighbors (s2cell_id.cc:499-512) → shape (n, 4) uint64."""
    ids = np.asarray(ids, dtype=np.uint64)
    lvl = level(ids)
    size = get_size_ij(lvl)
    f, i, j, _ = to_face_ij_orientation(ids)
    n0 = parent(_from_face_ij_same(f, i, j - size, j - size >= 0), lvl)
    n1 = parent(_from_face_ij_same(f, i + size, j, i + size < MAX_SIZE), lvl)
    n2 = parent(_from_face_ij_same(f, i, j + size, j + size < MAX_SIZE), lvl)
    n3 = parent(_from_face_ij_same(f, i - size, j, i - size >= 0), lvl)
    return np.stack([n0, n1, n2, n3], axis=-1)


def vertex_neighbors(ids: np.ndarray, lvl: int) -> list[np.ndarray]:
    """AppendVertexNeighbors (s2cell_id.cc:514-554).

    Returns per-row lists (3 or 4 cells) as a list of arrays; lvl must be
    strictly less than each id's level.
    """
    ids = np.asarray(ids, dtype=np.uint64)
    f, i, j, _ = to_face_ij_orientation(ids)
    halfsize = get_size_ij(lvl + 1)
    size = halfsize << 1
    ihalf = (i & halfsize) != 0
    jhalf = (j & halfsize) != 0
    ioffset = np.where(ihalf, size, -size)
    joffset = np.where(jhalf, size, -size)
    isame = np.where(ihalf, (i + size) < MAX_SIZE, (i - size) >= 0)
    jsame = np.where(jhalf, (j + size) < MAX_SIZE, (j - size) >= 0)
    out0 = parent(ids, lvl)
    out1 = parent(_from_face_ij_same(f, i + ioffset, j, isame), lvl)
    out2 = parent(_from_face_ij_same(f, i, j + joffset, jsame), lvl)
    out3 = parent(_from_face_ij_same(f, i + ioffset, j + joffset, isame & jsame), lvl)
    has4 = isame | jsame
    return [
        np.array([a, b, c, d][: 4 if h else 3], dtype=np.uint64)
        for a, b, c, d, h in zip(
            out0.tolist(), out1.tolist(), out2.tolist(), out3.tolist(), has4.tolist()
        )
    ]


def all_neighbors(ids: np.ndarray, nbr_level: int) -> list[np.ndarray]:
    """AppendAllNeighbors (s2cell_id.cc:556-598), per-row neighbor arrays.

    All ids must be at level ≤ nbr_level.  Vectorized across rows when all
    rows share one level (the common case in the ring-expansion join).
    """
    ids = np.asarray(ids, dtype=np.uint64)
    lvl = level(ids)
    f, i, j, _ = to_face_ij_orientation(ids)
    size = get_size_ij(lvl)
    i = i & -size
    j = j & -size
    nbr_size = get_size_ij(nbr_level)
    results: list[list[np.ndarray]] = [[] for _ in range(len(ids))]
    # k runs over the same sequence for rows sharing `size`; group by size.
    for sz in np.unique(size):
        rows = np.nonzero(size == sz)[0]
        fs, is_, js = f[rows], i[rows], j[rows]
        nbs = nbr_size[rows] if np.ndim(nbr_size) else np.full(len(rows), nbr_size)
        nb = int(nbs[0])
        cols = []
        k = -nb
        while True:
            if k < 0:
                same_face = (js + k) >= 0
            elif k >= sz:
                same_face = (js + k) < MAX_SIZE
            else:
                same_face = np.ones(len(rows), dtype=bool)
                cols.append(
                    parent(_from_face_ij_same(fs, is_ + k, js - nb, js - sz >= 0), nbr_level)
                )
                cols.append(
                    parent(_from_face_ij_same(fs, is_ + k, js + sz, js + sz < MAX_SIZE), nbr_level)
                )
            cols.append(
                parent(_from_face_ij_same(fs, is_ - nb, js + k, same_face & (is_ - sz >= 0)), nbr_level)
            )
            cols.append(
                parent(_from_face_ij_same(fs, is_ + sz, js + k, same_face & (is_ + sz < MAX_SIZE)), nbr_level)
            )
            if k >= sz:
                break
            k += nb
        stacked = np.stack(cols, axis=-1)
        for local, row in enumerate(rows):
            results[row] = stacked[local]
    return results


def advance_wrap(ids: np.ndarray, steps: np.ndarray) -> np.ndarray:
    """Hilbert-order advance with wraparound (s2cell_id.cc:144-166)."""
    ids = np.asarray(ids, dtype=np.uint64)
    steps = np.asarray(steps, dtype=np.int64).copy()
    shift = (2 * (MAX_LEVEL - level(ids)) + 1).astype(np.uint64)
    step_wrap = (WRAP_OFFSET >> shift).view(np.int64)
    neg = steps < 0
    if neg.any():
        min_steps = -((ids >> shift).astype(np.int64))
        need = neg & (steps < min_steps)
        # C++ % truncates toward zero; numpy % floors — use fmod
        steps[need] = np.fmod(steps[need], step_wrap[need])
        still = neg & (steps < min_steps)
        steps[still] += step_wrap[still]
    pos = ~neg
    if pos.any():
        max_steps = ((WRAP_OFFSET - ids) >> shift).astype(np.int64)
        need = pos & (steps > max_steps)
        steps[need] = np.fmod(steps[need], step_wrap[need])
        still = pos & (steps > max_steps)
        steps[still] -= step_wrap[still]
    return ids + (steps.view(np.uint64) << shift)


def expanded_by_distance_uv(
    u_lo, u_hi, v_lo, v_hi, distance_rad: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """ExpandedByDistanceUV (s2cell_id.cc:418-456): grow a (u,v)-rect just
    enough to include all points within the given on-sphere distance.
    Vectorized over rect arrays; negative distance shrinks (may collapse
    to a degenerate rect at the first corner like the reference)."""
    u_lo, u_hi, v_lo, v_hi = (
        np.asarray(a, dtype=np.float64) for a in (u_lo, u_hi, v_lo, v_hi)
    )
    max_u = np.maximum(np.abs(u_lo), np.abs(u_hi))
    max_v = np.maximum(np.abs(v_lo), np.abs(v_hi))
    sin_dist = np.sin(distance_rad)

    def expand(u, max_w, sd):
        # ExpandEndpoint (s2cell_id.cc:424-439)
        sin_u_shift = sd * np.sqrt((1 + u * u + max_w * max_w) / (1 + u * u))
        cos_u_shift = np.sqrt(np.maximum(1 - sin_u_shift * sin_u_shift, 0.0))
        return (cos_u_shift * u + sin_u_shift) / (cos_u_shift - sin_u_shift * u)

    new_u_lo = expand(u_lo, max_v, -sin_dist)
    new_u_hi = expand(u_hi, max_v, sin_dist)
    new_v_lo = expand(v_lo, max_u, -sin_dist)
    new_v_hi = expand(v_hi, max_u, sin_dist)
    empty = (new_u_lo > new_u_hi) | (new_v_lo > new_v_hi)
    return (
        np.where(empty, u_lo, new_u_lo),
        np.where(empty, u_lo, new_u_hi),
        np.where(empty, v_lo, new_v_lo),
        np.where(empty, v_lo, new_v_hi),
    )
