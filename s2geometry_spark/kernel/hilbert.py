"""Hilbert-curve lookup tables + vectorized (face,i,j) <-> S2CellId.

Ports the table construction of the reference (s2cell_id.cc:61-115,
s2coords_internal.h:38-81) and the 8-round vectorized encode/decode
(FromFaceIJ s2cell_id.cc:267-307, ToFaceIJOrientation s2cell_id.cc:319-373)
as NumPy gathers.  The two uint16[1024] tables cost 4 KB and are built once
at import (module-level, so each executor builds them once per process).
"""

from __future__ import annotations

import numpy as np

LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2
MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
NUM_FACES = 6
MAX_SIZE = 1 << MAX_LEVEL

# kPosToIJ / kPosToOrientation (s2coords_internal.h:46-81)
POS_TO_IJ = (
    (0, 1, 3, 2),
    (0, 2, 3, 1),
    (3, 2, 0, 1),
    (3, 1, 0, 2),
)
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK)
IJ_TO_POS = (
    (0, 1, 3, 2),
    (0, 3, 1, 2),
    (2, 3, 1, 0),
    (2, 1, 3, 0),
)


def _build_tables() -> tuple[np.ndarray, np.ndarray]:
    """Iterative port of InitLookupCell (s2cell_id.cc:82-115)."""
    pos_tab = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint16)
    ij_tab = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint16)
    for orig in range(4):
        # stack of (level, i, j, pos, orientation)
        stack = [(0, 0, 0, 0, orig)]
        while stack:
            level, i, j, pos, orientation = stack.pop()
            if level == LOOKUP_BITS:
                ij = (i << LOOKUP_BITS) + j
                pos_tab[(ij << 2) + orig] = (pos << 2) + orientation
                ij_tab[(pos << 2) + orig] = (ij << 2) + orientation
            else:
                level += 1
                i <<= 1
                j <<= 1
                pos <<= 2
                r = POS_TO_IJ[orientation]
                for k in range(4):
                    stack.append(
                        (
                            level,
                            i + (r[k] >> 1),
                            j + (r[k] & 1),
                            pos + k,
                            orientation ^ POS_TO_ORIENTATION[k],
                        )
                    )
    return pos_tab, ij_tab


LOOKUP_POS, LOOKUP_IJ = _build_tables()

_U64 = np.uint64
_MASK4 = np.int64(15)


def from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Vectorized FromFaceIJ (s2cell_id.cc:267-307) → uint64 leaf cell ids."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    n = face.astype(np.uint64) << _U64(POS_BITS - 1)
    bits = (face & SWAP_MASK).astype(np.int64)
    for k in range(7, -1, -1):
        bits = bits + (((i >> (k * 4)) & _MASK4) << 6)
        bits = bits + (((j >> (k * 4)) & _MASK4) << 2)
        bits = LOOKUP_POS[bits].astype(np.int64)
        n |= (bits.astype(np.uint64) >> _U64(2)) << _U64(k * 8)
        bits &= SWAP_MASK | INVERT_MASK
    return n * _U64(2) + _U64(1)


def to_face_ij_orientation(
    ids: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized ToFaceIJOrientation (s2cell_id.cc:319-373).

    Returns (face, i, j, orientation) int64 arrays.
    """
    ids = np.asarray(ids, dtype=np.uint64)
    if ids.shape == (1,):
        # scalar fast path: pure-python ints beat 30 one-element numpy
        # ops ~40x — this is the Cell-construction hot loop of the
        # driver-side coverer (identical bit algebra, same LUT)
        idv = int(ids[0])
        face = idv >> POS_BITS
        bits = face & SWAP_MASK
        i = j = 0
        for k in range(7, -1, -1):
            nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
            chunk = (idv >> (k * 8 + 1)) & ((1 << (2 * nbits)) - 1)
            bits += chunk << 2
            bits = int(LOOKUP_IJ[bits])
            i += (bits >> 6) << (k * 4)
            j += ((bits >> 2) & 15) << (k * 4)
            bits &= SWAP_MASK | INVERT_MASK
        if (idv & -idv) & 0x1111111111111110:
            bits ^= SWAP_MASK
        return (
            np.array([face], dtype=np.int64),
            np.array([i], dtype=np.int64),
            np.array([j], dtype=np.int64),
            np.array([bits], dtype=np.int64),
        )
    face = (ids >> _U64(POS_BITS)).astype(np.int64)
    bits = (face & SWAP_MASK).astype(np.int64)
    i = np.zeros_like(face)
    j = np.zeros_like(face)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        chunk = ((ids >> _U64(k * 8 + 1)) & _U64((1 << (2 * nbits)) - 1)).astype(
            np.int64
        )
        bits = bits + (chunk << 2)
        bits = LOOKUP_IJ[bits].astype(np.int64)
        i += (bits >> 6) << (k * 4)
        j += ((bits >> 2) & _MASK4) << (k * 4)
        bits &= SWAP_MASK | INVERT_MASK
    # Suffix parity flips kSwapMask (s2cell_id.cc:357-369).
    lsb = ids & (~ids + _U64(1))
    flip = (lsb & _U64(0x1111111111111110)) != 0
    orientation = np.where(flip, bits ^ SWAP_MASK, bits)
    return face, i, j, orientation
