"""S2PaddedCell (s2padded_cell.h/.cc): an S2Cell whose (u,v) bound is
expanded by a padding margin on all sides — the unit of recursive
subdivision for index construction and edge clipping, with incremental
child construction (one corner from the parent bound, the opposite one
from middle()) and the Hilbert entry/exit vertices of the space-filling
curve.

Rects here are ((u_lo, u_hi), (v_lo, v_hi)) float tuples.
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid as K
from . import coords
from .cid import CID
from .hilbert import IJ_TO_POS, INVERT_MASK, POS_TO_ORIENTATION, SWAP_MASK

MAX_LEVEL = 30
DBL_EPSILON = 2.220446049250313e-16


def _size_ij(level: int) -> int:
    return 1 << (MAX_LEVEL - level)


class PaddedCell:
    __slots__ = ("id", "padding", "bound", "_middle", "ij_lo", "orientation",
                 "level")

    def __init__(self, cid: CID, padding: float):
        """S2PaddedCell(S2CellId, padding) (s2padded_cell.cc:31-57)."""
        self.id = cid
        self.padding = padding
        self._middle = None  # lazy
        if cid.is_face():
            limit = 1 + padding
            self.bound = ((-limit, limit), (-limit, limit))
            self._middle = ((-padding, padding), (-padding, padding))
            self.ij_lo = [0, 0]
            self.orientation = cid.face() & 1
            self.level = 0
        else:
            ids = np.array([cid.id], dtype=np.uint64)
            f, i, j, orient = K.to_face_ij_orientation(ids)
            i, j = int(i[0]), int(j[0])
            self.level = cid.level()
            ij_size = _size_ij(self.level)
            i_lo, j_lo = i & -ij_size, j & -ij_size
            lim = 1.0 / (1 << MAX_LEVEL)
            self.bound = (
                (
                    float(coords.st_to_uv(lim * i_lo)) - padding,
                    float(coords.st_to_uv(lim * (i_lo + ij_size))) + padding,
                ),
                (
                    float(coords.st_to_uv(lim * j_lo)) - padding,
                    float(coords.st_to_uv(lim * (j_lo + ij_size))) + padding,
                ),
            )
            self.ij_lo = [i_lo, j_lo]
            self.orientation = int(orient[0])

    @staticmethod
    def child_of(parent: "PaddedCell", i: int, j: int) -> "PaddedCell":
        """S2PaddedCell(parent, i, j) (s2padded_cell.cc:59-76)."""
        self = object.__new__(PaddedCell)
        self.padding = parent.padding
        self.level = parent.level + 1
        self._middle = None
        pos = IJ_TO_POS[parent.orientation][2 * i + j]
        self.id = parent.id.child(pos)
        ij_size = _size_ij(self.level)
        self.ij_lo = [
            parent.ij_lo[0] + i * ij_size,
            parent.ij_lo[1] + j * ij_size,
        ]
        self.orientation = parent.orientation ^ POS_TO_ORIENTATION[pos]
        mid = parent.middle()
        u = list(parent.bound[0])
        v = list(parent.bound[1])
        u[1 - i] = mid[0][1 - i]
        v[1 - j] = mid[1][1 - j]
        self.bound = (tuple(u), tuple(v))
        return self

    def get_child_ij(self, pos: int) -> tuple[int, int]:
        """GetChildIJ (s2padded_cell.h:77-84)."""
        # kPosToIJ is the inverse of kIJtoPos per orientation
        row = IJ_TO_POS[self.orientation]
        ij_comb = row.index(pos)
        return ij_comb >> 1, ij_comb & 1

    def middle(self):
        """middle() (s2padded_cell.cc:78-89): the padded strip shared by
        the four children."""
        if self._middle is None:
            ij_size = _size_ij(self.level)
            u = float(coords.st_to_uv(coords.siti_to_st(
                2 * self.ij_lo[0] + ij_size)))
            v = float(coords.st_to_uv(coords.siti_to_st(
                2 * self.ij_lo[1] + ij_size)))
            self._middle = (
                (u - self.padding, u + self.padding),
                (v - self.padding, v + self.padding),
            )
        return self._middle

    def get_center(self) -> np.ndarray:
        ij_size = _size_ij(self.level)
        si = 2 * self.ij_lo[0] + ij_size
        ti = 2 * self.ij_lo[1] + ij_size
        x, y, z = coords.face_siti_to_xyz(
            np.array([self.id.face()]), np.array([si]), np.array([ti])
        )
        p = np.array([x[0], y[0], z[0]])
        return p / np.linalg.norm(p)

    def _vertex(self, i: int, j: int) -> np.ndarray:
        x, y, z = coords.face_siti_to_xyz(
            np.array([self.id.face()]), np.array([2 * i]), np.array([2 * j])
        )
        p = np.array([x[0], y[0], z[0]])
        return p / np.linalg.norm(p)

    def get_entry_vertex(self) -> np.ndarray:
        """Hilbert curve entry vertex (s2padded_cell.cc:98-109)."""
        i, j = self.ij_lo
        if self.orientation & INVERT_MASK:
            ij_size = _size_ij(self.level)
            i += ij_size
            j += ij_size
        return self._vertex(i, j)

    def get_exit_vertex(self) -> np.ndarray:
        """Hilbert curve exit vertex (s2padded_cell.cc:111-123)."""
        i, j = self.ij_lo
        ij_size = _size_ij(self.level)
        if self.orientation == 0 or self.orientation == SWAP_MASK + INVERT_MASK:
            i += ij_size
        else:
            j += ij_size
        return self._vertex(i, j)

    def shrink_to_fit(self, rect) -> CID:
        """ShrinkToFit (s2padded_cell.cc:125-169): the smallest cell
        containing `rect` (padded), descending from this cell."""
        ij_size = _size_ij(self.level)
        if self.level == 0:
            if rect[0][0] <= 0 <= rect[0][1] or rect[1][0] <= 0 <= rect[1][1]:
                return self.id
        else:
            cu = float(coords.st_to_uv(coords.siti_to_st(
                2 * self.ij_lo[0] + ij_size)))
            cv = float(coords.st_to_uv(coords.siti_to_st(
                2 * self.ij_lo[1] + ij_size)))
            if rect[0][0] <= cu <= rect[0][1] or rect[1][0] <= cv <= rect[1][1]:
                return self.id
        pad = self.padding + 1.5 * DBL_EPSILON
        padded = (
            (rect[0][0] - pad, rect[0][1] + pad),
            (rect[1][0] - pad, rect[1][1] + pad),
        )
        ij_min = [0, 0]
        ij_xor = [0, 0]
        for d in range(2):
            ij_min[d] = max(
                self.ij_lo[d],
                int(coords.st_to_ij(float(coords.uv_to_st(padded[d][0])))),
            )
            ij_max = min(
                self.ij_lo[d] + ij_size - 1,
                int(coords.st_to_ij(float(coords.uv_to_st(padded[d][1])))),
            )
            ij_xor[d] = ij_min[d] ^ ij_max
        level_msb = ((ij_xor[0] | ij_xor[1]) << 1) + 1
        level = MAX_LEVEL - (level_msb.bit_length() - 1)
        if level <= self.level:
            return self.id
        leaf = K.from_face_ij(
            np.array([self.id.face()]),
            np.array([ij_min[0]]),
            np.array([ij_min[1]]),
        )
        return CID(int(leaf[0])).parent(level)
