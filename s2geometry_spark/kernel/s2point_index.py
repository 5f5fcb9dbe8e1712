"""S2PointIndex (s2point_index.h:36-220): points + client data sorted
by leaf S2CellId, with a seekable iterator.

The distributed analog is a DataFrame sorted/bucketed by leaf cell id
(operators/knn.py builds exactly that); this kernel container exists
for parity with the reference's iterator contract (s2point_index_test).
Multimap semantics: duplicate (point, data) entries are kept.
"""

from __future__ import annotations

import bisect

import numpy as np

from . import cellid as K


def _leaf(point) -> int:
    p = np.asarray(point, dtype=np.float64)
    return int(K.from_point(np.array([p[0]]), np.array([p[1]]),
                            np.array([p[2]]))[0])


class S2PointIndex:
    def __init__(self) -> None:
        # sorted list of (cell_id, point tuple, data)
        self._entries: list[tuple[int, tuple, object]] = []

    def add(self, point, data=None) -> None:
        p = np.asarray(point, dtype=np.float64)
        entry = (_leaf(p), (float(p[0]), float(p[1]), float(p[2])), data)
        bisect.insort(self._entries, entry, key=lambda e: e[0])

    def remove(self, point, data=None) -> bool:
        """Removes ONE copy of (point, data); returns False if absent."""
        p = np.asarray(point, dtype=np.float64)
        cid = _leaf(p)
        key = (float(p[0]), float(p[1]), float(p[2]))
        i = bisect.bisect_left(self._entries, cid, key=lambda e: e[0])
        while i < len(self._entries) and self._entries[i][0] == cid:
            if self._entries[i][1] == key and self._entries[i][2] == data:
                del self._entries[i]
                return True
            i += 1
        return False

    def num_points(self) -> int:
        return len(self._entries)

    def __iter__(self):
        return iter(self._entries)

    def iterator(self) -> "Iterator":
        return Iterator(self)


class Iterator:
    """s2point_index.h:120-220: Begin/Finish/Seek/Next/Prev/done."""

    def __init__(self, index: S2PointIndex) -> None:
        self._e = index._entries
        self._pos = 0

    def begin(self) -> None:
        self._pos = 0

    def finish(self) -> None:
        self._pos = len(self._e)

    def done(self) -> bool:
        return self._pos >= len(self._e)

    def id(self) -> int:
        return self._e[self._pos][0]

    def point(self) -> np.ndarray:
        return np.asarray(self._e[self._pos][1])

    def data(self):
        return self._e[self._pos][2]

    def point_data(self):
        return (self._e[self._pos][1], self._e[self._pos][2])

    def next(self) -> None:
        self._pos += 1

    def prev(self) -> bool:
        """Positions at the previous entry; False at the beginning."""
        if self._pos == 0:
            return False
        self._pos -= 1
        return True

    def seek(self, target_cellid: int) -> None:
        """First entry with id() >= target (end if none)."""
        self._pos = bisect.bisect_left(self._e, int(target_cellid),
                                       key=lambda e: e[0])

    def copy(self) -> "Iterator":
        it = Iterator.__new__(Iterator)
        it._e = self._e
        it._pos = self._pos
        return it
