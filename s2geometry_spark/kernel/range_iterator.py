"""S2CellRangeIterator (s2cell_range_iterator.h): an S2CellIterator
decorator that tracks the leaf-cell range [range_min, range_max] of the
current index cell, with relation/seek/locate queries between two
iterators.  The underlying iterator here walks a sorted list of index
cell ids (the kernel-side stand-in for MutableS2ShapeIndex::Iterator;
the engine's scale path keeps index cells in DataFrames)."""

from __future__ import annotations

from .cid import CID

# S2CellRelation (s2cell_iterator.h)
INDEXED = 0
SUBDIVIDED = 1
DISJOINT = 2


class ListCellIterator:
    """S2CellIterator over a sorted list of index cell ids."""

    def __init__(self, cells: list[CID]):
        self.cells = sorted(cells, key=lambda c: c.id)
        self.pos = 0

    def begin(self) -> None:
        self.pos = 0

    def finish(self) -> None:
        self.pos = len(self.cells)

    def done(self) -> bool:
        return self.pos >= len(self.cells)

    def id(self) -> CID:
        if self.done():
            return CID.sentinel()
        return self.cells[self.pos]

    def next(self) -> None:
        if self.pos < len(self.cells):
            self.pos += 1

    def prev(self) -> bool:
        if self.pos > 0:
            self.pos -= 1
            return True
        return False

    def seek(self, target: CID) -> None:
        """Position at the first cell with id() >= target, or the end
        (s2cell_iterator.h:106-108)."""
        lo, hi = 0, len(self.cells)
        while lo < hi:
            mid = (lo + hi) // 2
            if self.cells[mid].id < target.id:
                lo = mid + 1
            else:
                hi = mid
        self.pos = lo


class CellRangeIterator:
    """S2CellRangeIterator (s2cell_range_iterator.h:41-260)."""

    def __init__(self, it: ListCellIterator):
        self.it = it
        self.begin()

    def _refresh(self) -> None:
        if self.done():
            s = CID.sentinel()
            self._range_min = s.range_min()
            self._range_max = s.range_max()
        else:
            cid = self.it.id()
            self._range_min = cid.range_min()
            self._range_max = cid.range_max()

    # ---- S2CellIterator API
    def begin(self) -> None:
        self.it.begin()
        self._refresh()

    def next(self) -> None:
        self.it.next()
        self._refresh()

    def prev(self) -> bool:
        status = self.it.prev()
        self._refresh()
        return status

    def seek(self, target: CID) -> None:
        self.it.seek(target)
        self._refresh()

    def finish(self) -> None:
        self.it.finish()
        self._refresh()

    def done(self) -> bool:
        return self.it.done()

    def id(self) -> CID:
        return self.it.id()

    def range_min(self) -> CID:
        return self._range_min

    def range_max(self) -> CID:
        return self._range_max

    # ---- range queries
    def relation(self, b: "CellRangeIterator") -> int:
        """-1 entirely precedes, +1 entirely follows, 0 overlap
        (s2cell_range_iterator.h:62-70)."""
        if self.range_max() < b.range_min():
            return -1
        if self.range_min() > b.range_max():
            return +1
        return 0

    def locate_cell(self, target: CID) -> int:
        """S2CellRelation Locate(S2CellId)
        (s2cell_range_iterator.h:172-199)."""
        self.seek(target.range_min())
        if not self.done():
            if self.id() >= target and self.range_min() <= target:
                return INDEXED
            if self.id() <= target.range_max():
                return SUBDIVIDED
        if self.prev() and self.range_max() >= target:
            return INDEXED
        return DISJOINT

    def locate(self, target: "CellRangeIterator") -> int:
        """Locate(S2CellRangeIterator) (s2cell_range_iterator.h:202-224)."""
        self.seek(target.range_min())
        if not self.done():
            if self.id() >= target.id() and self.range_min() <= target.id():
                return INDEXED
            if self.id() <= target.range_max():
                return SUBDIVIDED
        if self.prev() and self.range_max() >= target.id():
            return INDEXED
        return DISJOINT

    def seek_to(self, target: "CellRangeIterator") -> None:
        """First cell that overlaps or follows target
        (s2cell_range_iterator.h:226-241)."""
        self.seek(target.range_min())
        if self.done() or self.range_min() > target.range_max():
            if self.prev() and self.range_max() < target.id():
                self.next()
        self._refresh()

    def seek_beyond(self, target: "CellRangeIterator") -> None:
        """First cell that entirely follows target
        (s2cell_range_iterator.h:243-252)."""
        self.seek(target.range_max().next())
        if not self.done() and self.range_min() <= target.range_max():
            self.next()
        self._refresh()


def make_range_iterator_for_points(points) -> CellRangeIterator:
    """MakeS2CellRangeIterator over the index cells of a point set
    (the MakeIndexOrDie("pts # #") shape of the reference tests)."""
    import numpy as np

    from .region import ShapeRegion
    from .shape_index_cells import build_index_cells

    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    cells = (build_index_cells([ShapeRegion(points=pts)])
             if len(pts) else [])
    return CellRangeIterator(ListCellIterator(cells))
