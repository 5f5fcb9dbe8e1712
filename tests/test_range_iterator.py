"""Port of s2cell_range_iterator_test.cc: Relation/Next/Locate and
empty-index seek behavior over point-index cells."""

import numpy as np

from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.range_iterator import (
    DISJOINT,
    INDEXED,
    SUBDIVIDED,
    CellRangeIterator,
    ListCellIterator,
    make_range_iterator_for_points,
)

THREE_FACES = "0:0, 0:90, 90:0"  # one point each on faces 0, 1, 2


def _it():
    return make_range_iterator_for_points(parse_points(THREE_FACES))


def test_relation():
    """s2cell_range_iterator_test.cc:34-46."""
    it0 = _it()
    it1 = _it()
    it1.next()
    assert it0.relation(it1) == -1
    assert it1.relation(it0) == +1
    it1.prev()
    assert it1.relation(it0) == 0
    it1.finish()
    assert it1.relation(it0) == +1


def test_next():
    """s2cell_range_iterator_test.cc:48-61."""
    it = _it()
    assert it.id().face() == 0
    it.next()
    assert it.id().face() == 1
    it.next()
    assert it.id().face() == 2
    it.next()
    assert it.id() == CID.sentinel()
    assert it.done()


def test_locate():
    """s2cell_range_iterator_test.cc:63-72."""
    it0 = _it()
    it1 = _it()
    it0.next()
    it1.locate(it0)
    assert it1.id() == it0.id()


def test_locate_cell_relations():
    """S2CellRelation Locate(S2CellId): indexed / subdivided /
    disjoint across the index-cell hierarchy."""
    it = _it()
    indexed_cell = it.id()
    # The indexed cell itself and any descendant are INDEXED.
    assert it.locate_cell(indexed_cell) == INDEXED
    if not indexed_cell.is_leaf():
        assert it.locate_cell(indexed_cell.child(0)) == INDEXED
    # An ancestor containing the indexed cell is SUBDIVIDED.
    if indexed_cell.level() > 0:
        assert it.locate_cell(indexed_cell.parent(0)) == SUBDIVIDED
    # A cell on an empty face is DISJOINT.
    assert it.locate_cell(CID.from_face(4)) == DISJOINT


def test_empty_index():
    """s2cell_range_iterator_test.cc:74-93."""
    empty = make_range_iterator_for_points(np.zeros((0, 3)))
    non_empty = make_range_iterator_for_points(parse_points("0:0"))
    assert not non_empty.done()
    assert empty.done()

    empty.seek_to(non_empty)
    assert empty.done()
    empty.seek_beyond(non_empty)
    assert empty.done()
    empty.seek_to(empty)
    assert empty.done()
    empty.seek_beyond(empty)
    assert empty.done()


def test_seek_to_and_beyond():
    """SeekTo: first overlapping-or-following cell; SeekBeyond: first
    entirely-following cell (s2cell_range_iterator.h:226-252)."""
    it0 = _it()
    it1 = _it()
    it1.seek_to(it0)  # it0 at first cell -> it1 lands on the same cell
    assert it1.relation(it0) == 0
    it1.seek_beyond(it0)
    assert it1.relation(it0) == +1
    it0.finish()
    it1.seek_to(it0)
    assert it1.done()


def test_list_iterator_seek_semantics():
    """Seek positions at the first cell with id() >= target
    (s2cell_iterator.h:106-108)."""
    cells = [CID.from_face(0), CID.from_face(2), CID.from_face(4)]
    it = ListCellIterator(cells)
    it.seek(CID.from_face(1))
    assert it.id() == CID.from_face(2)
    it.seek(CID.from_face(2))
    assert it.id() == CID.from_face(2)
    it.seek(CID.from_face(5))
    assert it.done()
    rng = CellRangeIterator(ListCellIterator(cells))
    assert rng.range_min() == CID.from_face(0).range_min()
    assert rng.range_max() == CID.from_face(0).range_max()
