"""Port of s2cell_index_test.cc over the range-node / cell-tree
structure in kernel/cell_index (RangeIterator, NonEmptyRangeIterator,
ContentsIterator, CellIterator, VisitIntersectingCells,
GetIntersectingLabels)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel import cellid as CI
from s2geometry_spark.kernel.cell_index import (
    _BEGIN_LEAF,
    _END_LEAF,
    CellIndex,
    CellIterator,
    ContentsIterator,
    NonEmptyRangeIterator,
    RangeIterator,
)
from s2geometry_spark.kernel.cellunion import normalize
from s2geometry_spark.kernel.cid import CID


def cid(s: str) -> CID:
    return CID(int(np.asarray(CI.from_debug_string(s)).reshape(-1)[0]))


class Harness:
    """S2CellIndexTest (test.cc:57-225)."""

    def __init__(self):
        self.index = CellIndex()
        self.contents: list[tuple[int, int]] = []

    def add(self, cell, label: int):
        if isinstance(cell, str):
            cell = cid(cell)
        self.index.add(cell, label)
        self.contents.append((cell.id, label))

    def add_union(self, union: list[CID], label: int):
        self.index.add_cell_union(union, label)
        for c in union:
            self.contents.append((c.id, label))

    def quadratic_validate(self):
        self.index.build()
        self.verify_cell_iterator()
        self.verify_index_contents()
        self.verify_range_iterators()

    def verify_cell_iterator(self):
        actual = []
        it = CellIterator(self.index)
        while not it.done():
            actual.append((it.cell_id(), it.label()))
            it.next()
        assert sorted(actual) == sorted(self.contents)

    def verify_range_iterators(self):
        it = RangeIterator(self.index)
        it.begin()
        it.finish()
        assert it.done()
        non_empty = NonEmptyRangeIterator(self.index)
        non_empty.begin()
        non_empty.finish()
        assert non_empty.done()

        prev_start = None
        ne_prev_start = None
        it.begin()
        non_empty.begin()
        while not it.done():
            it2 = RangeIterator(self.index)
            start = it.start_id()
            it2.seek(it.start_id())
            assert it2.start_id() == start
            it2.seek(it.limit_id() - 2)
            assert it2.start_id() == start

            ne2 = NonEmptyRangeIterator(self.index)
            ne_start = non_empty.start_id()
            ne2.seek(it.start_id())
            assert ne2.start_id() == ne_start
            ne2.seek(it.limit_id() - 2)
            assert ne2.start_id() == ne_start

            if it2.prev():
                assert it2.start_id() == prev_start
                it2.next()
                assert it2.start_id() == start
            else:
                assert it2.start_id() == start
                assert prev_start is None

            if ne2.prev():
                assert ne2.start_id() == ne_prev_start
                ne2.next()
                assert ne2.start_id() == ne_start
            else:
                assert ne2.start_id() == ne_start
                assert ne_prev_start is None

            if not it.is_empty():
                assert it.start_id() == non_empty.start_id()
                assert it.limit_id() == non_empty.limit_id()
                assert not non_empty.done()
                ne_prev_start = ne_start
                non_empty.next()
            prev_start = start
            it.next()
        assert non_empty.done()

    def verify_index_contents(self):
        min_cell_id = _BEGIN_LEAF
        rng = RangeIterator(self.index)
        rng.begin()
        while not rng.done():
            assert rng.start_id() == min_cell_id
            assert rng.limit_id() > min_cell_id
            assert rng.limit_id() % 2 == 1  # leaf ids are odd
            min_cell_id = rng.limit_id()

            expected = []
            for cid_i, label in self.contents:
                c = CID(cid_i)
                if (
                    c.range_min().id <= rng.start_id()
                    and c.range_max().id + 2 >= rng.limit_id()
                ):
                    expected.append((cid_i, label))
                else:
                    assert not (
                        c.range_min().id <= rng.limit_id() - 2
                        and c.range_max().id >= rng.start_id()
                    )
            actual = []
            contents = ContentsIterator(self.index)
            contents.start_union(rng)
            while not contents.done():
                actual.append((contents.cell_id(), contents.label()))
                contents.next()
            assert sorted(expected) == sorted(actual)
            rng.next()
        assert min_cell_id == _END_LEAF

    def test_intersection(self, target: list[CID]):
        """TestIntersection (test.cc:360-377)."""
        target = sorted(target, key=lambda c: c.id)
        expected = []
        expected_labels = set()
        it = CellIterator(self.index)
        while not it.done():
            c = CID(it.cell_id())
            if any(
                c.range_min().id <= t.range_max().id
                and c.range_max().id >= t.range_min().id
                for t in target
            ):
                expected.append((it.cell_id(), it.label()))
                expected_labels.add(it.label())
            it.next()
        norm_target = normalize(list(target))
        actual = []
        self.index.visit_intersecting_cells(
            norm_target,
            lambda cell_id, label: (actual.append((cell_id, label)), True)[1],
        )
        assert sorted(expected) == sorted(actual)
        assert self.index.get_intersecting_labels(norm_target) == (
            expected_labels
        )


def test_empty():
    Harness().quadratic_validate()


def test_one_face_cell():
    h = Harness()
    h.add("0/", 0)
    h.quadratic_validate()


def test_one_leaf_cell():
    h = Harness()
    h.add("1/012301230123012301230123012301", 12)
    h.quadratic_validate()


def test_duplicate_values():
    h = Harness()
    h.add("0/", 0)
    h.add("0/", 0)
    h.add("0/", 1)
    h.add("0/", 17)
    h.quadratic_validate()


def test_disjoint_cells():
    h = Harness()
    h.add("0/", 0)
    h.add("3/", 0)
    h.quadratic_validate()


def test_nested_cells():
    h = Harness()
    for s, label in (
        ("1/", 3), ("1/0", 15), ("1/000", 9), ("1/00000", 11),
        ("1/012", 6), ("1/01212", 5), ("1/312", 17), ("1/31200", 4),
        ("1/3120000", 10), ("1/333", 20), ("1/333333", 18),
        ("5/", 3), ("5/3", 31), ("5/3333", 27),
    ):
        h.add(s, label)
    h.quadratic_validate()


def _random_cell_id(rng) -> CID:
    level = int(rng.integers(0, 31))
    face = int(rng.integers(0, 6))
    pos = int(rng.integers(0, 1 << 61))
    raw = ((face << 61) | pos) & ((1 << 64) - 1)
    return CID(raw | 1).parent(level)


def _random_union(rng) -> list[CID]:
    return [_random_cell_id(rng) for _ in range(10)]


def test_random_cell_unions():
    """test.cc:284-294 (40 unions instead of 100 — the quadratic
    validator is O(ranges × contents))."""
    rng = np.random.default_rng(20260818)
    h = Harness()
    for i in range(40):
        h.add_union(_random_union(rng), i)
    h.quadratic_validate()


def test_contents_iterator_suppresses_duplicates():
    """test.cc:315-356."""
    h = Harness()
    for s, label in (
        ("2/1", 1), ("2/1", 2), ("2/10", 3), ("2/100", 4), ("2/102", 5),
        ("2/1023", 6), ("2/31", 7), ("2/313", 8), ("2/3132", 9),
        ("3/1", 10), ("3/12", 11), ("3/13", 12),
    ):
        h.add(s, label)
    h.quadratic_validate()

    contents = ContentsIterator(h.index)

    def expect_contents(target_str, expected):
        rng = RangeIterator(h.index)
        rng.seek(cid(target_str).range_min().id)
        actual = []
        contents.start_union(rng)
        while not contents.done():
            actual.append((contents.cell_id(), contents.label()))
            contents.next()
        exp = sorted((cid(s).id, label) for s, label in expected)
        assert sorted(actual) == exp, target_str

    expect_contents("1/123", [])
    expect_contents(
        "2/100123",
        [("2/1", 1), ("2/1", 2), ("2/10", 3), ("2/100", 4)],
    )
    expect_contents("2/100123", [])
    expect_contents("2/10232", [("2/102", 5), ("2/1023", 6)])
    expect_contents("2/313", [("2/31", 7), ("2/313", 8)])
    expect_contents("2/3132333", [("2/3132", 9)])
    expect_contents("2/213", [])
    expect_contents("3/1232", [("3/1", 10), ("3/12", 11)])
    expect_contents("3/133210", [("3/13", 12)])
    expect_contents("3/133210", [])
    expect_contents("5/0", [])
    # moving backwards re-reports previously seen values
    expect_contents("3/13221", [("3/1", 10), ("3/13", 12)])
    expect_contents("2/31112", [("2/31", 7)])


def test_intersection_optimization():
    """test.cc:387-398."""
    h = Harness()
    h.add("1/001", 1)
    h.add("1/333", 2)
    h.add("2/00", 3)
    h.add("2/0232", 4)
    h.index.build()
    h.test_intersection([cid("1/010"), cid("1/3")])
    h.test_intersection([cid("2/010"), cid("2/011"), cid("2/02")])


def test_intersection_random_unions():
    """test.cc:400-414 (40 unions / 80 queries)."""
    rng = np.random.default_rng(11)
    h = Harness()
    for i in range(40):
        h.add_union(_random_union(rng), i)
    h.index.build()
    for _ in range(80):
        h.test_intersection(_random_union(rng))


def test_intersection_semi_random_unions():
    """test.cc:416-436 (60 iterations)."""
    rng = np.random.default_rng(12)
    for _ in range(60):
        h = Harness()
        c = cid("1/0123012301230123")
        target = []
        for i in range(100):
            if rng.random() < 0.1:
                h.add(c, i)
            if rng.random() < 0.25:
                target.append(c)
            if rng.random() < 0.5:
                nxt = c.next()
                c = nxt if nxt.is_valid() else CID.from_face(0).child_begin(
                    c.level()
                )
            if rng.random() < 1 / 6 and not c.is_face():
                c = c.parent()
            if rng.random() < 1 / 6 and not c.is_leaf():
                c = c.child_begin()
        h.index.build()
        if target:
            h.test_intersection(target)
