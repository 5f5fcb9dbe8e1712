"""Port of s2point_index_test.cc: contents + iterator-methods
verification harness, NoPoints / DuplicatePoints / RandomPoints."""

from __future__ import annotations

import numpy as np

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.cellunion import from_begin_end
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.s2point_index import S2PointIndex


class Harness:
    def __init__(self) -> None:
        self.index = S2PointIndex()
        self.contents: list = []

    def add(self, point, data) -> None:
        self.index.add(point, data)
        self.contents.append((tuple(float(x) for x in point), data))

    def remove(self, point, data) -> None:
        self.contents.remove((tuple(float(x) for x in point), data))
        assert self.index.remove(point, data)

    def verify(self) -> None:
        self._verify_contents()
        self._verify_iterator_methods()

    def _verify_contents(self) -> None:
        remaining = list(self.contents)
        it = self.index.iterator()
        while not it.done():
            assert it.point_data() in remaining
            remaining.remove(it.point_data())
            it.next()
        assert remaining == []

    def _verify_iterator_methods(self) -> None:
        # s2point_index_test.cc:66-106
        it = self.index.iterator()
        assert not it.prev()
        it.finish()
        assert it.done()

        prev_cellid = 0
        min_cellid = CID.from_face(0).child_begin(30)
        it.begin()
        while not it.done():
            cellid = it.id()
            p = it.point()
            assert cellid == int(K.from_point(
                np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))[0])
            assert cellid >= prev_cellid

            it2 = self.index.iterator()
            if cellid == prev_cellid:
                it2.seek(cellid)
            if cellid > prev_cellid:
                for skipped in from_begin_end(min_cellid, CID(cellid)):
                    it2.seek(skipped.id)
                    assert not it2.done() and it2.id() == cellid
            if prev_cellid > 0:
                it2 = it.copy()
                assert it2.prev()
                assert it2.id() == prev_cellid
                it2.next()
                assert it2.id() == cellid
                it2.seek(prev_cellid)
                assert it2.id() == prev_cellid
            prev_cellid = cellid
            min_cellid = CID(cellid).next()
            it.next()


def test_no_points():
    Harness().verify()


def test_duplicate_points():
    h = Harness()
    for _ in range(10):
        h.add((1.0, 0.0, 0.0), 123)
    h.verify()
    for _ in range(5):
        h.remove((1.0, 0.0, 0.0), 123)
    h.verify()


def test_random_points():
    # reference uses 100 points and 10 removals; 40/5 keeps the same
    # code paths (multi-cell gaps, duplicate data values) at ~1/5 the
    # quadratic verification cost
    rng = np.random.RandomState(20260818)
    h = Harness()
    pts = rng.randn(40, 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    for i in range(40):
        h.add(tuple(pts[i]), int(rng.randint(0, 100)))
    h.verify()
    for _ in range(5):
        it = h.index.iterator()
        while True:
            # seek to a random leaf cell until we land on an entry
            q = rng.randn(3)
            q /= np.linalg.norm(q)
            leaf = int(K.from_point(np.array([q[0]]), np.array([q[1]]),
                                    np.array([q[2]]))[0])
            it.seek(leaf)
            if not it.done():
                break
        h.remove(it.point(), it.data())
        h.verify()
