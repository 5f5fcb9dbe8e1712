"""Ports of the internal-helper suites: s2disjoint_set_test.cc and
s2index_cell_data_test.cc (src/s2/internal/)."""

from __future__ import annotations

import numpy as np

from s2geometry_spark.kernel import coords
from s2geometry_spark.kernel.disjoint_set import DisjointSet
from s2geometry_spark.kernel.index_cell_data import IndexCellData
from s2geometry_spark.kernel.mutable_index import MutableIndex
from s2geometry_spark.kernel.shapeutil import LaxPolygon, LaxPolyline
from s2geometry_spark.kernel.vector_shapes import PointVectorShape


def pts(spec: str) -> np.ndarray:
    out = []
    for tok in spec.split(","):
        lat, lng = (float(x) for x in tok.strip().split(":"))
        x, y, z = coords.latlng_to_xyz(np.array([lat]), np.array([lng]))
        v = np.array([x[0], y[0], z[0]])
        out.append(v / np.linalg.norm(v))
    return np.asarray(out)


# ------------------------------------------------------------ DisjointSet


def test_point_set_compiles():
    """DisjointSetTest.S2PointSetCompiles (test.cc:30-33): hashable
    point keys work."""
    s = DisjointSet()
    assert s.add(tuple(pts("1:1")[0]))


def test_insert_more_than_once_fails():
    """DisjointSetTest.InsertMoreThanOnceFails (test.cc:35-40)."""
    s = DisjointSet()
    assert s.add(1)
    assert not s.add(1)
    assert not s.add(1)


def test_find_root_works():
    """DisjointSetTest.FindRootWorks (test.cc:42-49)."""
    s = DisjointSet()
    s.add(1)
    assert s.find_root(1) == 1
    assert s.find_root(2) is None


def test_union_works():
    """DisjointSetTest.UnionWorks (test.cc:51-86)."""
    s = DisjointSet()
    for i in range(10):
        assert s.add(i)
    for i in range(4):
        assert s.union_(i, i + 1)
        assert s.union_(i + 5, i + 6)
    for i in range(5):
        assert s.find_root(i) == 0
        assert s.find_root(i + 5) == 5
    assert not s.union_(0, 13)
    assert not s.union_(13, 0)
    assert not s.union_(12, 13)
    assert s.union_(3, 7)
    for i in range(10):
        assert s.find_root(i) == 0


def test_size_and_clear_works():
    """DisjointSetTest.SizeAndClearWorks (test.cc:88-105)."""
    s = DisjointSet()
    for i in range(10):
        assert s.add(i)
    assert s.size() == 10
    for i in range(s.size() - 1):
        assert s.union_(i, i + 1)
    assert s.size() == 10
    s.clear()
    assert s.size() == 0


# ---------------------------------------------------------- IndexCellData


def test_accessors():
    """S2IndexCellData.Accessors (s2index_cell_data_test.cc:40-52)."""
    index = MutableIndex()
    index.add(PointVectorShape(pts("0:0")))
    cid, clipped = index.cells()[0]
    data = IndexCellData()
    data.load_cell(index, cid, clipped)
    assert data.index() is index
    assert data.num_clipped() == 1


def test_dimension_filtering_works():
    """S2IndexCellData.DimensionFilteringWorks (test.cc:54-141)."""
    index = MutableIndex()
    index.add(PointVectorShape(pts("0:0")))
    index.add(LaxPolyline(pts("1:1, 2:2")))
    index.add(LaxPolygon([pts("1:0, 0:1, -1:0, 0:-1")]))
    cid, clipped = index.cells()[0]

    # All dimensions by default.
    data = IndexCellData()
    data.load_cell(index, cid, clipped)
    assert data.dim_edges(0) and data.dim_edges(1) and data.dim_edges(2)

    # No dimensions: nothing decoded.
    data = IndexCellData()
    for d in range(3):
        data.set_dim_wanted(d, False)
    data.load_cell(index, cid, clipped)
    assert not data.dim_edges(0) and not data.dim_edges(1) and not data.dim_edges(2)

    # Ranges work even when a dimension is off.
    data = IndexCellData()
    data.set_dim_wanted(0, False)
    data.load_cell(index, cid, clipped)
    assert not data.dim_range_edges(0, 0)
    assert data.dim_range_edges(0, 2)

    for wanted in [(False, True, False), (True, False, True),
                   (True, False, False), (False, False, True)]:
        data = IndexCellData()
        for d in range(3):
            data.set_dim_wanted(d, wanted[d])
        data.load_cell(index, cid, clipped)
        for d in range(3):
            assert bool(data.dim_edges(d)) == wanted[d]


def test_cell_and_center_recomputed():
    """S2IndexCellData.CellAndCenterRecomputed (test.cc:142-174)."""
    index = MutableIndex()
    index.add(LaxPolyline(pts("0:0, 0:-90")))
    cells = index.cells()
    assert len(cells) >= 2

    data = IndexCellData()
    data.load_cell(index, cells[0][0], cells[0][1])
    center0, cell0 = data.center(), data.cell()

    data.load_cell(index, cells[1][0], cells[1][1])
    center1, cell1 = data.center(), data.cell()
    assert cell0.id != cell1.id
    assert not np.array_equal(center0, center1)

    # Reloading the same cell changes nothing (no-op fast path).
    data.load_cell(index, cells[1][0], cells[1][1])
    assert data.cell() is cell1 or data.cell().id == cell1.id
    assert np.array_equal(data.center(), center1)


def test_shape_contains():
    """ShapeContains over the decoded cell (s2index_cell_data.cc:161-208):
    center→point parity agrees with brute-force containment for points
    inside the loaded cell."""
    index = MutableIndex()
    # CCW diamond around 0:0 (the face-0 center).
    index.add(LaxPolygon([pts("1:0, 0:-1, -1:0, 0:1")]))
    from s2geometry_spark.kernel import cellid as ci

    probes = [(pts("0:0")[0], True), (pts("5:5")[0], False)]
    tested = 0
    for cid, clipped in index.cells():
        data = IndexCellData()
        data.load_cell(index, cid, clipped)
        clip = clipped[0]
        lo, hi = int(cid.range_min().id), int(cid.range_max().id)
        for pt, want in probes:
            leaf = int(ci.from_point(*[np.array([c]) for c in pt])[0])
            if lo <= leaf <= hi:
                assert data.shape_contains(clip, pt) == want
                tested += 1
    assert tested == 2
