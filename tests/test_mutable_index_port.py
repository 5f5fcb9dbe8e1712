"""Port of the mutable_s2shape_index_test.cc content suite against the
EXACT kernel index (tests/test_shape_index_robustness.py covers the
same geometries against the DISTRIBUTED superset index)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel import coords
from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.mutable_index import MutableIndex
from s2geometry_spark.kernel.polyline import _get_frame
from s2geometry_spark.kernel.shapeutil import LaxPolygon, LaxPolyline
from s2geometry_spark.kernel.vector_shapes import (
    EdgeVectorShape,
    PointVectorShape,
)
from tests.test_mutable_index import (
    latlng_pts,
    make_regular_loop,
    norm_ref,
    quadratic_validate,
)


def concentric_loops(center, num_loops: int, num_vertices: int):
    """S2Testing::ConcentricLoopsPolygon (s2testing.cc:109-126)."""
    frame = _get_frame(norm_ref(center))
    loops = []
    for li in range(num_loops):
        radius = 0.005 * (li + 1) / num_loops
        step = 2 * math.pi / num_vertices
        vs = []
        for vi in range(num_vertices):
            a = vi * step
            p = norm_ref([radius * math.cos(a), radius * math.sin(a), 1])
            vs.append(frame @ p)
        loops.append(np.asarray(vs))
    return loops


def test_one_edge():
    # mutable_s2shape_index_test.cc:460-466
    index = MutableIndex()
    index.add(EdgeVectorShape([1, 0, 0], [0, 1, 0]))
    quadratic_validate(index)


def test_shrink_to_fit_optimization():
    # cc:468-480: an 89-degree loop covering almost all of face 0 whose
    # edges all fall in one subcell — the rest of the face must still
    # get interior index entries (the SkipCellRange path)
    index = MutableIndex()
    index.add(LaxPolygon(
        [make_regular_loop(norm_ref([1, 0.5, 0.5]), 89.0, 100)]))
    quadratic_validate(index)
    # interior-only cells must exist outside the edge subcell
    assert any(cc and not eids
               for _, cl in index.cells() for _, cc, eids in cl)


def test_loops_spanning_three_faces():
    # cc:482-496: two concentric 100-vertex loops centered on the cube
    # vertex at the start of the Hilbert curve
    index = MutableIndex()
    for loop in concentric_loops(norm_ref([1, -1, -1]), 2, 100):
        index.add(LaxPolygon([loop]))
    quadratic_validate(index)
    faces = {cid.face() for cid, _ in index.cells()}
    assert len(faces) == 3


def test_many_identical_edges():
    # cc:498-514: 100 copies of one face-diagonal edge — no subdivision
    # (every cell stays at level 0, the short-edge rule)
    a = norm_ref([0.99, 0.99, 1])
    b = norm_ref([-0.99, -0.99, 1])
    index = MutableIndex()
    for i in range(100):
        assert index.add(EdgeVectorShape(a, b)) == i
    quadratic_validate(index)
    for cid, _ in index.cells():
        assert cid.level() == 0


def test_degenerate_edge():
    # cc:516-534: a degenerate edge at a cube-face corner is indexed in
    # exactly 3 leaf cells
    a = norm_ref([1, 1, 1])
    shape = EdgeVectorShape()
    shape.add(a, a)
    index = MutableIndex()
    index.add(shape)
    quadratic_validate(index)
    cells = index.cells()
    assert len(cells) == 3
    for cid, clipped in cells:
        assert cid.is_leaf()
        assert len(clipped) == 1
        assert len(clipped[0][2]) == 1


def test_many_tiny_edges():
    # cc:536-556: 100 edges inside one leaf cell — subdivision stops at
    # the leaf; exactly one index cell results
    leaf = K.from_point(np.array([1.0]) / math.sqrt(1.0),
                        np.array([0.0]), np.array([0.0]))
    x, y, z = K.to_point(leaf)
    a = np.array([x[0], y[0], z[0]])
    b = norm_ref(a + np.array([0, 1e-12, 0]))
    shape = EdgeVectorShape()
    for _ in range(100):
        shape.add(a, b)
    index = MutableIndex()
    index.add(shape)
    quadratic_validate(index)
    cells = index.cells()
    assert len(cells) == 1
    assert cells[0][0].is_leaf()


def test_mixed_geometry():
    # cc:695-714: interior tracking of one tiny loop must not leak
    # interior state onto the polylines — face 1 stays empty
    index = MutableIndex()
    index.add(LaxPolyline(latlng_pts("0:0, 2:1, 0:2, 2:3, 0:4, 2:5, 0:6")))
    index.add(LaxPolyline(latlng_pts("1:0, 3:1, 1:2, 3:3, 1:4, 3:5, 1:6")))
    index.add(LaxPolyline(latlng_pts("2:0, 4:1, 2:2, 4:3, 2:4, 4:5, 2:6")))
    begin_leaf = Cell(CID.from_face(0).child_begin(30))
    loop = np.stack([begin_leaf.get_vertex(k) for k in range(4)])
    index.add(LaxPolygon([loop]))
    quadratic_validate(index)
    assert all(cid.face() != 1 for cid, _ in index.cells())


def test_linear_space():
    # cc:715-757: with max_edges_per_cell=1, O(n) long edges plus point
    # clusters must stay linear — cell count bounded by cluster count
    index = MutableIndex(max_edges_per_cell=1)
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    num_edges = 100
    edges_per_cluster = 2
    num_clusters = (num_edges // 2) // edges_per_cluster
    for _ in range(num_edges // 2):
        index.add(EdgeVectorShape(a, b))
    for k in range(num_clusters):
        t = k / (num_clusters - 1.0)
        theta = t * (math.pi / 2)  # a⊥b: slerp is a circular arc
        p = norm_ref(math.cos(theta) * a + math.sin(theta) * b)
        index.add(PointVectorShape([p] * edges_per_cluster))
    quadratic_validate(index)
    assert len(index.cells()) <= num_clusters


def test_long_index_entries_bound():
    # cc:759-791: the worst-case c2 = 366 long-entry bound is achieved
    # exactly: two copies of a 6-leaf-long edge plus a full polygon
    index = MutableIndex(max_edges_per_cell=1)
    ax, ay, az = coords.face_siti_to_xyz(
        np.array([0]), np.array([0]), np.array([(1 << 30) + 0]))
    bx, by, bz = coords.face_siti_to_xyz(
        np.array([0]), np.array([0]), np.array([(1 << 30) + 6]))
    a = norm_ref([ax[0], ay[0], az[0]])
    b = norm_ref([bx[0], by[0], bz[0]])
    for _ in range(2):
        index.add(EdgeVectorShape(a, b))
    index.add(LaxPolygon([np.zeros((0, 3))]))  # full polygon
    assert len(index.cells()) == 366


def test_simple_updates():
    # cc:558-573: add 5 loops one at a time, then release them one at a
    # time, validating at each step (this engine rebuilds — the final
    # state per step must be identical to the reference's lazy updates)
    index = MutableIndex()
    loops = concentric_loops(norm_ref([1, 0.5, 0.25]), 5, 16)
    for loop in loops:
        index.add(LaxPolygon([loop]))
        quadratic_validate(index)
    for sid in range(len(loops)):
        index.release(sid)
        quadratic_validate(index)
    assert index.cells() == []


def test_shape_containing_origin():
    # cc:793-811 (add half): a small loop around the InteriorTracker
    # origin — containment state must start True
    origin = norm_ref(
        np.array(coords.face_uv_to_xyz(
            np.array([0]), np.array([-1.0]), np.array([-1.0])))
        .reshape(3))
    index = MutableIndex()
    index.add(LaxPolygon([make_regular_loop(origin, 1.0, 16)]))
    quadratic_validate(index)
