"""Port of s2polygon_test.cc robustness cases: UnionWithAmbgiuousCrossings,
DegeneratePointIntersection, TestApproxContainsAndDisjoint, and
InitToCellUnionBorder (iteration counts reduced from 10k/200 to keep the
pytest budget; the per-iteration checks are the reference's)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import booleans as B
from s2geometry_spark.kernel import cellid as cid_np
from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.contains import Loop, Polygon


def test_union_with_ambiguous_crossings():
    """UnionWithAmbgiuousCrossings (test.cc): two sliver triangles whose
    boundaries cross ambiguously at double precision — the union must
    not come out empty."""
    a_vertices = np.array([
        [0.044856812877680216, -0.80679210859571904, 0.5891301722422051],
        [0.044851868273159699, -0.80679240802900054, 0.5891301386444033],
        [0.044854246527738666, -0.80679240292188514, 0.58912996457145106],
    ])
    b_vertices = np.array([
        [0.044849715793028468, -0.80679253837178111, 0.58913012401412856],
        [0.044855344598821352, -0.80679219751320641, 0.589130162266992],
        [0.044854017712818696, -0.80679210327223405, 0.58913039235179754],
    ])
    a = Polygon([Loop(a_vertices)])
    b = Polygon([Loop(b_vertices)])
    c = B.boolean_op_snapped(a, b, "union")
    assert not c.is_empty


def test_degenerate_point_intersection():
    """DegeneratePointIntersection (test.cc): a polyline grazing the
    southern tip of a triangle — the boolean intersection is non-empty
    (a degenerate point/line), matching S2BooleanOperation::IsEmpty."""
    from s2geometry_spark.kernel.mixed import mixed_boolean_op, parse_mixed

    polygon = parse_mixed("# # 1:-1, 0:0, 1:1")
    polyline = parse_mixed("# 1e-15:-1, 1e-15:1 #")
    got = mixed_boolean_op(polygon, polyline, "intersection")
    assert not got.is_empty


def _random_cell_id(rng: np.random.RandomState, level: int) -> CID:
    """s2random::CellId: a random cell at the given level."""
    face = rng.randint(6)
    c = CID.from_face(face)
    for _ in range(level):
        c = c.child(rng.randint(4))
    return c


def test_approx_contains_and_disjoint():
    """TestApproxContainsAndDisjoint (test.cc): intersect a level-10
    cell polygon with one child's polygon; the exact result may stick
    slightly outside either input or overlap the adjacent disjoint
    child, but ApproxContains / ApproxDisjoint at kIntersectionMergeRadius
    must ALWAYS hold.  (Reference runs 10k iterations; 300 here.)"""
    merge_radius = 2 * B._INTERSECTION_ERROR  # kIntersectionMergeRadius

    rng = np.random.RandomState(20260818)
    for _ in range(300):
        cid = _random_cell_id(rng, 10)

        def cell_poly(c: CID) -> Polygon:
            cell = Cell(c)
            return Polygon(
                [Loop(np.stack([cell.get_vertex(k) for k in range(4)]))]
            )

        parent = cell_poly(cid)
        child0 = cell_poly(cid.child(0))
        inter = B.boolean_op_snapped(parent, child0, "intersection")
        assert B.approx_contains(parent, inter, merge_radius)
        assert B.approx_contains(child0, inter, merge_radius)
        # the intersection may slightly overlap the adjacent disjoint
        # child exactly, but never approximately
        child1 = cell_poly(cid.child(1))
        assert B.approx_disjoint(child1, inter, merge_radius)


def test_init_to_cell_union_border():
    """InitToCellUnionBorder (test.cc): a random non-leaf cell unioned
    with a random edge-adjacent smaller neighbor must merge into a
    SINGLE loop (shared partial edges line up within half kMinWidth).
    (Reference runs 200 iterations at up to level-30 gaps; 40 here with
    small_level <= level+4.)"""
    rng = np.random.RandomState(7)
    done = 0
    while done < 40:
        level = rng.randint(0, 27)
        big = _random_cell_id(rng, level)
        small_level = min(level + rng.randint(1, 5), 30)
        ids = np.array([big.id], dtype=np.uint64)
        neighbors = np.asarray(cid_np.all_neighbors(ids, small_level)[0]).ravel()
        small = CID(int(neighbors[rng.randint(len(neighbors))]))
        # skip diagonal neighbors (no shared edge)
        edge_n = cid_np.edge_neighbors(np.array([big.id], dtype=np.uint64))
        if not any(CID(int(e)).contains(small) for e in np.asarray(edge_n).ravel()):
            continue
        done += 1
        border = B.cell_union_border_polygon([big, small])
        assert len(border.loops) == 1, (done, big.id, small.id)
