"""Port of s2cell_test.cc TestSubdivide (:182-352): the exhaustive
recursive subdivision invariants — child geometry matches direct
construction, containment/intersection relations between parents,
children and siblings, cap/rect bound tightness, and the three
area-sum identities.  The recursion is depth-limited for Python
runtime (full to level 3, forced special-UV paths and a pinned random
sample to level 8; the reference samples to level 30)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.cell import (
    Cell,
    approx_area,
    average_area,
    exact_area,
)
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.region import Cap

DBL_EPSILON = 2.220446049250313e-16
MAX_SIZE_UV = 0.3964182625366691
SPECIAL_UV = [
    (DBL_EPSILON, DBL_EPSILON),      # face center
    (DBL_EPSILON, 1.0),              # edge midpoint
    (1.0, 1.0),                      # face corner
    (MAX_SIZE_UV, MAX_SIZE_UV),      # largest cell area
    (DBL_EPSILON, MAX_SIZE_UV),      # longest edge/diagonal
]
MAX_LEVEL = 8


def _cap_bound(cell: Cell) -> Cap:
    # S2Cell::GetCapBound (s2cell.cc): cap at the center extended to
    # the four vertices
    cap = Cap.from_point(cell.get_center())
    for k in range(4):
        cap.add_point(cell.get_vertex(k))
    return cap


def _cell_contains_cell(a: Cell, b: Cell) -> bool:
    return (a.id.range_min().id <= b.id.range_min().id
            and b.id.range_max().id <= a.id.range_max().id)


def _cell_may_intersect_cell(a: Cell, b: Cell) -> bool:
    return (a.id.range_min().id <= b.id.range_max().id
            and b.id.range_min().id <= a.id.range_max().id)


def _bound_contains_uv(cell: Cell, uv) -> bool:
    u, v = uv
    return (cell.u_lo <= u <= cell.u_hi and cell.v_lo <= v <= cell.v_hi)


def _subdivide(rng, cell: Cell) -> None:
    if cell.level >= 30:
        return
    children = cell.children()
    child_id = cell.id.child_begin(cell.level + 1)
    exact_sum = approx_sum = average_sum = 0.0
    parent_cap = _cap_bound(cell)
    parent_rect = cell.get_rect_bound()
    if cell.contains_point(np.array([0.0, 0.0, 1.0])) or \
            cell.contains_point(np.array([0.0, 0.0, -1.0])):
        assert parent_rect.lng.is_full()
    for i, child in enumerate(children):
        exact_sum += exact_area(child)
        approx_sum += approx_area(child)
        average_sum += average_area(child.level)

        # child geometry == direct construction from its cell id
        assert child_id.id == child.id.id
        direct = Cell(child_id)
        assert direct.face == child.face
        assert direct.level == child.level
        assert direct.orientation == child.orientation
        assert np.array_equal(direct.get_center_raw(),
                              child.get_center_raw())
        for k in range(4):
            assert np.array_equal(direct.get_vertex_raw(k),
                                  child.get_vertex_raw(k))
            assert np.array_equal(direct.get_edge_raw(k),
                                  child.get_edge_raw(k))

        # containment / intersection relations
        assert _cell_contains_cell(cell, child)
        assert _cell_may_intersect_cell(cell, child)
        assert not _cell_contains_cell(child, cell)
        assert cell.contains_point(child.get_center_raw())
        for j in range(4):
            assert cell.contains_point(child.get_vertex_raw(j))
        for j, other in enumerate(children):
            if j != i:
                assert not child.contains_point(other.get_center_raw())
                assert not _cell_may_intersect_cell(child, other)

        # cap / rect bounds
        child_cap = _cap_bound(child)
        child_rect = child.get_rect_bound()
        assert child_cap.contains_point(child.get_center())
        assert child_rect.contains_point(child.get_center_raw())
        assert parent_cap.contains_point(child.get_center())
        assert parent_rect.contains_point(child.get_center_raw())
        for j in range(4):
            v = child.get_vertex(j)
            assert child_cap.contains_point(v)
            assert child_rect.contains_point(v)
            assert child_rect.contains_point(child.get_vertex_raw(j))
            assert parent_cap.contains_point(v)
            assert parent_rect.contains_point(v)
            assert parent_rect.contains_point(child.get_vertex_raw(j))
        for j, other in enumerate(children):
            if j == i:
                continue
            cap_count = sum(
                1 for k in range(4)
                if child_cap.contains_point(other.get_vertex(k)))
            rect_count = sum(
                1 for k in range(4)
                if child_rect.contains_point(other.get_vertex_raw(k)))
            assert cap_count <= 2
            if (child_rect.lat.lo > -math.pi / 2
                    and child_rect.lat.hi < math.pi / 2):
                assert rect_count <= 2

        force = any(_bound_contains_uv(child, uv) for uv in SPECIAL_UV)
        if child.level < MAX_LEVEL and (
                force or cell.level < 3 or rng.rand() < 0.2):
            _subdivide(rng, child)
        child_id = child_id.next()

    # area-sum identities (s2cell_test.cc:287-301)
    assert abs(math.log(exact_sum / exact_area(cell))) <= abs(
        math.log(1 + 1e-6))
    assert abs(math.log(approx_sum / approx_area(cell))) <= abs(
        math.log(1.03))
    assert abs(math.log(average_sum / average_area(cell.level))) <= abs(
        math.log(1 + 1e-15))


def test_subdivide():
    rng = np.random.RandomState(20260819)
    for face in (0, 3, 5):
        _subdivide(rng, Cell(CID.from_face(face)))
