"""s2{min,max}_distance_targets_test.cc closing tranche: the
UpdateMinDistance strict-improvement contract ("WhenEqual" matrix over
every target type), the antipodal straight-angle cases, use_brute_force
accessors, and VisitContainingShapes on empty/full polygons.
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.closest_edge import parse_index
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.distance_targets import (
    MaxDistance,
    MaxDistanceCellTarget,
    MaxDistanceEdgeTarget,
    MaxDistancePointTarget,
    MaxDistanceShapeIndexTarget,
    MinDistance,
    MinDistanceCellTarget,
    MinDistanceCellUnionTarget,
    MinDistanceEdgeTarget,
    MinDistancePointTarget,
    MinDistanceShapeIndexTarget,
)

_STRAIGHT = 4.0


def _pt(s):
    return parse_points(s)[0]


def _cell(s):
    p = _pt(s)
    return Cell(CID(int(K.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )[0])))


def _min_targets():
    return [
        MinDistancePointTarget(_pt("1:0")),
        MinDistanceEdgeTarget(_pt("1:0"), _pt("1:1")),
        MinDistanceCellTarget(_cell("1:0")),
        MinDistanceCellUnionTarget([_cell("1:0").id]),
        MinDistanceShapeIndexTarget(parse_index("1:0 # #")),
    ]


def _max_targets():
    return [
        MaxDistancePointTarget(_pt("1:0")),
        MaxDistanceEdgeTarget(_pt("1:0"), _pt("1:1")),
        MaxDistanceCellTarget(_cell("1:0")),
        MaxDistanceShapeIndexTarget(parse_index("1:0 # #")),
    ]


# --- UpdateMinDistanceTo{Edge,Cell}WhenEqual over all target types ---------


@pytest.mark.parametrize("idx", range(5))
def test_update_min_distance_to_edge_when_equal(idx):
    target = _min_targets()[idx]
    dist = MinDistance.infinity()
    edge = parse_points("0:-1, 0:1")
    assert target.update_to_edge(edge[0], edge[1], dist)
    assert not target.update_to_edge(edge[0], edge[1], dist)


@pytest.mark.parametrize("idx", range(5))
def test_update_min_distance_to_cell_when_equal(idx):
    target = _min_targets()[idx]
    dist = MinDistance.infinity()
    cell = _cell("0:1")
    assert target.update_to_cell(cell, dist)
    assert not target.update_to_cell(cell, dist)


@pytest.mark.parametrize("idx", range(4))
def test_update_max_distance_to_edge_when_equal(idx):
    target = _max_targets()[idx]
    dist = MaxDistance.infinity()
    edge = parse_points("0:-1, 0:1")
    assert target.update_to_edge(edge[0], edge[1], dist)
    assert not target.update_to_edge(edge[0], edge[1], dist)


@pytest.mark.parametrize("idx", range(4))
def test_update_max_distance_to_cell_when_equal(idx):
    target = _max_targets()[idx]
    dist = MaxDistance.infinity()
    cell = _cell("0:1")
    assert target.update_to_cell(cell, dist)
    assert not target.update_to_cell(cell, dist)


# --- antipodal straight-angle cases ----------------------------------------


def test_update_max_distance_to_edge_antipodal():
    target = MaxDistanceEdgeTarget(_pt("0:89"), _pt("0:91"))
    dist = MaxDistance.infinity()
    edge = parse_points("1:-90, -1:-90")
    assert target.update_to_edge(edge[0], edge[1], dist)
    assert dist.l2 == _STRAIGHT


def test_update_max_distance_to_cell_antipodal():
    p = _pt("0:0")
    target = MaxDistanceCellTarget(_cell("0:0"))
    dist = MaxDistance.infinity()
    cell = Cell(CID(int(K.from_point(
        np.array([-p[0]]), np.array([-p[1]]), np.array([-p[2]])
    )[0])))
    assert target.update_to_cell(cell, dist)
    assert dist.l2 == _STRAIGHT
    assert not target.update_to_cell(cell, dist)


# --- use_brute_force accessors ----------------------------------------------


def test_min_distance_use_brute_force():
    target = MinDistanceShapeIndexTarget(parse_index("# #"))
    assert not target.use_brute_force()
    target.set_use_brute_force(True)
    assert target.use_brute_force()


def test_max_distance_use_brute_force():
    target = MaxDistanceShapeIndexTarget(parse_index("# #"))
    assert not target.use_brute_force()
    target.set_use_brute_force(True)
    assert target.use_brute_force()


# --- VisitContainingShapesEmptyAndFull ---------------------------------------


def _containing_shapes(target, shapes, max_shapes):
    ids = set()

    def visitor(shape_id, target_point):
        ids.add(shape_id)
        return len(ids) < max_shapes

    target.visit_containing_shape_ids(shapes, visitor)
    return sorted(ids)


@pytest.mark.parametrize("target_cls", [
    MinDistanceShapeIndexTarget, MaxDistanceShapeIndexTarget
])
def test_visit_containing_shapes_empty_and_full(target_cls):
    index = parse_index("# # empty | full")

    point_target = target_cls(parse_index("1:1 # #"))
    assert _containing_shapes(point_target, index, 5) == [1]

    full_target = target_cls(parse_index("# # full"))
    assert _containing_shapes(full_target, index, 5) == [1]

    empty_target = target_cls(parse_index("# # empty"))
    assert _containing_shapes(empty_target, index, 5) == []
