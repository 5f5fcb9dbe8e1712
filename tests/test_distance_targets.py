"""s2min_distance_targets_test.cc + s2max_distance_targets_test.cc ports:
strict-improvement UpdateMin/MaxDistance protocol for all five target
types, VisitContainingShapes semantics (chain starts, cell centers,
antipodes for max targets, empty/full polygons), and the GetCapBound
random harnesses."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel import cellid as cid_np
from s2geometry_spark.kernel.closest_edge import parse_index
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.distance import chord2, chord2_to_angle
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


def pt(s: str) -> np.ndarray:
    return parse_points(s)[0]


def leaf_cid(p) -> CID:
    return CID(int(cid_np.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )[0]))


def leaf_cell(s: str) -> Cell:
    return Cell(leaf_cid(pt(s)))


def deg(dist) -> float:
    return math.degrees(float(chord2_to_angle(dist.l2)))


def get_containing_shapes(target, shapes, max_shapes: int) -> list[int]:
    ids: set[int] = set()

    def visitor(shape_id, _target_point):
        ids.add(shape_id)
        return len(ids) < max_shapes

    target.visit_containing_shape_ids(shapes, visitor)
    return sorted(ids)


class TestMinDistanceValues:
    def test_negative_is_negative(self):
        assert MinDistance.negative().is_negative()


class TestMinUpdateWhenEqual:
    """UpdateMinDistance returns true only on STRICT improvement."""

    def test_point_to_edge(self):
        t = MinDistancePointTarget(pt("1:0"))
        d = MinDistance.infinity()
        e = parse_points("0:-1, 0:1")
        assert t.update_to_edge(e[0], e[1], d)
        assert not t.update_to_edge(e[0], e[1], d)

    def test_point_to_cell(self):
        t = MinDistancePointTarget(pt("1:0"))
        d = MinDistance.infinity()
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d)
        assert not t.update_to_cell(cell, d)

    def test_edge_to_edge(self):
        t = MinDistanceEdgeTarget(pt("1:0"), pt("1:1"))
        d = MinDistance.infinity()
        e = parse_points("0:-1, 0:1")
        assert t.update_to_edge(e[0], e[1], d)
        assert not t.update_to_edge(e[0], e[1], d)

    def test_edge_to_cell(self):
        t = MinDistanceEdgeTarget(pt("1:0"), pt("1:1"))
        d = MinDistance.infinity()
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d)
        assert not t.update_to_cell(cell, d)

    def test_cell_to_edge(self):
        t = MinDistanceCellTarget(leaf_cell("0:1"))
        d = MinDistance.infinity()
        e = parse_points("0:-1, 0:1")
        assert t.update_to_edge(e[0], e[1], d)
        assert not t.update_to_edge(e[0], e[1], d)

    def test_cell_to_cell(self):
        t = MinDistanceCellTarget(leaf_cell("0:1"))
        d = MinDistance.infinity()
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d)
        assert not t.update_to_cell(cell, d)

    def test_cell_union_brute_force_flag(self):
        t = MinDistanceCellUnionTarget([])
        assert not t.use_brute_force()
        t.set_use_brute_force(True)
        assert t.use_brute_force()

    def test_cell_union_to_edge(self):
        t = MinDistanceCellUnionTarget(
            [leaf_cid(pt("0:1"))]
        )
        d = MinDistance.infinity()
        e = parse_points("0:-1, 0:1")
        assert t.update_to_edge(e[0], e[1], d)
        assert not t.update_to_edge(e[0], e[1], d)

    def test_cell_union_to_cell(self):
        t = MinDistanceCellUnionTarget(
            [leaf_cid(pt("0:1"))]
        )
        d = MinDistance.infinity()
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d)
        assert not t.update_to_cell(cell, d)

    def test_shape_index_brute_force_flag(self):
        t = MinDistanceShapeIndexTarget(parse_index("# #"))
        assert not t.use_brute_force()
        t.set_use_brute_force(True)
        assert t.use_brute_force()

    def test_shape_index_to_edge(self):
        t = MinDistanceShapeIndexTarget(parse_index("1:0 # #"))
        d = MinDistance.infinity()
        e = parse_points("0:-1, 0:1")
        assert t.update_to_edge(e[0], e[1], d)
        assert not t.update_to_edge(e[0], e[1], d)

    def test_shape_index_to_cell(self):
        t = MinDistanceShapeIndexTarget(parse_index("1:0 # #"))
        d = MinDistance.infinity()
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d)
        assert not t.update_to_cell(cell, d)


class TestMinVisitContainingShapes:
    def test_point_target(self):
        shapes = parse_index(
            "1:1 # 1:1, 2:2 # 0:0, 0:3, 3:0 | 6:6, 6:9, 9:6 | 0:0, 0:4, 4:0"
        )
        t = MinDistancePointTarget(pt("1:1"))
        one = get_containing_shapes(t, shapes, 1)
        assert len(one) == 1 and set(one) <= {2, 4}
        assert get_containing_shapes(t, shapes, 5) == [2, 4]

    def test_edge_target(self):
        shapes = parse_index(
            "1:1 # 1:1, 2:2 # 0:0, 0:3, 3:0 | 6:6, 6:9, 9:6 | 0:0, 0:4, 4:0"
        )
        t = MinDistanceEdgeTarget(pt("1:2"), pt("2:1"))
        one = get_containing_shapes(t, shapes, 1)
        assert len(one) == 1 and set(one) <= {2, 4}
        assert get_containing_shapes(t, shapes, 5) == [2, 4]

    def test_cell_target(self):
        shapes = parse_index(
            "1:1 # 1:1, 2:2 # 0:0, 0:3, 3:0 | 6:6, 6:9, 9:6 |"
            " -1:-1, -1:5, 5:-1"
        )
        cid1 = leaf_cid(pt("1:1"))
        t1 = MinDistanceCellTarget(Cell(cid1))
        one = get_containing_shapes(t1, shapes, 1)
        assert len(one) == 1 and set(one) <= {2, 4}
        assert get_containing_shapes(t1, shapes, 5) == [2, 4]
        t2 = MinDistanceCellTarget(Cell(cid1.parent(5)))
        assert get_containing_shapes(t2, shapes, 5) == [2, 4]

    def test_cell_union_target(self):
        shapes = parse_index(
            "1:1 # 1:1, 2:2 # 0:0, 0:3, 3:0 | 6:6, 6:9, 9:6 |"
            " -1:-1, -1:5, 5:-1"
        )
        cid1 = leaf_cid(pt("1:1"))
        cid2 = leaf_cid(pt("7:7"))
        t = MinDistanceCellUnionTarget([cid1, cid2])
        one = get_containing_shapes(t, shapes, 1)
        assert len(one) == 1 and set(one) <= {2, 3, 4}
        assert get_containing_shapes(t, shapes, 5) == [2, 3, 4]

    def test_shape_index_target(self):
        shapes = parse_index(
            "1:1 | 4:4 | 7:7 | 10:10 # "
            "1:1, 1:2 | 4:4, 4:5 | 7:7, 7:8 | 10:10, 10:11 # "
            "0:0, 0:3, 3:0 | 3:3, 3:6, 6:3 | 6:6, 6:9, 9:6 | 9:9, 9:12, 12:9"
        )
        target_shapes = parse_index(
            "1:1 # 4:5, 5:4 # 20:20, 20:21, 21:20; 10:10, 10:11, 11:10"
        )
        t = MinDistanceShapeIndexTarget(target_shapes)
        assert get_containing_shapes(t, shapes, 5) == [5, 6, 8]

    def test_shape_index_empty_and_full(self):
        shapes = parse_index("# # empty | full")
        t_point = MinDistanceShapeIndexTarget(parse_index("1:1 # #"))
        assert get_containing_shapes(t_point, shapes, 5) == [1]
        t_full = MinDistanceShapeIndexTarget(parse_index("# # full"))
        assert get_containing_shapes(t_full, shapes, 5) == [1]
        t_empty = MinDistanceShapeIndexTarget(parse_index("# # empty"))
        assert get_containing_shapes(t_empty, shapes, 5) == []


class TestMaxDistanceValues:
    def test_constants(self):
        assert MaxDistance.negative() < MaxDistance.zero()
        assert MaxDistance.zero() < MaxDistance.infinity()


class TestMaxUpdates:
    def test_point_target_update(self):
        t = MaxDistancePointTarget(pt("0:0"))
        d0 = MaxDistance(0.0)
        d10 = MaxDistance(float(chord2(pt("0:0"), pt("0:10"))))
        p = pt("1:0")
        assert t.update_to_point(p, d0)
        assert abs(deg(d0) - 1.0) < 1e-13
        assert not t.update_to_point(p, d10)

        d0 = MaxDistance(0.0)
        e = parse_points("0:-1, 0:1")
        assert t.update_to_edge(e[0], e[1], d0)
        assert abs(deg(d0) - 1.0) < 1e-13
        assert not t.update_to_edge(e[0], e[1], d10)

        d0 = MaxDistance(0.0)
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d0)
        assert not t.update_to_cell(cell, d10)

    def test_point_to_edge_when_equal(self):
        t = MaxDistancePointTarget(pt("1:0"))
        d = MaxDistance.infinity()
        e = parse_points("0:-1, 0:1")
        assert t.update_to_edge(e[0], e[1], d)
        assert not t.update_to_edge(e[0], e[1], d)

    def test_point_to_cell_when_equal(self):
        t = MaxDistancePointTarget(pt("1:0"))
        d = MaxDistance.infinity()
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d)
        assert not t.update_to_cell(cell, d)

    def test_edge_target_update(self):
        e0 = parse_points("0:-1, 0:1")
        t = MaxDistanceEdgeTarget(e0[0], e0[1])
        d0 = MaxDistance(0.0)
        d10 = MaxDistance(float(chord2(pt("0:0"), pt("0:10"))))
        p = pt("0:2")
        assert t.update_to_point(p, d0)
        assert abs(deg(d0) - 3.0) < 1e-13
        assert not t.update_to_point(p, d10)

        d0 = MaxDistance(0.0)
        e = parse_points("0:2, 0:3")
        assert t.update_to_edge(e[0], e[1], d0)
        assert abs(deg(d0) - 4.0) < 1e-13
        assert not t.update_to_edge(e[0], e[1], d10)

        d0 = MaxDistance(0.0)
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d0)
        assert not t.update_to_cell(cell, d10)

    def test_edge_to_edge_when_equal(self):
        t = MaxDistanceEdgeTarget(pt("1:0"), pt("1:1"))
        d = MaxDistance.infinity()
        e = parse_points("0:-1, 0:1")
        assert t.update_to_edge(e[0], e[1], d)
        assert not t.update_to_edge(e[0], e[1], d)

    def test_edge_to_edge_antipodal(self):
        t = MaxDistanceEdgeTarget(pt("0:89"), pt("0:91"))
        d = MaxDistance.infinity()
        e = parse_points("1:-90, -1:-90")
        assert t.update_to_edge(e[0], e[1], d)
        assert d.l2 == _STRAIGHT

    def test_edge_to_cell_when_equal(self):
        t = MaxDistanceEdgeTarget(pt("1:0"), pt("1:1"))
        d = MaxDistance.infinity()
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d)
        assert not t.update_to_cell(cell, d)

    def test_cell_target_update(self):
        t = MaxDistanceCellTarget(leaf_cell("0:1"))
        d0 = MaxDistance(0.0)
        d10 = MaxDistance(float(chord2(pt("0:0"), pt("0:10"))))
        p = pt("0:0")
        assert t.update_to_point(p, d0)
        assert not t.update_to_point(p, d10)

        d0 = MaxDistance(0.0)
        e = parse_points("0:2, 0:3")
        assert t.update_to_edge(e[0], e[1], d0)
        assert not t.update_to_edge(e[0], e[1], d10)

        d0 = MaxDistance(0.0)
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d0)
        assert not t.update_to_cell(cell, d10)

    def test_cell_to_edge_when_equal(self):
        t = MaxDistanceCellTarget(leaf_cell("0:1"))
        d = MaxDistance.infinity()
        e = parse_points("0:-1, 0:1")
        assert t.update_to_edge(e[0], e[1], d)
        assert not t.update_to_edge(e[0], e[1], d)

    def test_cell_to_cell_when_equal(self):
        t = MaxDistanceCellTarget(leaf_cell("0:1"))
        d = MaxDistance.infinity()
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d)
        assert not t.update_to_cell(cell, d)

    def test_cell_to_cell_antipodal(self):
        p = pt("0:0")
        t = MaxDistanceCellTarget(Cell(leaf_cid(p)))
        d = MaxDistance.infinity()
        cell = Cell(leaf_cid(-p))
        assert t.update_to_cell(cell, d)
        assert d.l2 == _STRAIGHT
        assert not t.update_to_cell(cell, d)

    def test_shape_index_to_edge_when_equal(self):
        t = MaxDistanceShapeIndexTarget(parse_index("1:0 # #"))
        d = MaxDistance.infinity()
        e = parse_points("0:-1, 0:1")
        assert t.update_to_edge(e[0], e[1], d)
        assert not t.update_to_edge(e[0], e[1], d)

    def test_shape_index_to_cell_when_equal(self):
        t = MaxDistanceShapeIndexTarget(parse_index("1:0 # #"))
        d = MaxDistance.infinity()
        cell = leaf_cell("0:0")
        assert t.update_to_cell(cell, d)
        assert not t.update_to_cell(cell, d)


class TestMaxVisitContainingShapes:
    def test_point_target(self):
        shapes = parse_index(
            "1:1 # 1:1, 2:2 # 0:0, 0:3, 3:0 | 6:6, 6:9, 9:6 | 0:0, 0:4, 4:0"
        )
        t = MaxDistancePointTarget(-pt("1:1"))
        assert get_containing_shapes(t, shapes, 1) == [2]
        assert get_containing_shapes(t, shapes, 5) == [2, 4]

    def test_edge_target(self):
        shapes = parse_index(
            "1:1 # 1:1, 2:2 # 0:0, 0:3, 3:0 | 6:6, 6:9, 9:6 | 0:0, 0:4, 4:0"
        )
        e = parse_points("1:2, 2:1")
        t = MaxDistanceEdgeTarget(-e[0], -e[1])
        assert get_containing_shapes(t, shapes, 1) == [2]
        assert get_containing_shapes(t, shapes, 5) == [2, 4]

    def test_cell_target(self):
        shapes = parse_index(
            "1:1 # 1:1, 2:2 # 0:0, 0:3, 3:0 | 6:6, 6:9, 9:6 |"
            " -1:-1, -1:5, 5:-1"
        )
        cid1 = leaf_cid(-pt("1:1"))
        t1 = MaxDistanceCellTarget(Cell(cid1))
        assert get_containing_shapes(t1, shapes, 1) == [2]
        assert get_containing_shapes(t1, shapes, 5) == [2, 4]
        t2 = MaxDistanceCellTarget(Cell(cid1.parent(5)))
        assert get_containing_shapes(t2, shapes, 5) == [2, 4]

    def test_shape_index_target(self):
        shapes = parse_index(
            "1:1 | 4:4 | 7:7 | 10:10 # "
            "1:1, 1:2 | 4:4, 4:5 | 7:7, 7:8 | 10:10, 10:11 # "
            "0:0, 0:3, 3:0 | 3:3, 3:6, 6:3 | 6:6, 6:9, 9:6 | 9:9, 9:12, 12:9"
        )
        # Reflected target: one point, one polyline, one two-loop polygon.
        target_shapes = parse_index(
            "1:1 # 4:5, 5:4 # 20:20, 20:21, 21:20; 10:10, 10:11, 11:10"
        )
        for sh in target_shapes:
            sh.edges_c = -sh.edges_c
            sh.edges_d = -sh.edges_d
            if sh.polygon is not None:
                from s2geometry_spark.kernel.contains import Loop, Polygon

                sh.polygon = Polygon(
                    [Loop(-l.vertices) for l in sh.polygon.loops]
                )
        t = MaxDistanceShapeIndexTarget(target_shapes)
        assert get_containing_shapes(t, shapes, 5) == [5, 6, 8]

    def test_shape_index_empty_and_full(self):
        shapes = parse_index("# # empty | full")
        t_point = MaxDistanceShapeIndexTarget(parse_index("1:1 # #"))
        assert get_containing_shapes(t_point, shapes, 5) == [1]
        t_full = MaxDistanceShapeIndexTarget(parse_index("# # full"))
        assert get_containing_shapes(t_full, shapes, 5) == [1]
        t_empty = MaxDistanceShapeIndexTarget(parse_index("# # empty"))
        assert get_containing_shapes(t_empty, shapes, 5) == []


def _random_point(rng) -> np.ndarray:
    p = rng.normal(size=3)
    return p / np.linalg.norm(p)


def _random_cellid(rng) -> CID:
    p = _random_point(rng)
    level = int(rng.integers(0, 31))
    return leaf_cid(p).parent(level)


class TestMaxCapBounds:
    def test_cell_target_get_cap_bound(self):
        # s2max_distance_targets_test.cc CellTarget.GetCapBound: points
        # outside the antipodal cap are strictly closer than Straight.
        rng = np.random.default_rng(20260818)
        for _ in range(25):
            cell = Cell(_random_cellid(rng))
            target = MaxDistanceCellTarget(cell)
            cap = target.get_cap_bound()
            for _ in range(25):
                p = _random_point(rng)
                if not cap.contains_point(p):
                    from s2geometry_spark.kernel.cell import (
                        cell_point_max_distance2,
                    )

                    d2 = cell_point_max_distance2(cell, p)
                    assert MaxDistance.zero() < MaxDistance(d2)

    def test_index_target_get_cap_bound(self):
        rng = np.random.default_rng(4)
        cell_cid = _random_cellid(rng)
        cell = Cell(cell_cid)
        # Build the index: the cell as a polygon + one random point.
        from s2geometry_spark.kernel.closest_edge import Shape
        from s2geometry_spark.kernel.contains import Loop, Polygon

        cell_loop = np.asarray(
            [cell.get_vertex(k) for k in range(4)], float
        )
        poly = Polygon([Loop(cell_loop)])
        shapes = [
            Shape(0, 2, cell_loop, np.roll(cell_loop, -1, axis=0),
                  polygon=poly),
        ]
        p = _random_point(rng)
        shapes.append(Shape(1, 0, p[None], p[None]))
        target = MaxDistanceShapeIndexTarget(shapes)
        cap = target.get_cap_bound()
        for _ in range(100):
            p_test = _random_point(rng)
            if not cap.contains_point(p_test):
                cur = MaxDistance.infinity()
                assert target.update_to_point(p_test, cur)
                assert MaxDistance.zero() < cur
