"""Crossing-edge-pair fixtures — port of
s2shapeutil_visit_crossing_edge_pairs_test.cc (EdgeGridOneIndex :196-221,
EdgeGridTwoIndexes :222-246, FindSelfIntersection Basic :285-305 with
loop rotations per TestHasCrossingPermutations)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.closest_edge import Shape
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.crossings import (
    find_self_intersection,
    get_crossing_edge_pairs,
)


def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
    return np.array([x, y, z], float)


def _grid_shape(shape_id, vertical, horizontal):
    """The 11x11 epsilon-extended edge grid
    (s2shapeutil_visit_crossing_edge_pairs_test.cc:196-215)."""
    grid = 10
    eps = 1e-10
    c, d = [], []
    for i in range(grid + 1):
        e = 0 if (i == 0 or i == grid) else eps
        if vertical:
            c.append(_pt(-e, i))
            d.append(_pt(grid + e, i))
        if horizontal:
            c.append(_pt(i, -e))
            d.append(_pt(i, grid + e))
    return Shape(shape_id, 1, np.asarray(c), np.asarray(d))


def test_no_intersections():
    # :183-195
    assert get_crossing_edge_pairs([]) == []
    assert get_crossing_edge_pairs([], interior_only=True) == []
    assert get_crossing_edge_pairs([], other=[]) == []


def test_edge_grid_one_index():
    # :196-221: 9*12 = 108 interior crossings + 4 corner touches
    shape = _grid_shape(0, True, True)
    assert len(get_crossing_edge_pairs([shape])) == 112
    assert len(get_crossing_edge_pairs([shape], interior_only=True)) == 108


def test_edge_grid_two_indexes():
    # :222-246: vertical lines in one index, horizontal in the other
    a = _grid_shape(0, True, False)
    b = _grid_shape(0, False, True)
    assert len(get_crossing_edge_pairs([a], other=[b])) == 112
    assert (
        len(get_crossing_edge_pairs([a], other=[b], interior_only=True)) == 108
    )


def _loops_of(polygon_str):
    return [parse_points(s) for s in polygon_str.split(";")]


def _has_crossing(polygon_str):
    loops = _loops_of(polygon_str)
    return find_self_intersection(loops)


@pytest.mark.parametrize(
    "polygon_str,want",
    [
        ("0:0, 0:1, 0:2, 1:2, 1:1, 1:0", False),
        ("0:0, 0:1, 0:2, 1:2, 0:1, 1:0", True),   # duplicate vertex
        ("0:0, 0:1, 1:0, 1:1", True),             # edge crossing
        ("0:0, 1:1, 0:1; 0:0, 1:1, 1:0", True),   # duplicate edge
        ("0:0, 1:1, 0:1; 1:1, 0:0, 1:0", True),   # reversed edge
        ("0:0, 0:2, 2:2, 2:0; 1:1, 0:2, 3:1, 2:0", True),  # vertex crossing
    ],
)
def test_find_self_intersection(polygon_str, want):
    # :285-305, with loop rotations (TestHasCrossingPermutations :259-283
    # rotates each loop's starting vertex)
    loops = _loops_of(polygon_str)
    for rot in range(max(len(l) for l in loops)):
        rotated = [np.roll(l, rot % len(l), axis=0) for l in loops]
        assert find_self_intersection(rotated) == want, (polygon_str, rot)
    # loop order must not matter either
    assert find_self_intersection(loops[::-1]) == want
