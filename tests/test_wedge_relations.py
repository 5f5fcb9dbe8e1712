"""Wedge-relation fixtures — port of s2wedge_relations_test.cc:36-90
(the full TestWedge table: contains / intersects / 5-value relation)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.looprel import (
    WEDGE_EQUALS,
    WEDGE_IS_DISJOINT,
    WEDGE_IS_PROPERLY_CONTAINED,
    WEDGE_PROPERLY_CONTAINS,
    WEDGE_PROPERLY_OVERLAPS,
    get_wedge_relation,
    wedge_contains,
    wedge_intersects,
)


def _n(*xyz):
    v = np.asarray(xyz, float)
    return v / np.linalg.norm(v)


# (a0, ab1, a2, b0, b2, contains, intersects, relation)
_WEDGE_CASES = [
    # intersection in one wedge
    ((-1, 0, 10), (0, 0, 1), (1, 2, 10), (0, 1, 10), (1, -2, 10),
     False, True, WEDGE_PROPERLY_OVERLAPS),
    # intersection in two wedges
    ((-1, -1, 10), (0, 0, 1), (1, -1, 10), (1, 0, 10), (-1, 1, 10),
     False, True, WEDGE_PROPERLY_OVERLAPS),
    # normal containment
    ((-1, -1, 10), (0, 0, 1), (1, -1, 10), (-1, 0, 10), (1, 0, 10),
     True, True, WEDGE_PROPERLY_CONTAINS),
    # containment with equality on one side
    ((2, 1, 10), (0, 0, 1), (-1, -1, 10), (2, 1, 10), (1, -5, 10),
     True, True, WEDGE_PROPERLY_CONTAINS),
    # containment with equality on the other side
    ((2, 1, 10), (0, 0, 1), (-1, -1, 10), (1, -2, 10), (-1, -1, 10),
     True, True, WEDGE_PROPERLY_CONTAINS),
    # containment with equality on both sides
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (-2, 3, 10), (4, -5, 10),
     True, True, WEDGE_EQUALS),
    # disjoint with equality on one side
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, -3, 10),
     False, False, WEDGE_IS_DISJOINT),
    # disjoint with equality on the other side
    ((-2, 3, 10), (0, 0, 1), (0, 5, 10), (4, -5, 10), (-2, 3, 10),
     False, False, WEDGE_IS_DISJOINT),
    # disjoint with equality on both sides
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, 3, 10),
     False, False, WEDGE_IS_DISJOINT),
    # B contains A with equality on one side
    ((2, 1, 10), (0, 0, 1), (1, -5, 10), (2, 1, 10), (-1, -1, 10),
     False, True, WEDGE_IS_PROPERLY_CONTAINED),
    # B contains A with equality on the other side
    ((2, 1, 10), (0, 0, 1), (1, -5, 10), (-2, 1, 10), (1, -5, 10),
     False, True, WEDGE_IS_PROPERLY_CONTAINED),
]


@pytest.mark.parametrize("a0,ab1,a2,b0,b2,contains,intersects,relation", _WEDGE_CASES)
def test_wedge(a0, ab1, a2, b0, b2, contains, intersects, relation):
    # TestWedge (s2wedge_relations_test.cc:24-34)
    a0, ab1, a2 = _n(*a0), _n(*ab1), _n(*a2)
    b0, b2 = _n(*b0), _n(*b2)
    assert wedge_contains(a0, ab1, a2, b0, b2) == contains
    assert wedge_intersects(a0, ab1, a2, b0, b2) == intersects
    assert get_wedge_relation(a0, ab1, a2, b0, b2) == relation


def test_wedge_relation_symmetry():
    """GetWedgeRelation contract: swapping A and B maps
    PROPERLY_CONTAINS <-> IS_PROPERLY_CONTAINED and fixes the other
    three values (seeded random wedges around a shared vertex)."""
    rng = np.random.default_rng(7)
    swap = {
        WEDGE_PROPERLY_CONTAINS: WEDGE_IS_PROPERLY_CONTAINED,
        WEDGE_IS_PROPERLY_CONTAINED: WEDGE_PROPERLY_CONTAINS,
        WEDGE_EQUALS: WEDGE_EQUALS,
        WEDGE_IS_DISJOINT: WEDGE_IS_DISJOINT,
        WEDGE_PROPERLY_OVERLAPS: WEDGE_PROPERLY_OVERLAPS,
    }
    ab1 = np.array([0.0, 0.0, 1.0])
    for _ in range(200):
        pts = [
            _n(float(c[0]), float(c[1]), 10.0)
            for c in rng.uniform(-5, 5, size=(4, 2))
        ]
        a0, a2, b0, b2 = pts
        r = get_wedge_relation(a0, ab1, a2, b0, b2)
        r_swapped = get_wedge_relation(b0, ab1, b2, a0, a2)
        assert r_swapped == swap[r], (r, r_swapped)
