"""Polygon relation matrix — general-position rows of
s2polygon_test.cc:697-779 (shared-boundary rows need boolean ops and are
out of scope this round, see kernel/relations.py docstring)."""

import pytest

from s2geometry_spark.kernel.contains import parse_polygon
from s2geometry_spark.kernel.relations import polygon_relations

NEAR0 = "-1:0, 0:1, 1:0, 0:-1"
NEAR1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1"
NEAR2 = "-1:-2, -2:5, 5:-2"
NEAR3 = "-2:-2, -3:6, 6:-3"
CROSS1 = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1"
CROSS2 = "1:-2, 1:-1, 1:1, 1:2, -1:2, -1:1, -1:-1, -1:-2"
OVERLAP1 = "0:1, 1:1, 2:1, 2:0, 1:0, 0:0"
OVERLAP2 = "1:1, 2:1, 3:1, 3:0, 2:0, 1:0"

near_10 = parse_polygon(NEAR0 + ";" + NEAR1)
near_32 = parse_polygon(NEAR3 + ";" + NEAR2)
empty = parse_polygon("empty")
full = parse_polygon("full")


@pytest.mark.parametrize(
    "a,b,expect",
    [
        (near_10, empty, (True, False, False)),
        (near_10, near_10, (True, True, True)),
        (full, near_10, (True, False, True)),
        (full, full, (True, True, True)),
        (near_10, near_32, (False, False, False)),
        (parse_polygon(CROSS1), parse_polygon(CROSS2), (False, False, True)),
        (parse_polygon(OVERLAP1), parse_polygon(OVERLAP2), (False, False, True)),
        # plain nesting: NEAR2 triangle strictly inside NEAR3 triangle
        (parse_polygon(NEAR3), parse_polygon(NEAR2), (True, False, True)),
        (parse_polygon(NEAR2), parse_polygon(NEAR3), (False, True, True)),
    ],
)
def test_relation_matrix_general_position(a, b, expect):
    assert polygon_relations(a, b) == expect


def test_relations_symmetry():
    pairs = [
        (parse_polygon(NEAR3), parse_polygon(NEAR2)),
        (parse_polygon(CROSS1), parse_polygon(CROSS2)),
        (near_10, near_32),
    ]
    for a, b in pairs:
        ab = polygon_relations(a, b)
        ba = polygon_relations(b, a)
        assert ab[0] == ba[1] and ab[1] == ba[0] and ab[2] == ba[2]


def test_annulus_relations():
    # b inside the hole of a → disjoint
    a = parse_polygon(NEAR3 + ";" + NEAR2)  # annulus between NEAR2 and NEAR3
    b = parse_polygon(NEAR0)  # small diamond inside NEAR2's interior
    assert polygon_relations(a, b) == (False, False, False)
    # c spans a's outer boundary → proper crossing
    c = parse_polygon("-5:-5, -5:0, 0:0, 0:-5")
    rel = polygon_relations(a, c)
    assert rel[2] is True and rel[0] is False
