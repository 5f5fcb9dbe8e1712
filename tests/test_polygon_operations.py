"""Port of s2polygon_test.cc Operations (test.cc:860-1000): the four
boolean operations over five adversarial polygon pairs (shared edges,
interlocking bars, interlocking doughnuts, and the degenerate sliver
triangle whose two intersection points merge), each checked against the
reference's expected polygons.

Equality is checked by the area of the symmetric difference between the
computed and expected result (the reference's CheckEqual compares
boundaries at kMaxError = 1e-4 rad; the corresponding area discrepancy
is bounded by perimeter x error)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.booleans import boolean_op_snapped
from s2geometry_spark.kernel.contains import Loop, Polygon, parse_points
from s2geometry_spark.kernel.measures import even_odd_area

CASES = [
    # (a, b, and, or, minus, xor) — s2polygon_test.cc:860-957
    (
        "4:2, 3:1, 3:3;",
        "3:1, 2:2, 3:3;",
        "",
        "4:2, 3:1, 2:2, 3:3;",
        "4:2, 3:1, 3:3;",
        "4:2, 3:1, 2:2, 3:3;",
    ),
    (
        "0:0, 0:2, 3:2, 3:0;   0:3, 0:5, 3:5, 3:3;",
        "1:1, 1:4, 2:4, 2:1;",
        "1:1, 1:2, 2:2, 2:1;   1:3, 1:4, 2:4, 2:3;",
        "0:0, 0:2, 1:2, 1:3, 0:3, 0:5, 3:5, 3:3, 2:3, 2:2, 3:2, 3:0;",
        "0:0, 0:2, 1:2, 1:1, 2:1, 2:2, 3:2, 3:0;   "
        "0:3, 0:5, 3:5, 3:3, 2:3, 2:4, 1:4, 1:3;",
        "0:0, 0:2, 1:2, 1:1, 2:1, 2:2, 3:2, 3:0;   "
        "0:3, 0:5, 3:5, 3:3, 2:3, 2:4, 1:4, 1:3;   "
        "1:2, 1:3, 2:3, 2:2",
    ),
    (
        "1:88, 1:93, 2:93, 2:88;   -1:88, -1:93, 0:93, 0:88;",
        "-2:89, -2:90, 3:90, 3:89;   -2:91, -2:92, 3:92, 3:91;",
        "1:89, 1:90, 2:90, 2:89;   1:91, 1:92, 2:92, 2:91;   "
        "-1:89, -1:90, 0:90, 0:89;   -1:91, -1:92, 0:92, 0:91;",
        "-1:88, -1:89, -2:89, -2:90, -1:90, -1:91, -2:91, -2:92, -1:92, "
        "-1:93, 0:93, 0:92, 1:92, 1:93, 2:93, 2:92, 3:92, 3:91, 2:91, "
        "2:90, 3:90, 3:89, 2:89, 2:88, 1:88, 1:89, 0:89, 0:88;   "
        "0:90, 0:91, 1:91, 1:90;",
        "1:88, 1:89, 2:89, 2:88;   1:90, 1:91, 2:91, 2:90;   "
        "1:92, 1:93, 2:93, 2:92;   -1:88, -1:89, 0:89, 0:88;   "
        "-1:90, -1:91, 0:91, 0:90;   -1:92, -1:93, 0:93, 0:92;",
        "1:88, 1:89, 2:89, 2:88;   -1:88, -1:89, 0:89, 0:88;   "
        "1:90, 1:91, 2:91, 2:90;   -1:90, -1:91, 0:91, 0:90;   "
        "1:92, 1:93, 2:93, 2:92;   -1:92, -1:93, 0:93, 0:92;   "
        "-2:89, -2:90, -1:90, -1:89;   -2:91, -2:92, -1:92, -1:91;   "
        "0:89, 0:90, 1:90, 1:89;   0:91, 0:92, 1:92, 1:91;   "
        "2:89, 2:90, 3:90, 3:89;   2:91, 2:92, 3:92, 3:91;",
    ),
    (
        "-1:-93, -1:-89, 3:-89, 3:-93;   0:-92, 0:-90, 2:-90, 2:-92;",
        "-3:-91, -3:-87, 1:-87, 1:-91;   -2:-90, -2:-88, 0:-88, 0:-90;",
        "-1:-91, -1:-90, 0:-90, 0:-91;   0:-90, 0:-89, 1:-89, 1:-90;",
        "-1:-93, -1:-91, -3:-91, -3:-87, 1:-87, 1:-89, 3:-89, 3:-93;   "
        "0:-92, 0:-91, 1:-91, 1:-90, 2:-90, 2:-92;   "
        "-2:-90, -2:-88, 0:-88, 0:-89, -1:-89, -1:-90;",
        "-1:-93, -1:-91, 0:-91, 0:-92, 2:-92, 2:-90, "
        "1:-90, 1:-89, 3:-89, 3:-93;   "
        "-1:-90, -1:-89, 0:-89, 0:-90;",
        "-1:-93, -1:-91, 0:-91, 0:-92, 2:-92, 2:-90, "
        "1:-90, 1:-89, 3:-89, 3:-93;   "
        "-3:-91, -3:-87, 1:-87, 1:-89, 0:-89, 0:-88, "
        "-2:-88, -2:-90, -1:-90, -1:-91;   "
        "-1:-90, -1:-89, 0:-89, 0:-90;   "
        "1:-91, 0:-91, 0:-90, 1:-90;",
    ),
    (
        "10:44, 10:46, 12:46, 12:44;",
        "11:45, 89:45.00000000000001, 90:45;",
        "",
        "10:44, 10:46, 12:46, 12:45.001774937, 12:44;",
        "10:44, 10:46, 12:46, 12:45.001774937, 12:44;",
        "10:44, 10:46, 12:46, 12:45.001774937, 12:44;",
    ),
]

OPS = ["intersection", "union", "difference", "symmetric_difference"]


def parse_polygon(s: str) -> Polygon:
    loops = []
    for tok in s.split(";"):
        tok = tok.strip()
        if tok:
            loops.append(Loop(parse_points(tok)))
    return Polygon(loops)


def polygon_area(p: Polygon) -> float:
    if not p.loops:
        return 0.0
    return even_odd_area([l.vertices for l in p.loops])


def polygon_perimeter(p: Polygon) -> float:
    total = 0.0
    for l in p.loops:
        v = l.vertices
        n = len(v)
        for i in range(n):
            w = v[(i + 1) % n]
            total += math.atan2(
                float(np.linalg.norm(np.cross(v[i], w))), float(v[i] @ w)
            )
    return total


@pytest.mark.parametrize("case_idx", range(len(CASES)))
@pytest.mark.parametrize("op_idx", range(4))
def test_polygon_operations(case_idx, op_idx):
    case = CASES[case_idx]
    a = parse_polygon(case[0])
    b = parse_polygon(case[1])
    expected = parse_polygon(case[2 + op_idx])
    result = boolean_op_snapped(a, b, OPS[op_idx])
    if not expected.loops:
        assert polygon_area(result) <= 1e-8, "expected empty result"
        return
    diff = boolean_op_snapped(result, expected, "symmetric_difference")
    tol = 1e-4 * (
        polygon_perimeter(result) + polygon_perimeter(expected)
    ) + 1e-10
    assert polygon_area(diff) <= tol, (
        polygon_area(diff),
        tol,
    )
