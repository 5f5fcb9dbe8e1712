"""s2closest_edge_query_test.cc closing tranche: the
VisitClosestEdges / VisitClosestShapes visitor surface (streaming,
shape filters, early break, monotonic distances, result limits) plus
the empty/full-target and shape-filtering distance contracts.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.closest_edge import (
    find_closest_edges,
    parse_index,
    visit_closest_edges,
    visit_closest_shapes,
)
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.fractal import Fractal, frame_at


INDEX = parse_index(
    "# # 1:1, 1:-1, -1:-1, -1:1 | 2:2, 2:-2, -2:-2, -2:2"
)
assert len(INDEX) == 2


def _pt(s):
    return parse_points(s)[0]


def _fractal_shapes(seed=20260819, max_edges=2000):
    rng = np.random.RandomState(seed)
    f = Fractal(rng)
    f.set_level_for_approx_max_edges(max_edges)
    z = _pt("0:0")
    loop = f.make_loop(frame_at(rng, z), math.radians(10))
    v = loop.vertices
    from s2geometry_spark.kernel.closest_edge import Shape
    from s2geometry_spark.kernel.contains import Polygon

    return [
        Shape(0, 2, v, np.roll(v, -1, axis=0), polygon=Polygon([loop]))
    ], len(v)


def _visit(shapes, target, visitor=None, **kw):
    def v(sid, eid, d2):
        return True if visitor is None else visitor(sid, eid, d2)

    return visit_closest_edges(shapes, target, v, **kw)


# --- CanVisitClosestEdges (cc:309-314) -------------------------------------


def test_can_visit_closest_edges():
    # the target is inside the second shape only: 1 interior + 8 edges
    assert _visit(INDEX, _pt("0:1.5")) == 9


# --- CanFilterShapes (cc:316-322) ------------------------------------------


def test_can_filter_shapes():
    t = _pt("0:1.5")
    assert _visit(INDEX, t, shape_filter=lambda sid: sid == 0) == 4
    assert _visit(INDEX, t, shape_filter=lambda sid: sid == 1) == 5
    assert _visit(INDEX, t, shape_filter=lambda sid: False) == 0


# --- UpdatingShapeFilterWorks (cc:324-340) ---------------------------------


def test_updating_shape_filter_works():
    seen = set()

    def visitor(sid, eid, d2):
        seen.add(sid)
        return True

    n = _visit(
        INDEX, _pt("2.5:1.5"), visitor,
        shape_filter=lambda sid: sid not in seen,
    )
    assert n == 2
    assert len(seen) == 2


# --- CanBreakFrom{ShapeIteration,BruteForce,NormalIteration} ---------------


def test_can_break_from_shape_iteration():
    assert _visit(INDEX, _pt("0:0"), lambda *a: False) == 1


def test_can_break_from_iteration_fractal():
    shapes, _ = _fractal_shapes()
    assert _visit(
        shapes, _pt("0:0"), lambda *a: False, include_interiors=False
    ) == 1


# --- DistanceIsMonotonic (cc:370-390) --------------------------------------


def test_distance_is_monotonic():
    shapes, num_vertices = _fractal_shapes()
    last = [0.0]

    def visitor(sid, eid, d2):
        assert d2 >= last[0]
        last[0] = d2
        return True

    n = _visit(shapes, _pt("3.14:15.962"), visitor,
               include_interiors=False)
    assert n == num_vertices


# --- OnlyClosestEdgePerShapeIsReturned (cc:392-405) ------------------------


def test_only_closest_edge_per_shape_is_returned():
    results = []

    def visitor(sid, eid, d2):
        results.append((sid, eid))
        return True

    visit_closest_shapes(INDEX, _pt("0:4"), visitor)
    assert results == [(1, 3), (0, 3)]


# --- CanLimitByDistance / CanLimitByNumResults -----------------------------


def test_can_limit_by_distance():
    shapes, num_vertices = _fractal_shapes()
    limit = math.radians(12)
    max_seen = [0.0]

    def visitor(sid, eid, d2):
        max_seen[0] = max(max_seen[0], d2)
        return True

    n = _visit(shapes, _pt("3.14:15.962"), visitor,
               include_interiors=False, max_distance_rad=limit)
    assert n < num_vertices
    s = 2 * math.sin(0.5 * limit)
    assert max_seen[0] < s * s


def test_can_limit_by_num_results():
    shapes, _ = _fractal_shapes()
    assert _visit(shapes, _pt("3.14:15.962"),
                  include_interiors=False, max_results=314) == 314


# --- ShapeFilteringWorks (cc:215-243) --------------------------------------


def test_shape_filtering_works():
    t = _pt("0:1.5")
    limit = math.radians(0.1)
    s = 2 * math.sin(0.5 * limit)
    limit2 = s * s

    def min_dist(shape_filter=None):
        best = [math.inf]

        def visitor(sid, eid, d2):
            best[0] = min(best[0], d2)
            return False

        visit_closest_edges(INDEX, t, visitor,
                            shape_filter=shape_filter)
        return best[0]

    assert min_dist() < limit2  # interior hit on shape 1
    assert not (min_dist(lambda sid: sid == 0) < limit2)


# --- Empty / full polygon targets (cc:509-550) -----------------------------


def test_empty_polygon_target():
    empty = parse_index("# # empty")
    point = parse_index("1:1 # #")
    # measuring TO an empty target: no geometry to reach → infinity;
    # equivalently the empty index contains no edges as a source
    for src in (empty, point):
        res = find_closest_edges(
            empty, parse_points("1:1"), k=1, include_interiors=True
        )
        assert res == [[]]
        del src


def test_full_lax_polygon_target():
    full = parse_index("# # full")
    res = find_closest_edges(
        full, parse_points("1:1"), k=1, include_interiors=True
    )
    # the full polygon contains everything: interior hit at distance 0
    assert res[0][0][2] == 0.0

    empty = parse_index("# # empty")
    res2 = find_closest_edges(
        empty, parse_points("1:1"), k=1, include_interiors=True
    )
    assert res2 == [[]]
