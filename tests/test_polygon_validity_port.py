"""Port of s2polygon_test.cc's IsValidTest random-mutation suites
(test.cc:2429-2790) over kernel/valid_query.LegacyValidQuery — the
legacy query IS the S2Polygon::IsValid semantics.  The
depth/InitOriented suites are S2Polygon loop-depth machinery (nesting
is covered by kernel/nesting); the EmptyLoop suite tests S2Polygon's
Init-time empty-loop dropping (no lax equivalent)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.fractal import make_regular_points
from s2geometry_spark.kernel.valid_query import (
    DUPLICATE_VERTICES,
    LOOP_NOT_ENOUGH_VERTICES,
    OVERLAPPING_GEOMETRY,
    POLYGON_EMPTY_LOOP,
    POLYGON_INCONSISTENT_LOOP_ORIENTATIONS,
    LegacyValidQuery,
    ValidQuery,
    lax_polygon_vshape,
)

ITERS = 25


def random_point(rng) -> np.ndarray:
    p = rng.standard_normal(3)
    return p / np.linalg.norm(p)


def concentric_loops(rng, num_loops: int, min_vertices: int) -> list:
    """AddConcentricLoops (test.cc:2450-2459): nested regular loops with
    index-collinear vertices and exponentially decreasing radii."""
    center = random_point(rng)
    num_vertices = min_vertices + int(rng.integers(0, 10))
    loops = []
    for i in range(num_loops):
        radius = math.radians(80 * 0.1**i)
        loops.append(
            np.asarray(
                make_regular_points(center, radius, num_vertices), float
            )
        )
    return loops


def check_invalid(loops, codes):
    """CheckInvalid (test.cc:2484-2494): shuffle-independent — loop
    order does not change validity."""
    ok, got = LegacyValidQuery().validate([lax_polygon_vshape(loops)])
    assert not ok
    if codes:
        assert got in codes, got


def test_vertex_count():
    """VertexCount (test.cc:2539-2548)."""
    rng = np.random.default_rng(1)
    for _ in range(ITERS):
        loops = [np.array([random_point(rng), random_point(rng)])]
        check_invalid(loops, {LOOP_NOT_ENOUGH_VERTICES})


def test_duplicate_vertex():
    """DuplicateVertex (test.cc:2550-2567)."""
    rng = np.random.default_rng(2)
    for _ in range(ITERS):
        loops = concentric_loops(rng, 1, 3)
        v = loops[0]
        n = len(v)
        i = int(rng.integers(0, n))
        j = int(rng.integers(0, n - 1))
        v[i] = v[j + (1 if j >= i else 0)]
        check_invalid(
            loops,
            {
                DUPLICATE_VERTICES,
                POLYGON_INCONSISTENT_LOOP_ORIENTATIONS,
                OVERLAPPING_GEOMETRY,
            },
        )


def test_self_intersection():
    """SelfIntersection (test.cc:2569-2586): swapping adjacent vertices
    of one loop creates a crossing."""
    rng = np.random.default_rng(3)
    for _ in range(ITERS):
        loops = concentric_loops(rng, int(rng.integers(1, 7)), 5)
        li = int(rng.integers(0, len(loops)))
        v = loops[li]
        n = len(v)
        i = int(rng.integers(0, n))
        v[[i, (i + 1) % n]] = v[[(i + 1) % n, i]]
        check_invalid(
            loops,
            {
                DUPLICATE_VERTICES,
                OVERLAPPING_GEOMETRY,
                POLYGON_INCONSISTENT_LOOP_ORIENTATIONS,
            },
        )


def test_full_loop_with_others():
    """FullLoop (test.cc:2610-2625): a full loop is only an error when
    other loops exist."""
    rng = np.random.default_rng(4)
    for _ in range(ITERS):
        loops = concentric_loops(rng, int(rng.integers(1, 6)), 3)
        loops.append(np.empty((0, 3)))  # the full loop
        check_invalid(loops, {POLYGON_EMPTY_LOOP})


def test_duplicate_edge():
    """DuplicateEdge (test.cc:2650-2678): shared or reversed edges
    between loops are invalid."""
    rng = np.random.default_rng(5)
    for _ in range(ITERS):
        loops = concentric_loops(rng, 2, 4)
        n = len(loops[0])
        if rng.random() < 0.5:
            # shared edge, same direction
            i = int(rng.integers(0, n))
            loops[0][i] = loops[1][i]
            loops[0][(i + 1) % n] = loops[1][(i + 1) % n]
        else:
            # reversed edge: cut loop 0 along a diagonal
            split = int(rng.integers(2, n - 1))
            loops[1] = np.concatenate([loops[0][:1], loops[0][split:]])
            loops[0] = loops[0][: split + 1]
        check_invalid(
            loops,
            {
                DUPLICATE_VERTICES,
                OVERLAPPING_GEOMETRY,
                POLYGON_INCONSISTENT_LOOP_ORIENTATIONS,
            },
        )


def test_fuzz():
    """FuzzTest (test.cc:2733-2790): arbitrary garbage (zero and NaN
    vertices, random tiny loops) must never crash the validators."""
    rng = np.random.default_rng(6)
    for _ in range(ITERS):
        num_loops = int(rng.integers(2, 12))
        loops = []
        for _i in range(num_loops):
            num_vertices = int(rng.integers(0, 10))
            pts = []
            while len(pts) < num_vertices:
                r = rng.random()
                if r < 0.1:
                    pts.append(np.zeros(3))
                elif r < 0.2:
                    pts.append(np.full(3, np.nan))
                elif r < 0.3 and pts:
                    pts.append(pts[int(rng.integers(0, len(pts)))])
                else:
                    pts.append(random_point(rng))
            loops.append(
                np.asarray(pts, float).reshape(-1, 3)
                if pts
                else np.empty((0, 3))
            )
        shape = lax_polygon_vshape(loops)
        with np.errstate(all="ignore"):
            LegacyValidQuery().validate([shape])
            ValidQuery().validate([shape])
