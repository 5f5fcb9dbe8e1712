"""Port of s2polygon_test.cc's depth-aware IsValidTest cases —
InconsistentOrientations (cc:2680-2688), LoopDepthNegative
(cc:2690-2712), LoopNestingInvalid (cc:2714-2733) — plus the
EmptyLoop valid-polygon assertion (cc:2588-2608) and
TestS2CellConstructorAndContains (cc:596-605), over the new
S2Polygon loop-depth machinery in kernel/validation.py
(init_nested / init_oriented / invert_nested /
polygon_find_validation_error_nested, mirroring s2polygon.cc:255-296,
300-390, 429-520)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cellid import from_latlng
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.contains import Polygon as EOPolygon
from s2geometry_spark.kernel.contains import Loop as EOLoop
from s2geometry_spark.kernel.fractal import make_regular_points
from s2geometry_spark.kernel.valid_query import (
    OK,
    POLYGON_INCONSISTENT_LOOP_ORIENTATIONS,
)
from s2geometry_spark.kernel.validation import (
    POLYGON_INVALID_LOOP_DEPTH,
    init_nested,
    init_oriented,
    polygon_find_validation_error_nested,
)

ITERS = 25


def random_point(rng) -> np.ndarray:
    p = rng.standard_normal(3)
    return p / np.linalg.norm(p)


def concentric_loops(rng, num_loops: int, min_vertices: int) -> list:
    """AddConcentricLoops (test.cc:2450-2459)."""
    center = random_point(rng)
    num_vertices = min_vertices + int(rng.integers(0, 10))
    return [
        np.asarray(
            make_regular_points(
                center, math.radians(80 * 0.1**i), num_vertices
            ),
            float,
        )
        for i in range(num_loops)
    ]


def shuffled(rng, loops: list) -> list:
    order = rng.permutation(len(loops))
    return [loops[i] for i in order]


def test_concentric_nested_is_valid():
    """Baseline sanity mirrored from IsValidTest.EmptyLoop
    (cc:2588-2608): concentric loops through InitNested are VALID (the
    S2Shape view presents holes reversed), and empty loops are dropped
    without invalidating the polygon."""
    rng = np.random.default_rng(11)
    for _ in range(ITERS):
        n = int(rng.integers(1, 6))
        loops = concentric_loops(rng, n, 3)
        # append empty loops (single-vertex z>=0 sentinel)
        for _ in range(int(rng.integers(1, 6))):
            loops.append(np.array([[0.0, 0.0, 1.0]]))
        poly = init_nested(shuffled(rng, loops))
        assert len(poly.loops) == n
        assert polygon_find_validation_error_nested(poly) == OK


def test_inconsistent_orientations():
    """IsValidTest.InconsistentOrientations (cc:2680-2688): >=2
    concentric loops all wound the same way through InitOriented must
    set the inconsistent-orientations flag."""
    rng = np.random.default_rng(12)
    for _ in range(ITERS):
        loops = concentric_loops(rng, int(rng.integers(2, 7)), 3)
        poly = init_oriented(shuffled(rng, loops))
        assert (
            polygon_find_validation_error_nested(poly)
            == POLYGON_INCONSISTENT_LOOP_ORIENTATIONS
        )


def test_oriented_consistent_input_is_valid():
    """Counterpart guard: a properly oriented shell+hole pair (hole
    wound clockwise = interior on the left of its directed edges is the
    OUTSIDE of the disc) passes InitOriented with no flag."""
    rng = np.random.default_rng(13)
    for _ in range(ITERS):
        loops = concentric_loops(rng, 2, 3)
        loops[1] = loops[1][::-1].copy()  # hole: reverse winding
        poly = init_oriented(shuffled(rng, loops))
        assert not poly.inconsistent_orientations
        assert polygon_find_validation_error_nested(poly) == OK
        assert [dl.depth for dl in poly.loops] == [0, 1]


def test_loop_depth_negative():
    """IsValidTest.LoopDepthNegative (cc:2690-2712): depth -1, or a
    depth that skips a level (parent depth + 2), is
    POLYGON_INVALID_LOOP_DEPTH regardless of geometry."""
    rng = np.random.default_rng(14)
    for _ in range(ITERS):
        loops = concentric_loops(rng, int(rng.integers(1, 5)), 3)
        poly = init_nested(shuffled(rng, loops))
        i = int(rng.integers(0, len(poly.loops)))
        if i == 0 or rng.random() < 1.0 / 3:
            poly.loops[i].depth = -1
        else:
            poly.loops[i].depth = poly.loops[i - 1].depth + 2
        assert (
            polygon_find_validation_error_nested(poly)
            == POLYGON_INVALID_LOOP_DEPTH
        )


def test_loop_nesting_invalid():
    """IsValidTest.LoopNestingInvalid (cc:2714-2733): inverting one
    stored loop breaks the orientation/nesting contract; half the
    iterations reverse ALL input loops first so the outer region covers
    almost the whole sphere (the bound-check-free code path)."""
    rng = np.random.default_rng(15)
    for _ in range(ITERS):
        loops = concentric_loops(rng, int(rng.integers(2, 6)), 3)
        if rng.random() < 0.5:
            loops = [v[::-1].copy() for v in loops]
        poly = init_nested(shuffled(rng, loops))
        i = int(rng.integers(0, len(poly.loops)))
        poly.loops[i].invert()
        err = polygon_find_validation_error_nested(poly)
        assert err != OK
        # the reference accepts {POLYGON_INVALID_LOOP_NESTING,
        # POLYGON_INCONSISTENT_LOOP_ORIENTATIONS}; the legacy query (which
        # has no depth channel) reports the orientation form
        assert err == POLYGON_INCONSISTENT_LOOP_ORIENTATIONS, err


def test_s2cell_constructor_and_contains():
    """TestS2CellConstructorAndContains (cc:596-605): the polygon of an
    S2Cell unioned with empty equals itself (mutual containment).  Here
    union-with-empty is init_nested of the cell's 4 vertices; mutual
    containment is checked on the even-odd region."""
    cid = int(from_latlng(
        np.array([40565459 / 1e6]), np.array([-74645276 / 1e6])
    )[0])
    cell = Cell(CID(cid))
    verts = np.asarray([cell.get_vertex(k) for k in range(4)], float)
    poly = init_nested([verts])
    assert polygon_find_validation_error_nested(poly) == OK
    a = EOPolygon([EOLoop(verts)])
    b = EOPolygon([EOLoop(dl.vertices) for dl in poly.loops])
    probe = np.asarray(
        [cell.get_center()] + [cell.get_vertex(k) for k in range(4)], float
    )
    assert (a.contains(probe) == b.contains(probe)).all()
