"""Port of the s2cell_test.cc bound-robustness trio:
CellVsLoopRectBound (cell and loop bounds contain each other within
their documented max errors), RectBoundIsLargeEnough (points nearly on
cell edges), ConsistentWithS2CellIdFromPoint (+ the pinned Example1 /
AmbiguousContainsPoint regressions)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.bounder import LatLngRectBounder
from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.coords import xyz_to_latlng
from s2geometry_spark.kernel.fractal import sample_cap_point
from s2geometry_spark.kernel.polyline import point_on_line

DBL_EPSILON = 2.220446049250313e-16


def _random_cid(rng, level=None) -> CID:
    if level is None:
        level = int(rng.randint(0, 31))
    face = int(rng.randint(0, 6))
    pos = int(rng.randint(0, 1 << 30)) << 31 | int(rng.randint(0, 1 << 31))
    return CID(((face << 61) | pos | 1) & ((1 << 64) - 1)).parent(level)


def _cell_loop(cell: Cell):
    from s2geometry_spark.kernel.contains import Loop

    return Loop(np.stack([cell.get_vertex(k) for k in range(4)]))


def _loop_bound(cell: Cell):
    from s2geometry_spark.kernel.region import LatLngRect, S1Interval

    b = LatLngRectBounder()
    for k in range(5):
        b.add_point(cell.get_vertex(k % 4))
    bound = b.get_bound()
    # S2Loop::InitBound pole rule (s2loop.cc): a loop containing a pole
    # gets that pole's latitude extreme and FULL longitude
    loop = _cell_loop(cell)
    north = bool(loop.contains(np.array([[0.0, 0.0, 1.0]]))[0])
    south = bool(loop.contains(np.array([[0.0, 0.0, -1.0]]))[0])
    if north or south:
        from s2geometry_spark.kernel.region import R1Interval

        lat = R1Interval(
            -math.pi / 2 if south else bound.lat.lo,
            math.pi / 2 if north else bound.lat.hi,
        )
        bound = LatLngRect(lat, S1Interval.full())
    return bound


def _contains_rect(outer, inner) -> bool:
    return (outer.lat.lo <= inner.lat.lo and inner.lat.hi <= outer.lat.hi
            and outer.lng.contains_interval(inner.lng))


def test_cell_vs_loop_rect_bound():
    """test.cc:464-492 (300 of the reference's 1000 iterations)."""
    # S2LatLngRectBounder::MaxErrorForTests: lat 10*eps, lng 10*eps
    loop_err_lat = 10 * DBL_EPSILON
    loop_err_lng = 10 * DBL_EPSILON
    cell_err_lat = 2 * DBL_EPSILON
    cell_err_lng = 4 * DBL_EPSILON
    rng = np.random.RandomState(20260819)
    for _ in range(300):
        cell = Cell(_random_cid(rng))
        cell_bound = cell.get_rect_bound()
        loop_bound = _loop_bound(cell)
        assert _contains_rect(
            loop_bound.expanded_radians(cell_err_lat, cell_err_lng),
            cell_bound)
        assert _contains_rect(
            cell_bound.expanded_radians(loop_err_lat, loop_err_lng),
            loop_bound)


def _near_edge_point(rng, cell: Cell) -> np.ndarray:
    i = int(rng.randint(0, 4))
    v1 = cell.get_vertex(i)
    v2 = sample_cap_point(rng, cell.get_vertex((i + 1) % 4), 1e-15)
    ang = math.acos(max(-1.0, min(1.0, float(v1 @ v2))))
    return point_on_line(v1, v2, rng.uniform() * ang)


def test_rect_bound_is_large_enough():
    """test.cc:494-512: whenever the cell contains a point nearly on an
    edge, the rect bound contains its LatLng (300 accepted samples)."""
    rng = np.random.RandomState(7)
    n = 0
    while n < 300:
        cell = Cell(_random_cid(rng))
        p = _near_edge_point(rng, cell)
        # the reference gates on S2Loop(cell).Contains(p) — the exact
        # loop containment, not the padded S2Cell::Contains
        if bool(_cell_loop(cell).contains(p[None])[0]):
            rect = cell.get_rect_bound()
            lat, lng = xyz_to_latlng(p[0], p[1], p[2])
            assert rect.contains_point(p), (cell.id.id, lat, lng)
            n += 1


def test_consistent_with_cellid_from_point():
    """test.cc:514-536: S2Cell(S2CellId(p)).Contains(p) for points
    nearly on cell edges (300 iterations, leaf-biased)."""
    rng = np.random.RandomState(11)
    for _ in range(300):
        level = 30 if rng.rand() < 0.5 else int(rng.randint(0, 30))
        cell = Cell(_random_cid(rng, level))
        p = _near_edge_point(rng, cell)
        leaf = CID(int(K.from_point(np.array([p[0]]), np.array([p[1]]),
                                    np.array([p[2]]))[0]))
        assert Cell(leaf).contains_point(p), (leaf.id, p)


def test_consistent_with_cellid_from_point_example1():
    """test.cc:538-546 (github issue 463)."""
    p = np.array([0.38203141040035632, 0.030196609707941954,
                  0.9236558700239289])
    leaf = CID(int(K.from_point(np.array([p[0]]), np.array([p[1]]),
                                np.array([p[2]]))[0]))
    assert Cell(leaf).contains_point(p)


def test_ambiguous_contains_point():
    """s2cell_id AmbiguousContainsPoint (test.cc:548-575): lat/lng →
    xyz rounding can flip the chosen neighbor; Contains() must still
    hold for the returned cell."""
    from s2geometry_spark.kernel.coords import latlng_to_xyz

    x, y, z = latlng_to_xyz(np.array([2.0]), np.array([90.0]))
    p = np.array([x[0], y[0], z[0]])
    leaf = CID(int(K.from_point(np.array([p[0]]), np.array([p[1]]),
                                np.array([p[2]]))[0]))
    assert Cell(leaf).contains_point(p)
