"""S2Cell distance fixture ports (s2cell_test.cc:560-860): min/max
distances to points, edges, and cells verified against the reference's
brute-force helpers, including the projection counterexamples.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import cellid as cid_np
from s2geometry_spark.kernel.cell import (
    Cell,
    cell_cell_distance2,
    cell_cell_max_distance2,
    cell_distance2,
    cell_edge_distance2,
    cell_edge_max_distance2,
    cell_point_max_distance2,
    edge_point_max_dist2,
    _cell_vertices,
)
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.distance import (
    chord2,
    chord2_to_angle,
    point_edge_dist2,
)
from s2geometry_spark.kernel.fractal import random_point, sample_cap_point
from s2geometry_spark.kernel.predicates import crossing_sign
from s2geometry_spark.kernel.region import cell_cap_bound


def rad(d2: float) -> float:
    return float(chord2_to_angle(min(max(d2, 0.0), 4.0)))


def random_cell(rng) -> Cell:
    p = random_point(rng)
    leaf = CID(int(cid_np.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )[0]))
    return Cell(leaf.parent(rng.randint(0, 31)))


def from_debug(s: str) -> Cell:
    return Cell(CID(int(cid_np.from_debug_string(s)[0])))


def brute_cell_cell(a: Cell, b: Cell) -> float:
    """GetDistanceToCellBruteForce (test.cc:591-622), chord2."""
    if a.face == b.face:
        if (a.u_lo <= b.u_hi and b.u_lo <= a.u_hi
                and a.v_lo <= b.v_hi and b.v_lo <= a.v_hi):
            return 0.0
    va, vb = _cell_vertices(a), _cell_vertices(b)
    best = math.inf
    for i in range(4):
        best = min(
            best,
            float(point_edge_dist2(
                va[i][None], vb, np.roll(vb, -1, axis=0)).min()),
            float(point_edge_dist2(
                vb[i][None], va, np.roll(va, -1, axis=0)).min()),
        )
    return best


def brute_cell_edge(cell: Cell, a, b) -> float:
    """GetDistanceToEdgeBruteForce (test.cc:560-580), chord2."""
    if cell.contains_point(a) or cell.contains_point(b):
        return 0.0
    v = _cell_vertices(cell)
    best = math.inf
    for i in range(4):
        v0, v1 = v[i], v[(i + 1) & 3]
        if crossing_sign(a, b, v0, v1) >= 0:
            return 0.0
        best = min(
            best,
            float(point_edge_dist2(a[None], v0[None], v1[None])[0, 0]),
            float(point_edge_dist2(b[None], v0[None], v1[None])[0, 0]),
            float(point_edge_dist2(v0[None], a[None], b[None])[0, 0]),
        )
    return best


def brute_max_point(cell: Cell, target) -> float:
    if cell.contains_point(-np.asarray(target, float)):
        return 4.0
    v = _cell_vertices(cell)
    return max(
        edge_point_max_dist2(target, v[i], v[(i + 1) & 3]) for i in range(4)
    )


def test_get_distance_to_cell():
    """test.cc:624-638, 1500 random pairs."""
    rng = np.random.RandomState(71)
    for _ in range(1500):
        c1, c2 = random_cell(rng), random_cell(rng)
        expected = brute_cell_cell(c1, c2)
        actual = cell_cell_distance2(c1, c2)
        assert abs(rad(expected) - rad(actual)) < 1e-15, (c1.id, c2.id)


def test_get_distance_to_cell_high_difference_example():
    c1 = from_debug("4/0112122")
    c2 = from_debug("4/2110333")
    assert abs(
        rad(brute_cell_cell(c1, c2)) - rad(cell_cell_distance2(c1, c2))
    ) < 1e-15


def test_get_distance_to_cell_projection_example1():
    c1 = from_debug("1/00100000113012032112132121101")
    c2 = from_debug("1/333")
    assert abs(
        rad(brute_cell_cell(c1, c2)) - rad(cell_cell_distance2(c1, c2))
    ) < 1e-15


def test_get_distance_to_cell_projection_example2():
    c1 = from_debug("2/11033230030133")
    c2 = from_debug("2/222")
    assert abs(
        rad(brute_cell_cell(c1, c2)) - rad(cell_cell_distance2(c1, c2))
    ) < 1e-15


def test_get_distance_to_point():
    """test.cc:685-710: boundary / interior / max distances."""
    rng = np.random.RandomState(72)
    for _ in range(500)        :
        cell = random_cell(rng)
        target = random_point(rng)
        v = _cell_vertices(cell)
        boundary = float(
            point_edge_dist2(target[None], v, np.roll(v, -1, axis=0)).min()
        )
        interior = 0.0 if cell.contains_point(target) else boundary
        got_interior = cell_distance2(cell, target)
        got_max = cell_point_max_distance2(cell, target)
        want_max = brute_max_point(cell, target)
        assert abs(rad(interior) - rad(got_interior)) < 1e-12
        if rad(want_max) <= math.pi / 3:
            assert abs(rad(want_max) - rad(got_max)) < 1e-15
        else:
            assert abs(rad(want_max) - rad(got_max)) < 3e-8


def choose_edge_near_cell(rng, cell: Cell):
    cap = cell_cap_bound(cell)
    if rng.rand() < 0.2:
        a = random_point(rng)
    else:
        a = sample_cap_point(rng, cap.center, 1.5 * cap.radius_radians())
    max_length = min(
        math.exp(rng.uniform(math.log(1e-2), math.log(1e2)))
        * cap.radius_radians(),
        math.pi / 2,
    )
    b = sample_cap_point(rng, a, max_length)
    if rng.rand() < 0.05:
        a, b = -a, -b
    return a, b


def brute_max_edge(cell: Cell, a, b) -> float:
    """GetMaxDistanceToEdgeBruteForce (test.cc), chord2."""
    if cell.contains_point(-np.asarray(a, float)) or cell.contains_point(
        -np.asarray(b, float)
    ):
        return 4.0
    v = _cell_vertices(cell)
    best = -1.0
    for i in range(4):
        v0, v1 = v[i], v[(i + 1) & 3]
        if crossing_sign(-a, -b, v0, v1) >= 0:
            return 4.0
        best = max(
            best,
            edge_point_max_dist2(a, v0, v1),
            edge_point_max_dist2(b, v0, v1),
            edge_point_max_dist2(v0, a, b),
        )
    return best


def test_get_distance_to_edge():
    """test.cc:789-818."""
    rng = np.random.RandomState(73)
    for _ in range(500):
        cell = random_cell(rng)
        a, b = choose_edge_near_cell(rng, cell)
        expected_min = rad(brute_cell_edge(cell, a, b))
        actual_min = rad(cell_edge_distance2(cell, a, b))
        if expected_min > math.pi / 2:
            assert abs(expected_min - actual_min) < 3e-8
        elif expected_min <= math.pi / 3:
            assert abs(expected_min - actual_min) < 1e-15
        else:
            assert abs(expected_min - actual_min) < 1e-12
        # max distance vs brute force (GetMaxDistanceToEdgeBruteForce)
        bm = brute_max_edge(cell, a, b)
        actual_max = rad(cell_edge_max_distance2(cell, a, b))
        assert abs(rad(bm) - actual_max) < 1e-12


def test_get_max_distance_to_cell_antipodal():
    """test.cc:834-840."""
    from s2geometry_spark.kernel.coords import latlng_to_xyz

    x, y, z = latlng_to_xyz(np.array([0.0]), np.array([0.0]))
    p = np.array([x[0], y[0], z[0]])
    leaf = CID(int(cid_np.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )[0]))
    anti = CID(int(cid_np.from_point(
        np.array([-p[0]]), np.array([-p[1]]), np.array([-p[2]])
    )[0]))
    assert cell_cell_max_distance2(Cell(leaf), Cell(anti)) == 4.0


def test_get_max_distance_to_cell():
    """test.cc:842-856: max distance ≍ π − min distance to the
    antipodal cell."""
    rng = np.random.RandomState(74)
    for _ in range(500):
        cell = random_cell(rng)
        test_cell = random_cell(rng)
        c = test_cell.get_center()
        anti_leaf = CID(int(cid_np.from_point(
            np.array([-c[0]]), np.array([-c[1]]), np.array([-c[2]])
        )[0]))
        anti_cell = Cell(anti_leaf.parent(test_cell.level))
        dist_from_min = math.pi - rad(cell_cell_distance2(cell, anti_cell))
        dist_from_max = rad(cell_cell_max_distance2(cell, test_cell))
        assert abs(dist_from_min - dist_from_max) < 1e-8
