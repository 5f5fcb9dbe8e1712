"""s2cell_union_test.cc Expand + ContainsIntersectsBruteForce +
CapBoundContainsAllCells ports, with the CheckCovering harness from
tests/test_buffered_region.py.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import cellunion as CU
from s2geometry_spark.kernel.cell import Cell, average_area, cell_distance2
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.coverer import RegionCoverer
from s2geometry_spark.kernel.distance import chord2_to_angle
from s2geometry_spark.kernel.fractal import random_point
from s2geometry_spark.kernel.metrics import MAX_DIAG, MIN_WIDTH
from s2geometry_spark.kernel.region import Cap
from tests.test_buffered_region import check_covering


def random_cap(rng, min_area, max_area) -> Cap:
    area = max_area * (min_area / max_area) ** rng.uniform()
    return Cap(random_point(rng), area / math.pi)


def union_radius(covering: list[CID], center: np.ndarray) -> float:
    """GetRadius helper: max distance from center to any covering
    point (via the max cell-vertex distance)."""
    from s2geometry_spark.kernel.cell import _cell_vertices
    from s2geometry_spark.kernel.distance import chord2

    worst = 0.0
    for cid in covering:
        v = _cell_vertices(Cell(cid))
        worst = max(worst, float(chord2(v, center).max()))
    return float(chord2_to_angle(worst))


def test_expand():
    """test.cc Expand (40 reduced iterations)."""
    rng = np.random.RandomState(151)
    for _ in range(40):
        cap = random_cap(rng, average_area(30), 4 * math.pi)
        factor = math.exp(rng.uniform(0.0, math.log(1e2)))
        new_height = min(2.0, factor * cap.height())
        expanded_cap = Cap(cap.center, 2 * new_height)
        radius = expanded_cap.radius_radians() - cap.radius_radians()
        max_level_diff = rng.randint(0, 8)

        max_cells = 1 + int(rng.exponential(2))
        coverer = RegionCoverer(max_cells=max(1, max_cells))
        covering = coverer.get_covering(cap)
        check_covering(cap, covering, check_tight=True)
        covering_radius = union_radius(covering, cap.center)

        min_level = min(c.level() for c in covering)
        expand_level = min(
            min_level + max_level_diff,
            MIN_WIDTH.get_level_for_min_value(radius),
        )
        expanded = CU.expand_radius(covering, radius, max_level_diff)
        check_covering(expanded_cap, expanded, check_tight=False)
        expanded_radius = union_radius(expanded, cap.center)
        assert expanded_radius - covering_radius <= \
            2 * MAX_DIAG.get_value(expand_level)


def test_contains_intersects_brute_force():
    """test.cc ContainsIntersectsBruteForce over random normalized
    unions: Contains/Intersects agree with per-leaf brute force."""
    rng = np.random.RandomState(152)
    for _ in range(60):
        cells = []
        for _ in range(rng.randint(1, 10)):
            p = random_point(rng)
            from s2geometry_spark.kernel import cellid as cid_np

            leaf = CID(int(cid_np.from_point(
                np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
            )[0]))
            cells.append(leaf.parent(rng.randint(4, 20)))
        u = CU.normalize(cells)
        for _ in range(20):
            p = random_point(rng)
            from s2geometry_spark.kernel import cellid as cid_np

            leaf = CID(int(cid_np.from_point(
                np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
            )[0]))
            probe = leaf.parent(rng.randint(4, 30))
            want_contains = any(c.contains(probe) for c in u)
            want_intersects = any(c.intersects(probe) for c in u)
            assert CU.contains_id(u, probe) == want_contains
            got_intersection = CU.intersection(u, [probe])
            assert bool(got_intersection) == want_intersects


def test_cap_bound_contains_all_cells():
    """test.cc CapBoundContainsAllCells via CellUnionRegion."""
    from s2geometry_spark.kernel.region import CellUnionRegion

    rng = np.random.RandomState(153)
    for _ in range(30):
        cells = []
        for _ in range(rng.randint(1, 8)):
            p = random_point(rng)
            from s2geometry_spark.kernel import cellid as cid_np

            leaf = CID(int(cid_np.from_point(
                np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
            )[0]))
            cells.append(leaf.parent(rng.randint(2, 20)))
        u = CU.normalize(cells)
        cap = CellUnionRegion(u).get_cap_bound()
        for cid in u:
            # every cell of the union lies inside the bounding cap
            from s2geometry_spark.kernel.cell import _cell_vertices
            from s2geometry_spark.kernel.distance import chord2

            v = _cell_vertices(Cell(cid))
            r2 = (2 * math.sin(0.5 * cap.radius_radians())) ** 2
            assert float(chord2(v, cap.center).max()) <= r2 * (1 + 1e-12)
