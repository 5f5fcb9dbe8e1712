"""S2ClosestCellQuery fixture ports (s2closest_cell_query_test.cc).

Brute-vs-optimized consistency under randomized options over two index
factories (point-cloud leaf cells, cap coverings), plus the directed
unit cases: empty index, option preservation, distance-equal-to-limit
predicate boundaries, interior hits, and empty targets.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import cellid as cid_np
from s2geometry_spark.kernel.cell import Cell, cell_cell_distance2
from s2geometry_spark.kernel.cell_index import (
    CellIndex,
    CellUnionTarget,
    ClosestCellQuery,
)
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.coverer import RegionCoverer
from s2geometry_spark.kernel.fractal import (
    frame_at,
    random_point,
    sample_cap_point,
)
from s2geometry_spark.kernel.intervals import R1Interval, S1Interval
from s2geometry_spark.kernel.metrics import MAX_DIAG
from s2geometry_spark.kernel.point_index import (
    CellTarget,
    EdgeTarget,
    Options,
    PointTarget,
    ShapeIndexTarget,
)
from s2geometry_spark.kernel.region import Cap, LatLngRect
from tests.test_closest_point import (
    KM_TO_RAD,
    check_distance_results,
    fractal_loop_shapes,
)

TEST_CAP_RADIUS = 10 * KM_TO_RAD


def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.array([float(lat)]), np.array([float(lng)]))
    return np.array([x[0], y[0], z[0]])


def _leaf(lat, lng):
    p = _pt(lat, lng)
    return CID(int(cid_np.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )[0]))


def _leaf_of_point(p):
    return CID(int(cid_np.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )[0]))


def test_no_cells():
    """test.cc:74-86."""
    index = CellIndex()
    index.build()
    q = ClosestCellQuery(index)
    target = PointTarget([1, 0, 0])
    r = q.find_closest_cell(target)
    assert r.distance2 == math.inf
    assert r.cell_id is None
    assert r.label == -1
    assert r.is_empty()
    assert q.get_distance2(target) == math.inf


def test_options_not_modified():
    """test.cc:87-111: FindClosestCell/GetDistance/IsDistanceLess leave
    the caller's options untouched."""
    opts = Options(max_results=3)
    opts.set_max_distance_rad(math.radians(3))
    opts.set_max_error_rad(math.radians(0.001))
    index = CellIndex()
    index.add(_leaf(1, 1), 1)
    index.add(_leaf(1, 2), 2)
    index.add(_leaf(1, 3), 3)
    index.build()
    q = ClosestCellQuery(index, opts)
    target = PointTarget(_pt(2, 2))
    assert q.find_closest_cell(target).label == 2
    deg = math.degrees(
        2 * math.asin(0.5 * math.sqrt(q.get_distance2(target)))
    )
    assert abs(deg - 1.0) < 1e-7
    s = 2 * math.sin(0.5 * math.radians(1.5))
    assert q.is_distance_less(target, s * s)
    assert q.options.max_results == 3
    assert abs(
        q.options.max_distance2 - (2 * math.sin(math.radians(3) / 2)) ** 2
    ) < 1e-18
    assert q.options.max_error2 == (2 * math.sin(math.radians(0.001) / 2)) ** 2


def test_distance_equal_to_limit():
    """test.cc:130-153: predicate behavior when distance == limit."""
    id0, id1 = _leaf(23, 12), _leaf(47, 11)
    index = CellIndex()
    index.add(id0, 0)
    index.build()
    q = ClosestCellQuery(index)

    target0 = CellTarget(Cell(id0))
    assert not q.is_distance_less(target0, 0.0)
    assert q.is_distance_less_or_equal(target0, 0.0)
    assert q.is_conservative_distance_less_or_equal(target0, 0.0)

    target1 = CellTarget(Cell(id1))
    dist1 = cell_cell_distance2(Cell(id0), Cell(id1))
    assert not q.is_distance_less(target1, dist1)
    assert q.is_distance_less_or_equal(target1, dist1)
    assert q.is_conservative_distance_less_or_equal(target1, dist1)


def test_target_point_inside_indexed_cell():
    """test.cc:155-167."""
    cell_id = CID(int(cid_np.from_debug_string("4/012")[0]))
    index = CellIndex()
    index.add(cell_id, 1)
    index.build()
    q = ClosestCellQuery(index)
    x, y, z = cid_np.to_point_raw(np.array([cell_id.id], dtype=np.uint64))
    p = np.array([x[0], y[0], z[0]])
    r = q.find_closest_cell(PointTarget(p / np.linalg.norm(p)))
    assert r.distance2 == 0.0
    assert r.cell_id == cell_id
    assert r.label == 1


def test_empty_target_optimized():
    """test.cc:169-184."""
    rng = np.random.RandomState(5)
    index = CellIndex()
    for i in range(1000):
        p = random_point(rng)
        level = rng.randint(0, 31)
        index.add(_leaf_of_point(p).parent(level), i)
    index.build()
    q = ClosestCellQuery(index)
    q.options.set_max_distance_rad(1e-5)
    target = ShapeIndexTarget([], include_interiors=True)
    assert q.find_closest_cells(target) == []


def test_empty_cell_union_target():
    """test.cc:186-201."""
    target = CellUnionTarget([])
    empty_index = CellIndex()
    empty_index.build()
    assert ClosestCellQuery(empty_index).get_distance2(target) == math.inf
    one = CellIndex()
    one.add(CID(int(cid_np.from_debug_string("1/123123")[0])), 1)
    one.build()
    assert ClosestCellQuery(one).get_distance2(target) == math.inf


# ------------------------------------------------------- harness
def point_cloud_cells(rng, center, radius_rad, n, index):
    for i in range(n):
        index.add(_leaf_of_point(sample_cap_point(rng, center, radius_rad)), i)


def caps_cells(rng, center, radius_rad, n, index, max_cells_per_cap=16,
               cap_density=0.1):
    cap_area = 2 * math.pi * (1 - math.cos(radius_rad))
    num_caps = (n - 1) // max_cells_per_cap + 1
    max_area = cap_area * cap_density / num_caps
    coverer = RegionCoverer(max_cells=max_cells_per_cap)
    for i in range(num_caps):
        c = sample_cap_point(rng, center, radius_rad)
        area = rng.uniform(0.0, max_area)
        cap = Cap(c, area / math.pi)  # FromCenterArea: height=area/2π
        index.add_cell_union(coverer.get_covering(cap), i)


def get_closest_cells(target, query, opts):
    results = []
    got = ClosestCellQuery(query.index, opts).find_closest_cells(target)
    assert len(got) <= opts.max_results
    if opts.region is None and opts.max_distance2 == math.inf:
        assert len(got) == min(opts.max_results, query.index.num_cells())
    for r in got:
        if opts.region is not None:
            assert opts.region.may_intersect_cell(Cell(r.cell_id))
        assert r.distance2 < opts.max_distance2
        results.append((r.distance2, (r.cell_id.id, r.label)))
    return results


def run_find_closest_cells(target, query):
    brute = Options(**{**query.options.__dict__})
    brute.use_brute_force = True
    expected = get_closest_cells(target, query, brute)
    opt = Options(**{**query.options.__dict__})
    opt.use_brute_force = False
    actual = get_closest_cells(target, query, opt)
    assert check_distance_results(
        expected, actual, query.options.max_results,
        query.options.max_distance2, query.options.max_error2,
    )
    if not expected:
        return
    from s2geometry_spark.kernel.distance import chord2_to_angle

    min_d2 = expected[0][0]
    max_err_angle = chord2_to_angle(min(query.options.max_error2, 4.0))
    q = ClosestCellQuery(query.index, query.options)
    got = q.get_distance2(target)
    assert chord2_to_angle(min(got, 4.0)) <= (
        chord2_to_angle(min(min_d2, 4.0)) + max_err_angle + 1e-15
    )
    assert q.is_conservative_distance_less_or_equal(target, min_d2)


def run_with_factory(factory, num_indexes, num_cells, num_queries, seed):
    rng = np.random.RandomState(seed)
    caps = []
    indexes = []
    for _ in range(num_indexes):
        center = random_point(rng)
        caps.append((center, TEST_CAP_RADIUS))
        idx = CellIndex()
        factory(rng, center, TEST_CAP_RADIUS, num_cells, idx)
        idx.build()
        indexes.append(idx)
    for _ in range(num_queries):
        i_index = rng.randint(num_indexes)
        center, cap_radius = caps[i_index]
        query_radius = 2 * cap_radius
        query = ClosestCellQuery(indexes[i_index])
        if rng.uniform() < 0.9:
            query.options.max_results = rng.randint(1, 11)
        if rng.uniform() < 2.0 / 3:
            query.options.set_max_distance_rad(rng.uniform() * query_radius)
        if rng.uniform() < 0.5:
            query.options.set_max_error_rad(
                math.exp(rng.uniform(math.log(1e-4), 0.0)) * query_radius
            )
        if rng.uniform() < 0.2:
            c = sample_cap_point(rng, center, query_radius)
            lat_c = math.degrees(math.asin(max(-1, min(1, c[2]))))
            lng_c = math.degrees(math.atan2(c[1], c[0]))
            half_lat = math.degrees(rng.uniform() * cap_radius) / 2
            half_lng = math.degrees(rng.uniform() * cap_radius) / 2
            query.options.region = LatLngRect(
                R1Interval(
                    math.radians(max(-90, lat_c - half_lat)),
                    math.radians(min(90, lat_c + half_lat)),
                ),
                S1Interval.from_point_pair(
                    math.radians(lng_c - half_lng),
                    math.radians(lng_c + half_lng),
                ),
            )
        target_type = rng.randint(5)
        if target_type == 0:
            target = PointTarget(sample_cap_point(rng, center, query_radius))
        elif target_type == 1:
            a = sample_cap_point(rng, center, query_radius)
            b = sample_cap_point(
                rng, a,
                math.exp(rng.uniform(math.log(1e-4), 0.0)) * query_radius,
            )
            target = EdgeTarget(a, b)
        elif target_type == 2:
            min_level = MAX_DIAG.get_level_for_max_value(query_radius)
            level = rng.randint(min_level, 31)
            a = sample_cap_point(rng, center, query_radius)
            target = CellTarget(Cell(_leaf_of_point(a).parent(level)))
        elif target_type == 3:
            c = sample_cap_point(rng, center, query_radius)
            radius = math.exp(
                rng.uniform(math.log(1e-5), math.log(0.1))
            ) * query_radius
            coverer = RegionCoverer(max_cells=16)
            target = CellUnionTarget(
                coverer.get_covering(Cap.from_center_angle(c, radius))
            )
        else:
            shapes = fractal_loop_shapes(rng, center, cap_radius, 32)
            target = ShapeIndexTarget(
                shapes, include_interiors=bool(rng.uniform() < 0.5)
            )
        run_find_closest_cells(target, query)


def test_point_cloud_cells():
    run_with_factory(point_cloud_cells, 3, 50, 16, seed=21)


def test_caps_cells():
    run_with_factory(caps_cells, 3, 50, 16, seed=22)


def test_conservative_cell_distance_is_used():
    run_with_factory(point_cloud_cells, 3, 50, 8, seed=23)
