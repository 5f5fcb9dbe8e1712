"""S2ClosestPointQuery fixture ports (s2closest_point_query_test.cc).

The reference validates the optimized query against brute force under
randomized options (max_results / max_distance / max_error / region)
and four target types; CheckDistanceResults (s2testing.h:131-215) is
the comparison contract, allowing max_error slack plus a 1e-15 rad
pruning budget.  Randomness uses numpy RandomState for determinism.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.closest_edge import Shape
from s2geometry_spark.kernel.contains import Loop, Polygon
from s2geometry_spark.kernel.distance import angle_to_chord2, chord2_to_angle
from s2geometry_spark.kernel import cellid as cid_np
from s2geometry_spark.kernel.fractal import (
    Fractal,
    frame_at,
    from_frame,
    make_regular_points,
    random_point,
    sample_cap_point,
)
from s2geometry_spark.kernel.metrics import MAX_DIAG
from s2geometry_spark.kernel.point_index import (
    CellTarget,
    ClosestPointQuery,
    EdgeTarget,
    Options,
    PointIndex,
    PointTarget,
    Result,
    ShapeIndexTarget,
)
from s2geometry_spark.kernel.region import LatLng, LatLngRect
from s2geometry_spark.kernel.intervals import R1Interval, S1Interval

KM_TO_RAD = 1.0 / 6371.01  # S2Testing::KmToAngle, s2earth kEarthRadiusKm
TEST_CAP_RADIUS = 10 * KM_TO_RAD
MAX_PRUNING_ERROR_RAD = 1e-15  # s2testing.h:206


def test_no_points():
    """s2closest_point_query_test.cc:69-75."""
    index = PointIndex()
    q = ClosestPointQuery(index)
    assert q.find_closest_points(PointTarget([1, 0, 0])) == []


def test_many_duplicate_points():
    """s2closest_point_query_test.cc:77-88."""
    index = PointIndex()
    for i in range(10000):
        index.add([1.0, 0.0, 0.0], i)
    q = ClosestPointQuery(index)
    res = q.find_closest_points(PointTarget([1.0, 0.0, 0.0]))
    assert len(res) == 10000


def test_empty_target_optimized():
    """s2closest_point_query_test.cc:90-103: optimized path with a
    distance limit and an empty shape-index target."""
    rng = np.random.RandomState(20260817)
    index = PointIndex()
    for i in range(1000):
        index.add(random_point(rng), i)
    q = ClosestPointQuery(index)
    q.options.set_max_distance_rad(1e-5)
    target = ShapeIndexTarget([], include_interiors=True)
    assert q.find_closest_points(target) == []


# ------------------------------------------------------- harness
def check_result_set(x, y, max_size, max_distance2, max_error2, label):
    """s2testing.h CheckResultSet (131-197), distances as chord2."""
    dists = [r[0] for r in x]
    assert dists == sorted(dists), f"{label}: results not sorted"
    max_err_angle = chord2_to_angle(min(max_error2, 4.0))
    if len(x) < max_size:
        if max_distance2 == math.inf:
            limit_angle = math.inf
        else:
            limit_angle = (
                chord2_to_angle(min(max_distance2, 4.0)) - MAX_PRUNING_ERROR_RAD
            )
    elif x:
        limit_angle = (
            chord2_to_angle(min(x[-1][0], 4.0))
            - max_err_angle
            - MAX_PRUNING_ERROR_RAD
        )
    else:
        limit_angle = 0.0
    ok = True
    for yd, yid in y:
        count = sum(1 for _, xid in x if xid == yid)
        if chord2_to_angle(min(yd, 4.0)) < limit_angle and count != 1:
            ok = False
    return ok


def check_distance_results(expected, actual, max_size, max_distance2, max_error2):
    return check_result_set(
        actual, expected, max_size, max_distance2, max_error2, "missing"
    ) and check_result_set(
        expected, actual, max_size, max_distance2, 0.0, "extra"
    )


def get_closest_points(target, query, opts):
    results = []
    got = ClosestPointQuery(query.index, opts).find_closest_points(target)
    assert len(got) <= opts.max_results
    for r in got:
        if opts.region is not None:
            assert opts.region.contains_point(r.point)
        assert r.distance2 < opts.max_distance2
        results.append((r.distance2, r.data))
    if opts.region is None and opts.max_distance2 == math.inf:
        assert len(got) == min(opts.max_results, query.index.num_points())
    return results


def run_find_closest_points(target, query):
    brute = Options(**{**query.options.__dict__})
    brute.use_brute_force = True
    expected = get_closest_points(target, query, brute)
    opt = Options(**{**query.options.__dict__})
    opt.use_brute_force = False
    actual = get_closest_points(target, query, opt)
    assert check_distance_results(
        expected, actual, query.options.max_results,
        query.options.max_distance2, query.options.max_error2,
    ), (
        f"max_results={query.options.max_results} "
        f"max_distance2={query.options.max_distance2} "
        f"max_error2={query.options.max_error2}"
    )
    if not expected:
        return
    # GetDistance / IsDistanceLess consistency (test.cc:213-228)
    min_d2 = expected[0][0]
    max_err_angle = chord2_to_angle(min(query.options.max_error2, 4.0))
    # the reference reuses the SAME query (same region/max_distance
    # options) for the distance-predicate checks (test.cc:219-228)
    got = ClosestPointQuery(query.index, query.options).get_distance2(target)
    assert chord2_to_angle(min(got, 4.0)) <= (
        chord2_to_angle(min(min_d2, 4.0)) + max_err_angle + 1e-15
    )
    q = ClosestPointQuery(query.index, query.options)
    lower = angle_to_chord2(
        max(0.0, chord2_to_angle(min(min_d2, 4.0)) - max_err_angle - 1e-15)
    )
    if lower > 0:
        assert not q.is_distance_less(target, float(lower) * (1 - 1e-12))
    assert q.is_distance_less_or_equal(target, min_d2)
    assert q.is_conservative_distance_less_or_equal(target, min_d2)


# point-index factories (test.cc:105-168)
def circle_points(rng, center, radius_rad, n, index):
    for i, p in enumerate(make_regular_points(center, radius_rad, n)):
        index.add(p, i)


def fractal_points(rng, center, radius_rad, n, index):
    f = Fractal(rng)
    f.set_level_for_approx_max_edges(n)
    f.set_fractal_dimension(1.5)
    v = f.make_vertices(frame_at(rng, center), radius_rad)
    for i, p in enumerate(v):
        index.add(p, i)


def grid_points(rng, center, radius_rad, n, index):
    sqrt_n = math.ceil(math.sqrt(n))
    frame = frame_at(rng, center)
    spacing = 2 * radius_rad / sqrt_n
    for i in range(sqrt_n):
        for j in range(sqrt_n):
            p = np.array([
                math.tan((i + 0.5) * spacing - radius_rad),
                math.tan((j + 0.5) * spacing - radius_rad),
                1.0,
            ])
            q = from_frame(frame, p / np.linalg.norm(p))
            index.add(q / np.linalg.norm(q), i * sqrt_n + j)


def fractal_loop_shapes(rng, center, radius_rad, num_edges):
    f = Fractal(rng)
    f.set_level_for_approx_max_edges(num_edges)
    loop = f.make_loop(frame_at(rng, center), radius_rad)
    v = loop.vertices
    return [Shape(0, 2, v, np.roll(v, -1, axis=0), polygon=Polygon([loop]))]


def run_with_factory(factory, num_indexes, num_points, num_queries, seed):
    rng = np.random.RandomState(seed)
    caps = []
    indexes = []
    for _ in range(num_indexes):
        center = random_point(rng)
        caps.append((center, TEST_CAP_RADIUS))
        idx = PointIndex()
        factory(rng, center, TEST_CAP_RADIUS, num_points, idx)
        indexes.append(idx)
    for _ in range(num_queries):
        i_index = rng.randint(num_indexes)
        center, cap_radius = caps[i_index]
        query_radius = 2 * cap_radius
        query = ClosestPointQuery(indexes[i_index])
        if rng.uniform() < 0.8:
            query.options.max_results = rng.randint(1, 11)
        if rng.uniform() < 2.0 / 3:
            query.options.set_max_distance_rad(rng.uniform() * query_radius)
        if rng.uniform() < 0.5:
            # log-uniform max_error in [1e-4, 1] * query_radius
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
                    math.radians(lng_c - half_lng), math.radians(lng_c + half_lng)
                ),
            )
        target_type = rng.randint(4)
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
            leaf = int(cid_np.from_point(
                np.array([a[0]]), np.array([a[1]]), np.array([a[2]])
            )[0])
            target = CellTarget(Cell(CID(leaf).parent(level)))
        else:
            shapes = fractal_loop_shapes(rng, center, cap_radius, 32)
            target = ShapeIndexTarget(
                shapes, include_interiors=bool(rng.uniform() < 0.5)
            )
        run_find_closest_points(target, query)


def test_circle_points():
    run_with_factory(circle_points, 4, 300, 20, seed=1)


def test_fractal_points():
    run_with_factory(fractal_points, 4, 300, 20, seed=2)


def test_grid_points():
    run_with_factory(grid_points, 4, 300, 20, seed=3)


def test_conservative_cell_distance_is_used():
    """test.cc:335-341: small indexes + fractal geometry stress the
    bucket pruning bound."""
    run_with_factory(fractal_points, 3, 100, 10, seed=4)
