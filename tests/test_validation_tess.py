"""Validation query, edge tessellator, region union/intersection."""

import math

import numpy as np

from s2geometry_spark.kernel.contains import Polygon, parse_loop, parse_points, parse_polygon
from s2geometry_spark.kernel.coverer import RegionCoverer
from s2geometry_spark.kernel.region import Cap, RegionIntersection, RegionUnion
from s2geometry_spark.kernel.tessellate import tessellate_geodesic
from s2geometry_spark.kernel.validation import (
    find_loop_validation_error,
    find_polygon_validation_error,
)
from s2geometry_spark.operators.tiling import plate_carree_project


def test_loop_validation():
    ok = parse_points("0:0, 0:5, 5:5")
    assert find_loop_validation_error(ok) is None
    assert "fewer than 3" in find_loop_validation_error(parse_points("0:0, 0:5"))
    dup = np.concatenate([ok, ok[-1:]])
    assert "duplicate" in find_loop_validation_error(dup)
    bowtie = parse_points("0:0, 5:5, 0:5, 5:0")
    assert "cross" in find_loop_validation_error(bowtie)
    # non-unit vertex
    bad = ok.copy()
    bad[0] *= 1.001
    assert "unit length" in find_loop_validation_error(bad)


def test_polygon_validation():
    good = parse_polygon("0:0, 0:5, 5:5, 5:0; 1:1, 1:2, 2:2, 2:1")
    assert find_polygon_validation_error(good) is None
    crossing = parse_polygon("0:0, 0:5, 5:5, 5:0; 3:3, 3:8, 8:8, 8:3")
    assert "cross" in find_polygon_validation_error(crossing)


def test_tessellate_geodesic():
    a = parse_points("0:0")[0]
    b = parse_points("60:90")[0]
    tol = 1e-4
    chain = tessellate_geodesic(a, b, lambda la, ln: plate_carree_project(la, ln), tol)
    assert len(chain) > 2  # long geodesic needs subdivision in plate carrée
    # endpoints preserved
    assert abs(chain[0][0]) < 1e-12 and abs(chain[0][1]) < 1e-12
    # max deviation between consecutive projected points is bounded-ish
    for (x0, y0), (x1, y1) in zip(chain, chain[1:]):
        assert math.hypot(x1 - x0, y1 - y0) < 0.5
    # a short edge needs no subdivision
    c = parse_points("0:1")[0]
    assert len(tessellate_geodesic(a, c, lambda la, ln: plate_carree_project(la, ln), tol)) == 2


def test_region_union_intersection_coverings():
    cap1 = Cap.from_center_angle(parse_points("10:10")[0], 0.05)
    cap2 = Cap.from_center_angle(parse_points("12:12")[0], 0.05)
    union = RegionUnion([cap1, cap2])
    inter = RegionIntersection([cap1, cap2])
    cov_u = RegionCoverer(max_cells=12).get_covering(union)
    cov_i = RegionCoverer(max_cells=12).get_covering(inter)
    assert cov_u and cov_i
    # every covering cell of the intersection is within the union covering
    from s2geometry_spark.kernel import cellunion

    u_norm = cellunion.normalize(cov_u)
    for c in cov_i:
        assert any(p.intersects(c) for p in u_norm)
    # point semantics
    p_mid = parse_points("11:11")[0]
    assert union.contains_point(p_mid) == (
        cap1.contains_point(p_mid) or cap2.contains_point(p_mid)
    )
    assert inter.contains_point(p_mid) == (
        cap1.contains_point(p_mid) and cap2.contains_point(p_mid)
    )
