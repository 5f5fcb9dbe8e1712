"""s2shape_measures_test.cc port: GetLength/GetPerimeter/GetArea/
GetApproxArea/GetCentroid over lax shapes, incl. the tiny shell+hole
cases where SIGNED per-loop areas avoid catastrophic cancellation.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.shapeutil import (
    LaxPolygon,
    shape_approx_area,
    shape_area,
    shape_centroid,
    shape_length,
    shape_perimeter,
)


def test_get_length():
    assert shape_length([]) == 0.0
    p = parse_points("0:0, 1:0, 2:0, 3:0")
    chains = [np.array([p[0], p[1]]), np.array([p[0], p[2]]),
              np.array([p[0], p[3]])]
    assert abs(shape_length(chains) - math.radians(6)) < 1e-14


def test_get_perimeter():
    assert shape_perimeter(LaxPolygon([])) == 0.0   # empty
    assert shape_perimeter(LaxPolygon([np.zeros((0, 3))])) == 0.0  # full
    got = shape_perimeter(LaxPolygon([
        parse_points("0:0, 1:0"),
        parse_points("0:1, 0:2, 0:3"),
    ]))
    assert abs(got - math.radians(6)) < 1e-14


def test_get_area():
    assert shape_area(LaxPolygon([])) == 0.0
    assert shape_area(LaxPolygon([np.zeros((0, 3))])) == 4 * math.pi

    side = math.radians(1e-10)
    two_shells = LaxPolygon([
        parse_points("0:0, 0:1e-10, 1e-10:1e-10, 1e-10:0"),
        parse_points("0:0, 0:-1e-10, -1e-10:-1e-10, -1e-10:0"),
    ])
    got = shape_area(two_shells)
    assert abs(got - 2 * side * side) <= 1e-6 * 2 * side * side

    shell_hole = LaxPolygon([
        parse_points("0:0, 0:2e-10, 2e-10:2e-10, 2e-10:0"),
        parse_points(
            "0.5e-10:0.5e-10, 1.5e-10:0.5e-10, 1.5e-10:1.5e-10, "
            "0.5e-10:1.5e-10"
        ),
    ])
    got = shape_area(shell_hole)
    assert abs(got - 3 * side * side) <= 1e-6 * 3 * side * side


def test_get_approx_area():
    got = shape_approx_area(LaxPolygon([
        parse_points("0:0, 0:90, 90:0"),
        parse_points("0:22.5, 90:0, 0:67.5"),
    ]))
    assert abs(got - math.pi / 4) <= 1e-12


def test_get_centroid():
    pts = parse_points("0:0, 0:90")
    got = shape_centroid(pts, 0)
    assert np.allclose(got, [1, 1, 0], atol=1e-15)

    got = shape_centroid([parse_points("0:0, 0:90")], 1)
    assert np.allclose(got, [1, 1, 0], atol=1e-14)

    got = shape_centroid(LaxPolygon([parse_points("0:0, 0:90, 90:0")]), 2)
    assert np.allclose(got, [math.pi / 4] * 3, atol=1e-14)
