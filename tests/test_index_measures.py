"""Port of s2shape_index_measures_test.cc (19 tests) over
kernel/shapeutil index-level measures."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.shapeutil import (
    index_approx_area,
    index_area,
    index_centroid,
    index_dimension,
    index_length,
    index_num_points,
    index_perimeter,
)


def make_index(s: str) -> list:
    """MakeIndexOrDie → [(dim, chains)] with 'full'/'empty' polygons."""
    parts = s.split("#")
    while len(parts) < 3:
        parts.append("")
    shapes = []
    pts_str = parts[0].strip()
    if pts_str:
        shapes.append((0, [parse_points(pts_str.replace("|", ","))]))
    for tok in parts[1].split("|"):
        tok = tok.strip()
        if tok:
            shapes.append((1, [parse_points(tok)]))
    for tok in parts[2].split("|"):
        tok = tok.strip()
        if not tok:
            continue
        if tok == "empty":
            shapes.append((2, []))
            continue
        loops = []
        for ltok in tok.split(";"):
            ltok = ltok.strip()
            if ltok == "full":
                loops.append(np.empty((0, 3)))
            elif ltok:
                loops.append(parse_points(ltok))
        shapes.append((2, loops))
    return shapes


def test_get_dimension():
    """Empty/Points/PointsAndLines/PointsLinesAndPolygons
    (test.cc:42-68)."""
    assert index_dimension(make_index("# #")) == -1
    assert index_dimension(make_index("0:0 # #")) == 0
    assert index_dimension([(0, [])]) == 0  # empty point set
    assert index_dimension(make_index("0:0 # 1:1, 1:2 #")) == 1
    assert index_dimension(make_index("0:0 # 1:1 #")) == 1
    assert index_dimension(make_index("0:0 # 1:1, 2:2 # 3:3, 3:4, 4:3")) == 2
    assert index_dimension(make_index("# # empty")) == 2


def test_get_num_points():
    """test.cc:70-81."""
    assert index_num_points(make_index("# #")) == 0
    assert index_num_points(make_index("0:0 | 1:0 # #")) == 2
    assert index_num_points(make_index("# 1:1, 1:2 # 0:3, 0:5, 2:5")) == 0


def test_get_length():
    """test.cc:83-90."""
    assert index_length(make_index("# #")) == 0.0
    got = index_length(make_index("4:4 # 0:0, 1:0 | 1:0, 2:0 # 5:5, 5:6, 6:5"))
    assert got == pytest.approx(math.radians(2), rel=1e-14)


def test_get_perimeter():
    """test.cc:92-99."""
    assert index_perimeter(make_index("# #")) == 0.0
    got = index_perimeter(
        make_index("4:4 # 0:0, 1:0 | 2:0, 3:0 # 0:1, 0:2, 0:3")
    )
    assert math.degrees(got) == pytest.approx(4.0, rel=1e-12)


def test_get_area():
    """test.cc:101-107."""
    assert index_area(make_index("# #")) == 0.0
    assert index_area(make_index("# # full | full")) == 8 * math.pi


def test_get_approx_area():
    """test.cc:109-115."""
    assert index_approx_area(make_index("# #")) == 0.0
    assert index_approx_area(make_index("# # full | full")) == 8 * math.pi


def approx_equals(a, b, tol=1e-15) -> bool:
    return float(np.linalg.norm(np.asarray(a) - np.asarray(b))) <= tol


def test_get_centroid():
    """test.cc:117-139."""
    assert np.array_equal(index_centroid(make_index("# #")), np.zeros(3))
    assert np.allclose(
        index_centroid(make_index("0:0 | 0:90 # #")),
        np.array([1.0, 1.0, 0.0]),
        atol=1e-15,
    )
    # points ignored when a polyline is present
    assert np.allclose(
        index_centroid(make_index("5:5 | 6:6 # 0:0, 0:90 #")),
        np.array([1.0, 1.0, 0.0]),
        atol=1e-9,
    )
    # points and polylines ignored when a polygon is present
    assert np.allclose(
        index_centroid(make_index("5:5 # 6:6, 7:7 # 0:0, 0:90, 90:0")),
        np.array([math.pi / 4] * 3),
        atol=1e-9,
    )
