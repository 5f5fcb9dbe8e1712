"""Port of s2point_region_test.cc (Basic) and s2region_union_test.cc
(Basic; the Clone/copy/encode tests are C++ value-semantics and codec
tests, N/A here)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cellid import from_latlng
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.coverer import RegionCoverer
from s2geometry_spark.kernel.region import (
    Cap,
    PointRegion,
    RegionUnion,
)


def ll(lat, lng) -> np.ndarray:
    return parse_points(f"{lat}:{lng}")[0]


def leaf_cell_of(p: np.ndarray) -> Cell:
    lat = math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))
    lng = math.degrees(math.atan2(p[1], p[0]))
    cid = int(
        np.asarray(from_latlng(np.array([lat]), np.array([lng]))).reshape(-1)[0]
    )
    return Cell(CID(cid))


def test_point_region_basic():
    """s2point_region_test.cc:32-49."""
    p = np.array([1.0, 0, 0])
    r0 = PointRegion(p)
    assert np.array_equal(r0.point, p)
    assert r0.contains_point(p)
    assert r0.contains_point(r0.point)
    assert not r0.contains_point(np.array([1.0, 0, 1]))
    cap = r0.get_cap_bound()
    assert np.array_equal(cap.center, p) and cap.length2 == 0.0
    rect = r0.get_rect_bound()
    assert rect.lat.lo == rect.lat.hi
    assert rect.contains_point(p)

    # the leaf cell containing a point is much larger than the point
    cell = leaf_cell_of(p)
    assert not r0.contains_cell(cell)
    assert r0.may_intersect_cell(cell)


def test_region_union_basic():
    """s2region_union_test.cc:44-92 (geometry surface)."""
    ru_empty = RegionUnion([])
    assert len(ru_empty.regions) == 0
    assert ru_empty.get_cap_bound().is_empty()
    assert ru_empty.get_rect_bound().is_empty()

    two_points = RegionUnion(
        [PointRegion(ll(35, 40)), PointRegion(ll(-35, -40))]
    )
    rect = two_points.get_rect_bound()
    assert abs(rect.lat.lo - math.radians(-35)) <= 1e-15
    assert abs(rect.lat.hi - math.radians(35)) <= 1e-15
    assert abs(rect.lng.lo - math.radians(-40)) <= 1e-15
    assert abs(rect.lng.hi - math.radians(40)) <= 1e-15

    face0 = Cell(CID.from_face(0))
    assert two_points.may_intersect_cell(face0)
    assert not two_points.contains_cell(face0)

    assert two_points.contains_point(ll(35, 40))
    assert two_points.contains_point(ll(-35, -40))
    assert not two_points.contains_point(ll(0, 0))

    # Add another region
    three_points = RegionUnion(list(two_points.regions))
    assert not three_points.contains_point(ll(10, 10))
    three_points.regions.append(PointRegion(ll(10, 10)))
    assert three_points.contains_point(ll(10, 10))

    # a 1-cell covering of the two-point union is face 0
    coverer = RegionCoverer(max_cells=1)
    covering = coverer.get_covering(two_points)
    assert len(covering) == 1
    assert covering[0].id == CID.from_face(0).id
