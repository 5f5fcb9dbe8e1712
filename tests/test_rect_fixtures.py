"""S2LatLngRect golden fixtures (s2latlng_rect_test.cc): cap bounds and
cell relations."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.region import Cap, LatLngRect


def R(lat_lo, lng_lo, lat_hi, lng_hi):
    return LatLngRect.from_degrees(lat_lo, lng_lo, lat_hi, lng_hi)


def _cell_fpl(face, pos, level):
    """S2CellId::FromFacePosLevel."""
    raw = (face << 61) + (pos | 1)
    return Cell(CID(raw).parent(level))


def _cap_approx_equals(a: Cap, b: Cap, tol=1e-14):
    d = np.linalg.norm(a.center - b.center)
    return d < 1e-7 and abs(a.radius_radians() - b.radius_radians()) < 1e-7


def test_rect_get_cap_bound():
    """s2latlng_rect_test.cc:514-540."""
    # bounding cap at center is smaller: height 0.5 ⇒ length2 = 1
    got = R(-45, -45, 45, 45).get_cap_bound()
    assert _cap_approx_equals(got, Cap(np.array([1.0, 0, 0]), 1.0))
    # bounding cap at north pole is smaller
    got = R(88, -80, 89, 80).get_cap_bound()
    assert _cap_approx_equals(
        got, Cap.from_center_angle(np.array([0.0, 0, 1]), math.radians(2))
    )
    # longitude span > 180 degrees → polar cap
    got = R(-30, -150, -10, 50).get_cap_bound()
    assert _cap_approx_equals(
        got, Cap.from_center_angle(np.array([0.0, 0, -1]), math.radians(80))
    )
    # lng span > 180 and lat span > 90 → larger polar cap is correct
    got = R(-60, -150, 70, 50).get_cap_bound()
    assert _cap_approx_equals(
        got, Cap.from_center_angle(np.array([0.0, 0, 1]), math.radians(150))
    )
    # hemispheres bounded conservatively (radius ≥ 90°)
    got = R(-10, -100, 0, 100).get_cap_bound()
    assert got.length2 >= 2.0


def _vertex_contained(r: LatLngRect, cell: Cell) -> bool:
    for i in range(4):
        if r.contains_point(cell.get_vertex_raw(i)):
            return True
        if not r.is_empty() and cell.contains_point(r.get_vertex(i).to_point()):
            return True
    return False


def _check_cell_ops(r: LatLngRect, cell: Cell, level: int):
    """TestCellOps (s2latlng_rect_test.cc:542-558): 0 none, 1 rect-bound
    overlap, 2 exact intersection, 3 vertex containment, 4 containment."""
    may = (not r.is_empty()) and r.intersects_rect(cell.get_rect_bound())
    assert may == (level >= 1)
    assert r.may_intersect_cell(cell) == (level >= 2)  # exact Intersects
    assert _vertex_contained(r, cell) == (level >= 3)
    assert r.contains_cell(cell) == (level >= 4)


def test_rect_cell_ops():
    """s2latlng_rect_test.cc:560-613 (the deterministic rows)."""
    _check_cell_ops(LatLngRect.empty(), _cell_fpl(3, 0, 0), 0)
    _check_cell_ops(LatLngRect.full(), _cell_fpl(2, 0, 0), 4)
    _check_cell_ops(LatLngRect.full(), _cell_fpl(5, 0, 25), 4)
    r4 = R(-45.1, -45.1, 0.1, 0.1)
    _check_cell_ops(r4, _cell_fpl(0, 0, 0), 3)
    _check_cell_ops(r4, _cell_fpl(0, 0, 1), 4)
    _check_cell_ops(r4, _cell_fpl(1, 0, 1), 0)
    r5 = R(-10, -45, 10, 0)
    _check_cell_ops(r5, _cell_fpl(0, 0, 0), 3)
    _check_cell_ops(r5, _cell_fpl(0, 0, 1), 3)
    _check_cell_ops(r5, _cell_fpl(1, 0, 1), 0)
    _check_cell_ops(R(4, 4, 4, 4), Cell(CID.from_face(0)), 3)
    _check_cell_ops(R(41, -87, 42, -79), Cell(CID.from_face(2)), 1)
    _check_cell_ops(R(-41, 160, -40, -160), Cell(CID.from_face(5)), 1)
    _check_cell_ops(R(-37, -70, -36, -20), Cell(CID.from_face(5)), 2)
    # diamond-vs-square intersection
    cell202 = _cell_fpl(2, 0, 2)
    b = cell202.get_rect_bound()
    _check_cell_ops(
        R(
            math.degrees(b.lat.lo) + 3,
            math.degrees(b.lng.lo) + 3,
            math.degrees(b.lat.hi) - 3,
            math.degrees(b.lng.hi) - 3,
        ),
        cell202,
        2,
    )
