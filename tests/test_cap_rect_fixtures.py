"""S2Cap golden fixtures (s2cap_test.cc): rect bounds and cell relations."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.cell import Cell, _face_uv_to_xyz
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.metrics import MIN_WIDTH
from s2geometry_spark.kernel.region import Cap, cell_cap_bound

EPS = 1e-15
DEG_EPS = 1e-13


def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.array([float(lat)]), np.array([float(lng)]))
    return np.array([x[0], y[0], z[0]])


def _deg(r):
    return math.degrees(r)


def test_cap_get_rect_bound():
    """s2cap_test.cc:187-236."""
    assert Cap.empty().get_rect_bound().is_empty()
    # includes the south pole
    rect = Cap.from_center_angle(_pt(-45, 57), math.radians(50)).get_rect_bound()
    assert abs(_deg(rect.lat.lo) - (-90)) < DEG_EPS
    assert abs(_deg(rect.lat.hi) - 5) < DEG_EPS
    assert rect.lng.is_full()
    # tangent to the north pole
    p = np.array([1.0, 0, 1]) / math.sqrt(2)
    rect = Cap.from_center_angle(p, math.pi / 4 + 1e-16).get_rect_bound()
    assert abs(rect.lat.lo - 0) < EPS
    assert abs(rect.lat.hi - math.pi / 2) < EPS
    assert rect.lng.is_full()
    # eastern hemisphere
    rect = Cap.from_center_angle(
        np.array([0.0, 1, 0]), math.pi / 2 + 2e-16
    ).get_rect_bound()
    assert abs(_deg(rect.lat.lo) + 90) < DEG_EPS
    assert abs(_deg(rect.lat.hi) - 90) < DEG_EPS
    assert rect.lng.is_full()
    # centered on the equator
    rect = Cap.from_center_angle(_pt(0, 50), math.radians(20)).get_rect_bound()
    assert abs(_deg(rect.lat.lo) + 20) < DEG_EPS
    assert abs(_deg(rect.lat.hi) - 20) < DEG_EPS
    assert abs(_deg(rect.lng.lo) - 30) < DEG_EPS
    assert abs(_deg(rect.lng.hi) - 70) < DEG_EPS
    # centered on the north pole
    rect = Cap.from_center_angle(_pt(90, 123), math.radians(10)).get_rect_bound()
    assert abs(_deg(rect.lat.lo) - 80) < DEG_EPS
    assert abs(_deg(rect.lat.hi) - 90) < DEG_EPS
    assert rect.lng.is_full()


def _leaf_cell_at_uv(face, u, v):
    p = _face_uv_to_xyz(face, u, v)
    p = p / np.linalg.norm(p)
    leaf = K.from_point(np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))
    return Cell(CID(int(leaf[0])))


def test_cap_s2cell_methods():
    """s2cap_test.cc:237-303 — the full cap×cell relation sweep."""
    face_radius = math.atan(math.sqrt(2))
    norms = [_face_uv_to_xyz(f, 0, 0) for f in range(6)]
    for face in range(6):
        root_cell = Cell(CID.from_face(face))
        edge_cell = _leaf_cell_at_uv(face, 0, 1 - EPS)
        corner_cell = _leaf_cell_at_uv(face, 1 - EPS, 1 - EPS)

        assert Cap.full().contains_cell(root_cell)
        assert not Cap.empty().may_intersect_cell(root_cell)

        # caps of Hilbert-adjacent leaf cells vs the corner cell
        first = K.advance(np.array([corner_cell.id.id], dtype=np.uint64), np.array([-3]))[0]
        cid = CID(int(first))
        for _ in range(7):
            cell = Cell(cid)
            cb = cell_cap_bound(cell)
            assert (cid == corner_cell.id) == cb.contains_cell(corner_cell)
            assert cid.parent().contains(corner_cell.id) == cb.may_intersect_cell(corner_cell)
            cid = cid.next()

        anti_face = (face + 3) % 6
        for cap_face in range(6):
            center = norms[cap_face]
            covering = Cap.from_center_angle(center, face_radius + EPS)
            assert (cap_face == face) == covering.contains_cell(root_cell)
            assert (cap_face != anti_face) == covering.may_intersect_cell(root_cell)
            assert (float(center @ edge_cell.get_center()) > 0.1) == covering.contains_cell(edge_cell)
            assert covering.may_intersect_cell(edge_cell) == covering.contains_cell(edge_cell)
            assert (cap_face == face) == covering.contains_cell(corner_cell)
            assert (float(center @ corner_cell.get_center()) > 0) == covering.may_intersect_cell(corner_cell)

            bulging = Cap.from_center_angle(center, math.pi / 4 + EPS)
            assert not bulging.contains_cell(root_cell)
            assert (cap_face != anti_face) == bulging.may_intersect_cell(root_cell)
            assert (cap_face == face) == bulging.contains_cell(edge_cell)
            assert (float(center @ edge_cell.get_center()) > 0.1) == bulging.may_intersect_cell(edge_cell)
            assert not bulging.contains_cell(corner_cell)
            assert not bulging.may_intersect_cell(corner_cell)

            singleton = Cap.from_center_angle(center, 0.0)
            assert (cap_face == face) == singleton.may_intersect_cell(root_cell)
            assert not singleton.may_intersect_cell(edge_cell)
            assert not singleton.may_intersect_cell(corner_cell)


def test_cap_cell_union_bound_level1_radius():
    """s2cap_test.cc:305-313: level-1-width cap covered by exactly 3 faces."""
    cap = Cap.from_center_angle(
        np.array([1.0, 1, 1]) / math.sqrt(3), MIN_WIDTH.get_value(1)
    )
    covering = cap.get_cell_union_bound()
    assert len(covering) == 3


def test_cap_expanded():
    cap = Cap.from_center_angle(_pt(0, 0), math.radians(10))
    grown = cap.expanded(math.radians(5))
    assert abs(math.degrees(grown.radius_radians()) - 15) < 1e-12
    assert Cap.empty().expanded(1.0).is_empty()
