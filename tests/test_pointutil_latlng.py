"""s2pointutil_test.cc (Frames / Rotate / OriginTest) +
s2latlng_test.cc (Basic / Conversion / Distance) ports.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import cellid as cid_np
from s2geometry_spark.kernel import coords
from s2geometry_spark.kernel.cell import Cell, _cell_vertices
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.coords import rotate
from s2geometry_spark.kernel.fractal import from_frame, random_point
from s2geometry_spark.kernel.measures import turn_angle
from s2geometry_spark.kernel.polyline import _get_frame, _to_frame, point_on_line
from s2geometry_spark.kernel.predicates import ORIGIN
from s2geometry_spark.kernel.region import LatLng

DBL_EPSILON = 2.220446049250313e-16


def _norm(v):
    v = np.asarray(v, float)
    return v / np.linalg.norm(v)


def _angle(a, b) -> float:
    return math.atan2(float(np.linalg.norm(np.cross(a, b))), float(a @ b))


def test_frames():
    z = _norm([0.2, 0.5, -3.3])
    m = _get_frame(z)
    assert np.allclose(m[:, 2], z, atol=1e-15)
    assert abs(np.linalg.norm(m[:, 0]) - 1) < 1e-14
    assert abs(np.linalg.norm(m[:, 1]) - 1) < 1e-14
    assert abs(np.linalg.det(m) - 1) < 1e-14
    for k, e in enumerate(np.eye(3)):
        assert np.allclose(_to_frame(m, m[:, k]), e, atol=1e-14)
        assert np.allclose(from_frame(m, e), m[:, k], atol=1e-14)


def check_rotate(p, axis, angle):
    """TestRotate (s2pointutil_test.cc:20-50)."""
    result = rotate(p, axis, angle)
    assert abs(float(result @ result) - 1) < 5 * DBL_EPSILON
    k_max_position_error = 1e-15
    assert abs(_angle(result, axis) - _angle(p, axis)) <= k_max_position_error
    axis_distance = float(np.linalg.norm(np.cross(p, axis)))
    if axis_distance < k_max_position_error:
        max_rotation_error = 2 * math.pi
    else:
        max_rotation_error = math.asin(k_max_position_error / axis_distance)
    actual_rotation = turn_angle(p, axis, result) + math.pi
    rotation_error = math.remainder(angle - actual_rotation, 2 * math.pi)
    assert rotation_error <= max_rotation_error


def test_rotate():
    rng = np.random.RandomState(141)
    for _ in range(300):
        axis = random_point(rng)
        target = random_point(rng)
        distance = math.pi * math.exp(rng.uniform(math.log(1e-15), 0.0))
        if rng.rand() < 0.2:
            distance = math.pi - distance
        p = point_on_line(axis, target, distance)
        angle = 2 * math.pi * math.exp(rng.uniform(math.log(1e-15), 0.0))
        if rng.rand() < 1 / 3:
            angle = -angle
        if rng.rand() < 0.1:
            angle = 0
        check_rotate(p, axis, angle)


def _min_expensive_level(p: np.ndarray) -> int:
    """GetMinExpensiveLevel: first level whose containing cell has an
    edge nearly collinear with p (triage sign underdetermined)."""
    # s2pred::TriageSign with the plain cross product (kMaxDetError)
    k_max_det_error = 1.8274 * DBL_EPSILON

    def triage(a, b, c) -> int:
        det = float(np.cross(a, b) @ c)
        if det > k_max_det_error:
            return 1
        if det < -k_max_det_error:
            return -1
        return 0

    leaf = CID(int(cid_np.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )[0]))
    for level in range(31):
        cell = Cell(leaf.parent(level))
        v = _cell_vertices(cell)
        for k in range(4):
            a, b = v[k], v[(k + 1) & 3]
            # collinearity is tested against S2::Origin, not p
            if triage(a, b, ORIGIN) == 0:
                return level
    return 31


def test_origin():
    """OriginTest: the exact origin value, pole distance, and cell-edge
    collinearity avoidance."""
    want = _norm([-0.01, 0.01 * float(coords.st_to_uv(2.0 / 3.0)), 1.0])
    assert np.array_equal(want, ORIGIN)
    distance_km = math.acos(ORIGIN[2]) * 6371.01
    assert distance_km >= 50.0
    assert _min_expensive_level(ORIGIN) >= 22
    equator_point = _norm([ORIGIN[0], ORIGIN[1], 0.0])
    assert _min_expensive_level(equator_point) >= 22


# ------------------------------------------------------------- LatLng
def test_latlng_basic():
    ll_rad = LatLng(math.pi / 4, math.pi / 2)
    assert ll_rad.lat == math.pi / 4 and ll_rad.lng == math.pi / 2
    assert ll_rad.is_valid()
    ll_deg = LatLng.from_degrees(45, 90)
    assert ll_deg.lat == ll_rad.lat and ll_deg.lng == ll_rad.lng
    assert not LatLng.from_degrees(-91, 0).is_valid()
    assert not LatLng.from_degrees(0, 181).is_valid()

    better = LatLng.from_degrees(120, 200).normalized()
    assert better.is_valid()
    assert better.lat == math.radians(90)
    assert abs(better.lng - math.radians(-160)) < 1e-15

    better = LatLng.from_degrees(-100, -360).normalized()
    assert better.is_valid()
    assert better.lat == math.radians(-90)
    assert abs(better.lng) < 1e-15


def test_latlng_conversion():
    """TestConversion: round trips through points."""
    for lat, lng in [(0, 0), (45, 90), (-60, 175), (90, 47), (-90, -122)]:
        p = LatLng.from_degrees(lat, lng).to_point()
        got_lat = math.degrees(math.asin(max(-1, min(1, p[2]))))
        assert abs(got_lat - lat) < 1e-12
        if abs(lat) != 90:
            got_lng = math.degrees(math.atan2(p[1], p[0]))
            assert abs(math.remainder(got_lng - lng, 360)) < 1e-12


def test_latlng_distance():
    assert LatLng.from_degrees(90, 0).get_distance(
        LatLng.from_degrees(90, 0)) == 0
    assert abs(math.degrees(LatLng.from_degrees(-37, 25).get_distance(
        LatLng.from_degrees(-66, -155))) - 77.0) < 1e-13
    assert abs(math.degrees(LatLng.from_degrees(0, 165).get_distance(
        LatLng.from_degrees(0, -80))) - 115.0) < 1e-13
    assert abs(math.degrees(LatLng.from_degrees(47, -127).get_distance(
        LatLng.from_degrees(-47, 53))) - 180.0) < 2e-6
