"""Spherical measure kernels + distributed aggregation equivalence."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel import measures as M
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.coords import latlng_to_xyz

RNG = np.random.default_rng(42)


def _loop(s):
    return parse_points(s)


def test_triangle_area_octant():
    # one octant of the sphere = 4π/8 = π/2
    a = np.array([1.0, 0, 0])
    b = np.array([0.0, 1, 0])
    c = np.array([0.0, 0, 1])
    assert abs(M.triangle_area(a, b, c) - math.pi / 2) < 1e-14
    assert M.signed_triangle_area(a, b, c) > 0
    assert M.signed_triangle_area(c, b, a) < 0


def test_small_triangle_relative_accuracy():
    # l'Huilier keeps relative accuracy for tiny triangles
    eps = 1e-6
    a = _loop("0:0")[0]
    b = _loop(f"0:{eps}")[0]
    c = _loop(f"{eps}:0")[0]
    area = float(M.triangle_area(a, b, c))
    expect = 0.5 * math.radians(eps) ** 2
    assert abs(area - expect) / expect < 1e-6


def test_hemisphere_loop_area():
    hemi = _loop("0:-90, -90:0, 0:90, 90:0")
    assert abs(M.loop_area(hemi) - 2 * math.pi) < 1e-12


def test_small_square_loop_area():
    sq = _loop("-0.5:-0.5, -0.5:0.5, 0.5:0.5, 0.5:-0.5")
    area = M.loop_area(sq)
    expect = math.radians(1.0) ** 2  # ~1°×1° near the equator
    assert abs(area - expect) / expect < 1e-3
    # reversing orientation complements the area to 4π
    area_cw = M.loop_area(sq[::-1])
    assert abs(area + area_cw - 4 * math.pi) < 1e-9


def test_loop_perimeter_and_polyline_length():
    sq = _loop("0:0, 0:90, 90:0")  # octant triangle: 3 edges of 90°
    assert abs(M.loop_perimeter(sq) - 3 * math.pi / 2) < 1e-12
    line = _loop("0:0, 0:10, 0:20")
    assert abs(M.polyline_length(line) - math.radians(20)) < 1e-12


def test_polyline_interpolate():
    line = _loop("0:0, 0:10")
    mid = M.polyline_interpolate(line, 0.5)
    x, y, z = latlng_to_xyz(np.array([0.0]), np.array([5.0]))
    np.testing.assert_allclose(mid, [x[0], y[0], z[0]], atol=1e-12)
    assert np.allclose(M.polyline_interpolate(line, 0.0), line[0])
    assert np.allclose(M.polyline_interpolate(line, 1.0), line[1])


def test_loop_centroid_direction():
    # centroid of a polar loop points at the pole
    polar = _loop("80:0, 80:90, 80:180, 80:-90")
    cen = M.loop_centroid(polar)
    cen = cen / np.linalg.norm(cen)
    assert cen[2] > 0.999


def test_spark_distributed_measures_match_kernel(spark):
    from s2geometry_spark.operators.measures import edges_df, loop_measures

    loops = {
        "hemi": _loop("0:-90, -90:0, 0:90, 90:0"),
        "sq": _loop("-0.5:-0.5, -0.5:0.5, 0.5:0.5, 0.5:-0.5"),
        "tri": _loop("10:10, 10:30, 30:20"),
    }
    df = edges_df(spark, list(loops.items()))
    out = {r.loop_id: r for r in loop_measures(df).collect()}
    for name, verts in loops.items():
        assert abs(out[name].area - M.loop_area(verts)) < 1e-9, name
        assert abs(out[name].perimeter - M.loop_perimeter(verts)) < 1e-9
        cen = M.loop_centroid(verts)
        np.testing.assert_allclose(
            [out[name].centroid_x, out[name].centroid_y, out[name].centroid_z],
            cen, atol=1e-9,
        )


class TestCentroids:
    """Port of s2centroids_test.cc:33-108 (PlanarCentroid SemiEquator,
    TriangleTrueCentroid SmallTriangles, EdgeTrueCentroid SemiEquator +
    GreatCircles; randomized cases use our own rng per FIXTURES.md)."""

    def test_planar_centroid_semi_equator(self):
        import numpy as np

        from s2geometry_spark.kernel.measures import planar_centroid

        a = np.array([0.0, -1.0, 0.0])
        b = np.array([1.0, 0.0, 0.0])
        c = np.array([0.0, 1.0, 0.0])
        centroid = planar_centroid(a, b, c)
        n = np.linalg.norm(centroid)
        assert abs(n - 1.0 / 3) < 1e-15
        assert np.linalg.norm(centroid / n - b) < 1e-14

    def test_triangle_true_centroid_small_triangles(self):
        import numpy as np

        from s2geometry_spark.kernel.measures import triangle_true_centroid

        rng = np.random.default_rng(42)
        for _ in range(100):
            # random orthonormal frame (p, x, y)
            m = np.linalg.qr(rng.normal(size=(3, 3)))[0]
            p, x, y = m[:, 0], m[:, 1], m[:, 2]
            d = 10.0 ** rng.uniform(-8, -4)
            p0 = p - d * x
            p1 = p + d * x
            p2 = p + 3 * d * y
            p0, p1, p2 = (v / np.linalg.norm(v) for v in (p0, p1, p2))
            c = triangle_true_centroid(p0, p1, p2)
            c = c / np.linalg.norm(c)
            expected = p + d * y
            expected /= np.linalg.norm(expected)
            # S2Point::Angle is atan2-based (stable near 0, unlike acos)
            ang = float(np.arctan2(np.linalg.norm(np.cross(c, expected)), c @ expected))
            assert ang <= 2e-8

    def test_edge_true_centroid_semi_equator(self):
        import numpy as np

        from s2geometry_spark.kernel.measures import edge_true_centroid

        a = np.array([0.0, -1.0, 0.0])
        b = np.array([1.0, 0.0, 0.0])
        c = np.array([0.0, 1.0, 0.0])
        centroid = edge_true_centroid(a, b) + edge_true_centroid(b, c)
        n = np.linalg.norm(centroid)
        assert abs(n - 2.0) < 1e-14
        assert np.linalg.norm(centroid / n - b) < 1e-14

    def test_edge_true_centroid_great_circles(self):
        import numpy as np

        from s2geometry_spark.kernel.measures import edge_true_centroid

        rng = np.random.default_rng(42)
        for _ in range(100):
            m = np.linalg.qr(rng.normal(size=(3, 3)))[0]
            x, y = m[:, 0], m[:, 1]
            centroid = np.zeros(3)
            v0 = x
            theta = 0.0
            # sample BEFORE incrementing (the reference's for-update
            # order) so the closing arc never double-covers past 2*pi
            while theta < 2 * np.pi:
                v1 = np.cos(theta) * x + np.sin(theta) * y
                centroid += edge_true_centroid(v0, v1)
                v0 = v1
                theta += float(rng.uniform(0, 1)) ** 10
            centroid += edge_true_centroid(v0, x)
            assert np.linalg.norm(centroid) <= 2e-14


class TestS2Earth:
    """Port of s2earth_test.cc:80-180 (ToLongitudeRadians,
    GetInitialBearing, GetDistance in meters)."""

    def test_to_longitude_radians(self):
        import math

        from s2geometry_spark.kernel.metrics import (
            EARTH_RADIUS_METERS,
            meters_to_longitude_radians,
        )

        r = EARTH_RADIUS_METERS
        assert meters_to_longitude_radians(r, 0) == pytest.approx(1.0, abs=1e-15)
        assert meters_to_longitude_radians(r, 0.5) > meters_to_longitude_radians(
            r, 0.4
        )
        assert meters_to_longitude_radians(r, math.pi / 2) == 2 * math.pi
        assert (
            meters_to_longitude_radians(r, math.pi / 2 - 1e-4) == 2 * math.pi
        )

    def test_get_initial_bearing(self):
        import math

        from s2geometry_spark.kernel.metrics import get_initial_bearing

        cases = [
            # (a_lat, a_lng, b_lat, b_lng, bearing_degrees)
            (0, 50, 0, 100, 90),            # eastward on equator
            (0, 50, 0, 0, -90),             # westward on equator
            (16, 28, 81, 28, 0),            # northward on meridian
            (24, 64, -27, 64, 180),         # southward on meridian
            (12, 76, 90, 50, 0),            # towards north pole
            (-35, 105, -90, -120, 180),     # towards south pole
            (40.4379332, -3.749576, 35.6733227, 139.6403486, 29.2),
            (35.6733227, 139.6403486, 40.4379332, -3.749576, -27.2),
        ]
        for a_lat, a_lng, b_lat, b_lng, want_deg in cases:
            got = math.degrees(
                get_initial_bearing(
                    math.radians(a_lat),
                    math.radians(a_lng),
                    math.radians(b_lat),
                    math.radians(b_lng),
                )
            )
            diff = abs(math.remainder(got - want_deg, 360.0))
            assert diff <= 1e-2, (a_lat, a_lng, b_lat, b_lng, got)

    def test_get_distance_meters(self):
        import math

        import numpy as np

        from s2geometry_spark.kernel.measures import stable_angle
        from s2geometry_spark.kernel.metrics import (
            EARTH_RADIUS_METERS,
            radians_to_meters,
        )

        north = np.array([[0.0, 0.0, 1.0]])
        south = np.array([[0.0, 0.0, -1.0]])
        west = np.array([[0.0, -1.0, 0.0]])
        assert radians_to_meters(
            float(stable_angle(north, south)[0])
        ) == pytest.approx(math.pi * EARTH_RADIUS_METERS, rel=1e-12)
        assert radians_to_meters(float(stable_angle(west, west)[0])) == 0
        assert radians_to_meters(
            float(stable_angle(north, west)[0])
        ) == pytest.approx(math.pi / 2 * EARTH_RADIUS_METERS, rel=1e-12)
