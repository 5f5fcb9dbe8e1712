"""Raster↔vector tiling: projections, web tiles, cell coverings."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.operators import tiling as T
from s2geometry_spark.operators.indexing import index_points
from s2geometry_spark.sources.pages import extract_mentions, synthesize_pages

RNG = np.random.default_rng(42)


def test_plate_carree_roundtrip():
    lat = RNG.uniform(-89, 89, 1000)
    lng = RNG.uniform(-179.9, 179.9, 1000)
    x, y = T.plate_carree_project(lat, lng, x_scale=180.0)
    np.testing.assert_allclose(x, lng, atol=1e-12)
    np.testing.assert_allclose(y, lat, atol=1e-12)
    lat2, lng2 = T.plate_carree_unproject(x, y, x_scale=180.0)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lng2, lng, atol=1e-9)


def test_mercator_roundtrip_and_known_values():
    lat = RNG.uniform(-85, 85, 1000)
    lng = RNG.uniform(-179.9, 179.9, 1000)
    x, y = T.mercator_project(lat, lng)
    lat2, lng2 = T.mercator_unproject(x, y)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lng2, lng, atol=1e-9)
    # equator maps to y=0; 45° latitude to ln(tan(67.5°))
    _, y0 = T.mercator_project(np.array([0.0]), np.array([0.0]))
    assert abs(y0[0]) < 1e-15
    _, y45 = T.mercator_project(np.array([45.0]), np.array([0.0]))
    assert abs(y45[0] - math.log(math.tan(math.radians(67.5)))) < 1e-12


def test_web_tile_known_values():
    # zoom 1: four quadrants
    tx, ty = T.web_tile(np.array([40.0, 40.0, -40.0]), np.array([-100.0, 100.0, 100.0]), 1)
    assert tx.tolist() == [0, 1, 1]
    assert ty.tolist() == [0, 0, 1]
    # tile bounds invert the mapping
    for zoom in (2, 5, 9):
        lat, lng = 37.77, -122.42
        x, y = T.web_tile(np.array([lat]), np.array([lng]), zoom)
        lat_lo, lat_hi, lng_lo, lng_hi = T.web_tile_bounds(int(x[0]), int(y[0]), zoom)
        assert lat_lo <= lat <= lat_hi
        assert lng_lo <= lng <= lng_hi


def test_tile_to_cell_covering_covers_tile_center():
    from s2geometry_spark.kernel import cellid as K

    zoom = 7
    tx, ty = T.web_tile(np.array([48.85]), np.array([2.35]), zoom)
    cover = T.tile_to_cell_covering(int(tx[0]), int(ty[0]), zoom)
    assert 1 <= len(cover) <= 8
    lat_lo, lat_hi, lng_lo, lng_hi = T.web_tile_bounds(int(tx[0]), int(ty[0]), zoom)
    mid_leaf = CID(int(K.from_latlng(
        np.array([(lat_lo + lat_hi) / 2]), np.array([(lng_lo + lng_hi) / 2])
    )[0]))
    assert any(c.contains(mid_leaf) for c in cover)


def test_range_tiling_roundtrip():
    cid = CID.from_token("6b12ae36313d")
    begin = cid.range_min().id - (1 << 63)
    end = cid.range_max().next().id - (1 << 63)
    tiles = T.range_tiling(begin, end)
    assert tiles == [cid]
    # a two-cell range tiles into ≤ a few canonical cells
    sib = cid.next()
    tiles2 = T.range_tiling(begin, sib.range_max().next().id - (1 << 63))
    assert all(t.is_valid() for t in tiles2)
    total = sum(t.range_max().id - t.range_min().id + 2 for t in tiles2)
    expect = (sib.range_max().id - cid.range_min().id) + 2
    assert total == expect


def test_tile_histogram_spark(spark):
    pages = synthesize_pages(spark, 400, partitions=4)
    pts = index_points(extract_mentions(pages), level=30)
    hist = T.tile_histogram(pts, zoom=4).cache()
    assert hist.agg(F.sum("n_points")).first()[0] == pts.count()
    rows = hist.collect()
    n = 1 << 4
    assert all(0 <= r.tile_x < n and 0 <= r.tile_y < n for r in rows)


def test_raster_vector_roundtrip_fixed_point(spark):
    """raster(vectorize(raster(P))) == raster(P) at level 6."""
    from s2geometry_spark.kernel.contains import parse_polygon
    from s2geometry_spark.operators.raster import (
        rasterize_polygon,
        vectorize_cells,
    )

    poly = parse_polygon("35:-10, 35:40, 65:40, 65:-10")
    r1 = rasterize_polygon(spark, poly, level=6)
    pdf1 = r1.toPandas().sort_values(["face", "i", "j"]).reset_index(drop=True)
    assert len(pdf1) > 100
    vec = vectorize_cells(r1, level=6)
    assert vec.loops and all(len(l.vertices) >= 4 for l in vec.loops)
    r2 = rasterize_polygon(spark, vec, level=6)
    pdf2 = r2.toPandas().sort_values(["face", "i", "j"]).reset_index(drop=True)
    assert pdf1.equals(pdf2)


def test_raster_roundtrip_pole_crossing_distributed(spark):
    """Cross-face boundary assembly: a polar raster touches face 2 and
    the tops of all four equatorial faces; the distributed boundary
    extraction (neighbor anti-join with face wraps) must assemble one
    closed loop with bit-equal corners across face boundaries, and the
    roundtrip must be a fixed point."""
    from s2geometry_spark.kernel.contains import parse_polygon
    from s2geometry_spark.operators.raster import (
        boundary_edges_df,
        rasterize_polygon,
        vectorize_cells,
    )

    poly = parse_polygon("70:0, 70:90, 70:180, 70:-90")
    r1 = rasterize_polygon(spark, poly, level=6)
    n_cells = r1.count()
    n_boundary = boundary_edges_df(r1, level=6).count()
    assert 0 < n_boundary < 4 * n_cells  # O(perimeter), not O(area)
    vec = vectorize_cells(r1, level=6)
    assert len(vec.loops) == 1
    r2 = rasterize_polygon(spark, vec, level=6)
    a = {tuple(r) for r in r1.collect()}
    b = {tuple(r) for r in r2.collect()}
    assert a == b


class TestProjectionFixtures:
    """Port of s2projections_test.cc:31-81 (PlateCarree Interpolate +
    ProjectUnproject, Mercator ProjectUnproject with the pinned
    70.2555... value)."""

    def test_plate_carree_interpolate(self):
        # s2projections_test.cc:31-46 — plate carree interpolates
        # linearly in projected space
        def interp(t, a, b):
            return ((1 - t) * a[0] + t * b[0], (1 - t) * a[1] + t * b[1])

        assert interp(0.25, (1, 5), (3, 9)) == (1.5, 6.0)
        assert interp(-2, (1, 0), (3, 0)) == (-3.0, 0.0)
        a, b = (1.234, -5.456e-20), (2.1234e-20, 7.456)
        assert interp(0, a, b) == a
        assert interp(1, a, b) == b

    @staticmethod
    def _xyz_latlng(p):
        import math

        import numpy as np

        p = np.asarray(p, float)
        p = p / np.linalg.norm(p)
        return (
            math.degrees(math.atan2(p[2], math.hypot(p[0], p[1]))),
            math.degrees(math.atan2(p[1], p[0])),
        )

    def test_plate_carree_project_unproject(self):
        # s2projections_test.cc:57-65, scale 180 => x = lng, y = lat
        import numpy as np

        from s2geometry_spark.operators.tiling import (
            plate_carree_project,
            plate_carree_unproject,
        )

        cases = [
            ((0, 0), (1, 0, 0)),
            ((180, 0), (-1, 0, 0)),
            ((90, 0), (0, 1, 0)),
            ((-90, 0), (0, -1, 0)),
            ((0, 90), (0, 0, 1)),
            ((0, -90), (0, 0, -1)),
        ]
        for (px, py), xyz in cases:
            lat, lng = self._xyz_latlng(xyz)
            x, y = plate_carree_project(lat, lng, x_scale=180.0)
            assert (round(float(x), 12), round(float(y), 12)) == (px, py)
            lat2, lng2 = plate_carree_unproject(px, py, x_scale=180.0)
            p2 = np.asarray(self._to_xyz(lat2, lng2))
            assert np.linalg.norm(p2 - np.asarray(xyz, float)) < 1e-14

    @staticmethod
    def _to_xyz(lat, lng):
        from s2geometry_spark.kernel.coords import latlng_to_xyz
        import numpy as np

        x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
        return [float(x), float(y), float(z)]

    def test_mercator_project_unproject(self):
        # s2projections_test.cc:67-81, max_x 180
        import math

        import numpy as np

        from s2geometry_spark.operators.tiling import (
            mercator_project,
            mercator_unproject,
        )

        cases = [
            ((0.0, 0.0), (1, 0, 0)),
            ((180.0, 0.0), (-1, 0, 0)),
            ((90.0, 0.0), (0, 1, 0)),
            ((-90.0, 0.0), (0, -1, 0)),
        ]
        for (px, py), xyz in cases:
            lat, lng = self._xyz_latlng(xyz)
            x, y = mercator_project(lat, lng, max_x=180.0)
            assert (round(float(x), 9), round(float(y), 9)) == (px, py)
            lat2, lng2 = mercator_unproject(px, py, max_x=180.0)
            p2 = np.asarray(self._to_xyz(lat2, lng2))
            assert np.linalg.norm(p2 - np.asarray(xyz, float)) < 1e-14

        # poles map to infinity
        _, y = mercator_project(90.0, 0.0, max_x=180.0)
        assert math.isinf(float(y))
        # the pinned arbitrary point: lat = 1 radian
        x, y = mercator_project(math.degrees(1.0), 0.0, max_x=180.0)
        assert float(y) == pytest.approx(70.255578967830246, abs=1e-9)
        lat2, _ = mercator_unproject(0.0, 70.255578967830246, max_x=180.0)
        assert math.radians(float(lat2)) == pytest.approx(1.0, abs=1e-12)
