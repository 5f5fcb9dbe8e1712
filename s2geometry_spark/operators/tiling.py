"""Raster↔vector tiling: map projections + web-tile ↔ S2-cell mapping.

Ports PlateCarreeProjection / MercatorProjection (s2projections.h:105-160,
s2projections.cc) as vectorized NumPy kernels plus DataFrame operators:

  - `assign_web_tiles`: points → (z, tx, ty) Web-Mercator tile ids — the
    raster side of raster↔vector;
  - `tile_to_cell_covering`: for a raster tile, the S2 cells covering it
    (vector side), via the exact coverer over the tile's LatLngRect;
  - `range_tiling`: Hilbert id range → minimal cell tiling via
    maximum_tile (s2cell_id.cc:168-191) — the "tile a key range" op used
    for shard planning.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..kernel import cellid as K
from ..kernel.cid import CID
from ..kernel.intervals import R1Interval, S1Interval


# ---------------------------------------------------------------- kernels
def plate_carree_project(lat_deg, lng_deg, x_scale: float = math.pi):
    """(lat,lng) → (x,y); x spans ±x_scale (s2projections.cc FromLatLng)."""
    f = x_scale / math.pi
    return (
        np.radians(np.asarray(lng_deg, float)) * f,
        np.radians(np.asarray(lat_deg, float)) * f,
    )


def plate_carree_unproject(x, y, x_scale: float = math.pi):
    t = math.pi / x_scale
    lng = np.degrees(
        np.remainder(np.asarray(x, float) * t + math.pi, 2 * math.pi) - math.pi
    )
    lat = np.degrees(np.clip(np.asarray(y, float) * t, -math.pi / 2, math.pi / 2))
    return lat, lng


def mercator_project(lat_deg, lng_deg, max_x: float = math.pi):
    """Spherical Mercator (s2projections.cc:91-97): the
    0.5·ln((1+sinφ)/(1−sinφ)) form — more accurate near zero than
    ln(tan(π/4+φ/2)) and exactly ±inf at the poles."""
    f = max_x / math.pi
    phi = np.radians(np.asarray(lat_deg, float))
    with np.errstate(divide="ignore"):
        sin_phi = np.sin(phi)
        y = 0.5 * np.log((1 + sin_phi) / (1 - sin_phi))
    return np.radians(np.asarray(lng_deg, float)) * f, y * f


def mercator_unproject(x, y, max_x: float = math.pi):
    t = math.pi / max_x
    lng = np.degrees(
        np.remainder(np.asarray(x, float) * t + math.pi, 2 * math.pi) - math.pi
    )
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, float) * t)) - math.pi / 2)
    return lat, lng


def web_tile(lat_deg, lng_deg, zoom: int):
    """Slippy-map tile indices (Web Mercator), vectorized."""
    lat = np.clip(np.asarray(lat_deg, float), -85.05112878, 85.05112878)
    lng = np.asarray(lng_deg, float)
    n = 1 << zoom
    tx = np.floor((lng + 180.0) / 360.0 * n).astype(np.int64)
    phi = np.radians(lat)
    ty = np.floor(
        (1.0 - np.log(np.tan(phi) + 1.0 / np.cos(phi)) / math.pi) / 2.0 * n
    ).astype(np.int64)
    return np.clip(tx, 0, n - 1), np.clip(ty, 0, n - 1)


def web_tile_bounds(tx: int, ty: int, zoom: int):
    """Tile → (lat_lo, lat_hi, lng_lo, lng_hi) degrees."""
    n = 1 << zoom
    lng_lo = tx / n * 360.0 - 180.0
    lng_hi = (tx + 1) / n * 360.0 - 180.0

    def _lat(yt):
        t = math.pi * (1 - 2 * yt / n)
        return math.degrees(math.atan(math.sinh(t)))

    return _lat(ty + 1), _lat(ty), lng_lo, lng_hi


# ---------------------------------------------------------------- operators
def assign_web_tiles(points: DataFrame, zoom: int) -> DataFrame:
    """Add (tile_x, tile_y) Web-Mercator tile columns via an Arrow pUDF."""

    @F.pandas_udf(
        StructType([StructField("tile_x", LongType()), StructField("tile_y", LongType())])
    )
    def _tiles(lat: pd.Series, lng: pd.Series) -> pd.DataFrame:
        tx, ty = web_tile(lat.to_numpy(), lng.to_numpy(), zoom)
        return pd.DataFrame({"tile_x": tx, "tile_y": ty})

    return points.withColumn("_t", _tiles(F.col("lat"), F.col("lng"))).select(
        "*", "_t.tile_x", "_t.tile_y"
    ).drop("_t")


def tile_to_cell_covering(tx: int, ty: int, zoom: int, max_cells: int = 8) -> list[CID]:
    """Raster tile → S2 covering (vector side of raster↔vector)."""
    from ..kernel.coverer import RegionCoverer
    from ..kernel.region import LatLngRect

    lat_lo, lat_hi, lng_lo, lng_hi = web_tile_bounds(tx, ty, zoom)
    rect = LatLngRect(
        R1Interval(math.radians(lat_lo), math.radians(lat_hi)),
        S1Interval(math.radians(lng_lo), math.radians(lng_hi)),
    )
    return RegionCoverer(max_cells=max_cells).get_covering(rect)


def range_tiling(begin_s: int, end_s: int) -> list[CID]:
    """Minimal cell tiling of a biased leaf-id range [begin, end) —
    FromBeginEnd via maximum_tile."""
    from ..kernel import cellunion

    return cellunion.from_begin_end(
        CID(begin_s + (1 << 63)), CID(end_s + (1 << 63))
    )


def tile_histogram(points: DataFrame, zoom: int) -> DataFrame:
    """Mentions per raster tile — the raster rollup."""
    return (
        assign_web_tiles(points, zoom)
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n_points"))
    )
