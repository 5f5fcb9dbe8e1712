"""Distributed closest-edge join: a points DataFrame vs broadcast shapes.

The DataFrame face of kernel/closest_edge.py: shapes (small, query side)
ship in the UDF closure; each Arrow batch computes all (point × edge)
distances as one einsum + polygon-interior PIP, returning the per-point
top-k as an array that is then exploded — the S2ClosestEdgeQuery
semantics at fact-table scale with zero shuffles of the point side.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from ..kernel.closest_edge import Shape, find_closest_edges

_HIT = StructType(
    [
        StructField("shape_id", IntegerType()),
        StructField("edge_id", IntegerType()),
        StructField("dist2", DoubleType()),
    ]
)


def closest_edges_join(
    points: DataFrame,
    shapes: list[Shape],
    k: int = 1,
    max_distance_rad: float | None = None,
    include_interiors: bool = True,
) -> DataFrame:
    """points(lat, lng, …) → one row per (point, hit) with shape_id,
    edge_id (−1 = polygon interior), dist2, dist_rad."""

    @F.pandas_udf(ArrayType(_HIT))
    def hits(lat: pd.Series, lng: pd.Series) -> pd.Series:
        from ..kernel.coords import latlng_to_xyz

        x, y, z = latlng_to_xyz(lat.to_numpy(np.float64), lng.to_numpy(np.float64))
        targets = np.stack([x, y, z], -1)
        res = find_closest_edges(
            shapes, targets, k=k,
            max_distance_rad=max_distance_rad,
            include_interiors=include_interiors,
        )
        return pd.Series(
            [
                [
                    {"shape_id": sid, "edge_id": eid, "dist2": d}
                    for sid, eid, d in row
                ]
                for row in res
            ]
        )

    exploded = points.withColumn(
        "_hit", F.explode(hits(F.col("lat"), F.col("lng")))
    )
    return exploded.select(
        "*",
        F.col("_hit.shape_id").alias("shape_id"),
        F.col("_hit.edge_id").alias("edge_id"),
        F.col("_hit.dist2").alias("dist2"),
    ).drop("_hit").withColumn(
        "dist_rad",
        2 * F.asin(0.5 * F.sqrt(F.least(F.col("dist2"), F.lit(4.0)))),
    )


def directed_hausdorff_join(
    points: DataFrame,
    shapes: list[Shape],
    group_col: str,
) -> DataFrame:
    """Distributed directed Hausdorff distance (S2HausdorffDistanceQuery
    semantics, s2hausdorff_distance_query.h): per group of points, the
    max over points of the min squared-chord distance to the shapes'
    edges — one Arrow batch kernel + one partial+final max aggregation.
    """
    C = np.concatenate([s.edges_c for s in shapes if len(s.edges_c)])
    D = np.concatenate([s.edges_d for s in shapes if len(s.edges_d)])

    @F.pandas_udf("double")
    def min_d2(lat: pd.Series, lng: pd.Series) -> pd.Series:
        from ..kernel.coords import latlng_to_xyz
        from ..kernel.distance import point_edge_dist2

        x, y, z = latlng_to_xyz(lat.to_numpy(np.float64), lng.to_numpy(np.float64))
        X = np.stack([x, y, z], -1)
        return pd.Series(point_edge_dist2(X, C, D).min(axis=1))

    return (
        points.withColumn("_d2", min_d2(F.col("lat"), F.col("lng")))
        .groupBy(group_col)
        .agg(F.max("_d2").alias("hausdorff_d2"))
    )


def furthest_edges_join(
    points: DataFrame,
    shapes: list[Shape],
    k: int = 1,
    min_distance_rad: float | None = None,
    include_interiors: bool = False,
) -> DataFrame:
    """S2FurthestEdgeQuery join (s2furthest_edge_query.h): one row per
    (point, hit) with shape_id, edge_id (−1 = polygon interior contains
    the point's ANTIPODE, distance Straight = 4.0), dist2, dist_rad.
    Same Arrow-batched plan shape as closest_edges_join — the kernel
    resolves max distance through the antipode identity
    max_d2 = 4 − min_d2(−x) (s2edge_distances.cc:236-249)."""
    from ..kernel.closest_edge import find_furthest_edges

    @F.pandas_udf(ArrayType(_HIT))
    def hits(lat: pd.Series, lng: pd.Series) -> pd.Series:
        from ..kernel.coords import latlng_to_xyz

        x, y, z = latlng_to_xyz(lat.to_numpy(np.float64), lng.to_numpy(np.float64))
        targets = np.stack([x, y, z], -1)
        res = find_furthest_edges(
            shapes, targets, k=k,
            include_interiors=include_interiors,
            min_distance_rad=min_distance_rad,
        )
        return pd.Series(
            [
                [
                    {"shape_id": sid, "edge_id": eid, "dist2": d}
                    for sid, eid, d in row
                ]
                for row in res
            ]
        )

    exploded = points.withColumn(
        "_hit", F.explode(hits(F.col("lat"), F.col("lng")))
    )
    return exploded.select(
        "*",
        F.col("_hit.shape_id").alias("shape_id"),
        F.col("_hit.edge_id").alias("edge_id"),
        F.col("_hit.dist2").alias("dist2"),
    ).drop("_hit").withColumn(
        "dist_rad",
        2 * F.asin(0.5 * F.sqrt(F.least(F.col("dist2"), F.lit(4.0)))),
    )
