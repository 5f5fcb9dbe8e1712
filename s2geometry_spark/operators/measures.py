"""Distributed geometric aggregations (SURVEY.md §2.5).

Loops/polylines arrive as exploded edge rows; per-edge terms are pure
batch kernels (Arrow pUDF) and the final measure is a groupBy().sum() —
Spark's partial+final aggregation does the map-side combine, so a
1M-vertex polygon aggregates with one shuffle of one row per partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..kernel import measures as M


def edges_df(spark: SparkSession, named_loops: list[tuple[str, np.ndarray]]) -> DataFrame:
    """(loop_id, edge_idx, cx,cy,cz, dx,dy,dz) exploded edge rows."""
    rows = []
    for loop_id, verts in named_loops:
        v = np.asarray(verts, float).reshape(-1, 3)
        d = np.roll(v, -1, axis=0)
        for i in range(len(v)):
            rows.append(
                (loop_id, i, *[float(x) for x in v[i]], *[float(x) for x in d[i]])
            )
    return spark.createDataFrame(
        rows,
        "loop_id string, edge_idx int, cx double, cy double, cz double,"
        " dx double, dy double, dz double",
    )


_TERM_SCHEMA = StructType(
    [
        StructField("area_term", DoubleType()),
        StructField("edge_len", DoubleType()),
        StructField("centroid_x", DoubleType()),
        StructField("centroid_y", DoubleType()),
        StructField("centroid_z", DoubleType()),
    ]
)


@F.pandas_udf(_TERM_SCHEMA)
def _edge_terms(
    cx: pd.Series, cy: pd.Series, cz: pd.Series,
    dx: pd.Series, dy: pd.Series, dz: pd.Series,
) -> pd.DataFrame:
    C = np.stack([cx, cy, cz], -1).astype(np.float64)
    D = np.stack([dx, dy, dz], -1).astype(np.float64)
    N = np.broadcast_to(M.NORTH, C.shape)
    area = M.loop_edge_area_terms(C, D)
    length = M.stable_angle(C, D)
    cen = M.triangle_true_centroid(N, C, D)
    return pd.DataFrame(
        {
            "area_term": area,
            "edge_len": length,
            "centroid_x": cen[:, 0],
            "centroid_y": cen[:, 1],
            "centroid_z": cen[:, 2],
        }
    )


def loop_measures(edges: DataFrame) -> DataFrame:
    """Per-loop (signed_area, area, perimeter, centroid) via one shuffle."""
    terms = edges.withColumn(
        "_t",
        _edge_terms(
            F.col("cx"), F.col("cy"), F.col("cz"),
            F.col("dx"), F.col("dy"), F.col("dz"),
        ),
    ).select("loop_id", "_t.*")
    agg = terms.groupBy("loop_id").agg(
        F.sum("area_term").alias("signed_area_raw"),
        F.sum("edge_len").alias("perimeter"),
        F.sum("centroid_x").alias("centroid_x"),
        F.sum("centroid_y").alias("centroid_y"),
        F.sum("centroid_z").alias("centroid_z"),
    )
    two_pi = float(2 * np.pi)
    four_pi = float(4 * np.pi)
    signed = F.pmod(F.col("signed_area_raw"), F.lit(four_pi))
    signed = F.when(signed > two_pi, signed - four_pi).otherwise(signed)
    area = F.when(signed < 0, signed + four_pi).otherwise(signed)
    return agg.select(
        "loop_id",
        signed.alias("signed_area"),
        area.alias("area"),
        "perimeter",
        "centroid_x", "centroid_y", "centroid_z",
    )
