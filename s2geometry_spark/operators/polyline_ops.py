"""Distributed polyline operations (SURVEY.md §2.5 extension).

Polylines arrive exploded as (polyline_id, vertex_idx, x, y, z) rows —
the same layout as operators/measures.edges_df.  Subsample/project are
inherently sequential *within* one polyline but embarrassingly parallel
*across* polylines, so the Spark shape is groupBy(polyline_id) +
applyInPandas: a table of millions of polylines simplifies with one
shuffle, each group running the exact kernel port
(s2polyline.cc:568-657)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def vertices_df(
    spark: SparkSession, named: list[tuple[str, np.ndarray]], partitions: int = 4
) -> DataFrame:
    rows = []
    for pid, verts in named:
        v = np.asarray(verts, float).reshape(-1, 3)
        for i in range(len(v)):
            rows.append((pid, i, float(v[i][0]), float(v[i][1]), float(v[i][2])))
    return spark.createDataFrame(
        rows, "polyline_id string, vertex_idx int, x double, y double, z double"
    ).repartition(partitions)


def subsample_polylines(vertices: DataFrame, tolerance_rad: float) -> DataFrame:
    """Per polyline: SubsampleVertices indices (kept vertices, in order)."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.polyline import subsample_vertices

        pdf = pdf.sort_values("vertex_idx")
        v = pdf[["x", "y", "z"]].to_numpy(np.float64)
        kept = subsample_vertices(v, tolerance_rad)
        return pd.DataFrame({"polyline_id": key[0], "kept_idx": kept})

    return vertices.groupBy("polyline_id").applyInPandas(
        run, "polyline_id string, kept_idx int"
    )


def project_points_onto_polyline(
    points: DataFrame, polyline_vertices: np.ndarray,
    point_cols: tuple[str, ...] = ("key",),
) -> DataFrame:
    """Project every point of a fact table onto one broadcast polyline:
    (point cols, proj_x/y/z, next_vertex, fraction) — the distributed
    face of S2Polyline::Project + UnInterpolate.  The polyline ships in
    the UDF closure; the fact table is scanned once, no shuffle."""
    from pyspark.sql import functions as F

    v = np.asarray(polyline_vertices, float).reshape(-1, 3)

    @F.pandas_udf(
        "proj_x double, proj_y double, proj_z double,"
        " next_vertex int, fraction double"
    )
    def proj(lat: pd.Series, lng: pd.Series) -> pd.DataFrame:
        from ..kernel.coords import latlng_to_xyz
        from ..kernel.polyline import project, uninterpolate

        x, y, z = latlng_to_xyz(lat.to_numpy(np.float64), lng.to_numpy(np.float64))
        X = np.stack([x, y, z], -1)
        out = []
        for p in X:
            cp, nxt = project(v, p)
            frac = uninterpolate(v, cp, nxt if nxt < len(v) else len(v) - 1)
            out.append((cp[0], cp[1], cp[2], nxt, frac))
        return pd.DataFrame(
            out, columns=["proj_x", "proj_y", "proj_z", "next_vertex", "fraction"]
        )

    return points.select(
        *point_cols, proj(F.col("lat"), F.col("lng")).alias("_p")
    ).select(*point_cols, "_p.*")
