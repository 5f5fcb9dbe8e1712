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
    """Per polyline: SubsampleVertices indices (kept vertices, in order).

    Sorted-run batched (operators/_group_batch.py): one Python call
    subsamples thousands of polylines — measured at 100k 20-vertex
    polylines: 6.7-7.4 s vs 19-22 s for the per-group applyInPandas
    form, identical output.  vertex_idx rides the partition sort, so
    each group slice arrives vertex-ordered."""
    from ._group_batch import group_bounds, sorted_run_map

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.polyline import subsample_vertices

        pid = pdf["polyline_id"].to_numpy()
        V = pdf[["x", "y", "z"]].to_numpy(np.float64)
        out_id, out_k = [], []
        for lo, hi in group_bounds(pid):
            kept = subsample_vertices(V[lo:hi], tolerance_rad)
            out_id.append(np.repeat(pid[lo], len(kept)))
            out_k.append(np.asarray(kept, dtype=np.int32))
        if not out_id:
            return pd.DataFrame(columns=["polyline_id", "kept_idx"])
        return pd.DataFrame(
            {
                "polyline_id": np.concatenate(out_id),
                "kept_idx": np.concatenate(out_k),
            }
        )

    return sorted_run_map(
        vertices, "polyline_id", emit,
        "polyline_id string, kept_idx int", sort_cols=("vertex_idx",),
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


# ------------------------------------------------------------------
# simplify_edge_chains as a distributed job table
# ------------------------------------------------------------------

def simplify_jobs_df(
    spark: SparkSession,
    fixtures: list[tuple[str, str, float, list[list[tuple[float, float]]]]],
    partitions: int = 4,
) -> DataFrame:
    """Explode simplification jobs into rows.  Each fixture is one JOB
    (name, snap_kind, snap_param, polylines-as-latlng-lists): a group of
    polylines snapped and simplified together over one shared site set,
    exactly the unit S2Builder processes per Build() call.  At scale the
    table holds millions of independent jobs (e.g. one per road/track),
    so the one groupBy(job) shuffle is the whole plan."""
    rows = []
    for name, kind, param, polys in fixtures:
        for li, poly in enumerate(polys):
            for vi, (lat, lng) in enumerate(poly):
                rows.append((name, kind, float(param), li, vi, float(lat), float(lng)))
    return spark.createDataFrame(
        rows,
        "job string, snap_kind string, snap_param double,"
        " line_idx int, vertex_idx int, lat double, lng double",
    ).repartition(partitions)


def _make_snap(kind: str, param: float):
    from ..kernel.builder import (
        IdentitySnapFunction,
        IntLatLngSnapFunction,
        S2CellIdSnapFunction,
    )

    if kind == "identity":
        return IdentitySnapFunction(param)
    if kind == "intlatlng":
        return IntLatLngSnapFunction(int(param))
    if kind == "cellid":
        return S2CellIdSnapFunction(int(param))
    raise ValueError(f"unknown snap kind {kind!r}")


def simplify_digest(chain: np.ndarray, digits: int = 6) -> str:
    """Canonical digest of a simplified chain: md5 over rounded lat/lng
    rows (shared by the distributed operator and the pinned oracle)."""
    import hashlib

    from ..kernel.coords import xyz_to_latlng

    c = np.asarray(chain, float).reshape(-1, 3)
    if len(c) == 0:
        return hashlib.md5(b"").hexdigest()
    lat, lng = xyz_to_latlng(c[:, 0], c[:, 1], c[:, 2])
    txt = ";".join(
        f"{round(float(a), digits):.6f},{round(float(b), digits):.6f}"
        for a, b in zip(lat, lng)
    )
    return hashlib.md5(txt.encode()).hexdigest()


def simplify_polylines_join(jobs: DataFrame) -> DataFrame:
    """S2Builder simplify_edge_chains per job
    (kernel/builder.simplify_snapped_polylines): one applyInPandas per
    (job, snap_kind, snap_param) group; output one row per input
    polyline with input/output vertex counts and the canonical output
    digest.  Executors do all geometry; the driver never sees a
    vertex."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.builder import simplify_snapped_polylines
        from ..kernel.coords import latlng_to_xyz

        job, kind, param = key
        snap = _make_snap(kind, float(param))
        pdf = pdf.sort_values(["line_idx", "vertex_idx"])
        polys = []
        line_ids = []
        for li, grp in pdf.groupby("line_idx", sort=True):
            lat = grp["lat"].to_numpy(np.float64)
            lng = grp["lng"].to_numpy(np.float64)
            x, y, z = latlng_to_xyz(lat, lng)
            polys.append(np.stack([x, y, z], -1))
            line_ids.append(int(li))
        out = simplify_snapped_polylines(polys, snap)
        return pd.DataFrame(
            {
                "job": job,
                "line_idx": line_ids,
                "n_in": [len(p) for p in polys],
                "n_out": [len(c) for c in out],
                "digest": [simplify_digest(c) for c in out],
            }
        )

    return jobs.groupBy("job", "snap_kind", "snap_param").applyInPandas(
        run,
        "job string, line_idx int, n_in int, n_out int, digest string",
    )
