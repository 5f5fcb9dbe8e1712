"""Distributed S2Builder output-layer assembly (kernel/layers.py as a
job table): each JOB is one Builder run — a group of edges assembled
into polylines (S2PolylineVectorLayer, WALK) or polygon loops
(S2PolygonLayer, left-turn map) — executed per group in ONE
applyInPandas.  The only shuffle is the groupBy(job); at scale the
table holds millions of independent assembly jobs (one per
road-network tile / per feature), so per-task cost is bounded by job
size, never table size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def layer_jobs_df(
    spark: SparkSession,
    fixtures: list[tuple[str, str, list[list[tuple[float, float]]]]],
    partitions: int = 4,
) -> DataFrame:
    """(name, kind ∈ {polyline_vector, polygon}, chains): polyline jobs
    take open vertex chains, polygon jobs take closed loops."""
    rows = []
    for name, kind, chains in fixtures:
        for ci, chain in enumerate(chains):
            for vi, (lat, lng) in enumerate(chain):
                rows.append((name, kind, ci, vi, float(lat), float(lng)))
    return spark.createDataFrame(
        rows,
        "job string, kind string, chain_idx int, vertex_idx int,"
        " lat double, lng double",
    ).repartition(partitions)


def piece_digest(vertices: np.ndarray, digits: int = 9) -> str:
    from ..kernel.coords import xyz_to_latlng

    v = np.asarray(vertices, float).reshape(-1, 3)
    lat, lng = xyz_to_latlng(v[:, 0], v[:, 1], v[:, 2])
    txt = ";".join(
        f"{round(float(a), digits):.9f},{round(float(b), digits):.9f}"
        for a, b in zip(lat, lng)
    )
    return hashlib.md5(txt.encode()).hexdigest()


def assemble_job(kind: str, chains: list[np.ndarray]) -> list[np.ndarray]:
    """One Builder run on the executor; returns assembled pieces."""
    from ..kernel.graph import DIRECTED, WALK
    from ..kernel.layers import Builder, PolygonLayer, PolylineVectorLayer

    b = Builder()
    if kind == "polygon":
        layer = PolygonLayer(edge_type=DIRECTED)
        b.start_layer(layer)
        for chain in chains:
            b.add_loop(chain)
        err = b.build()
        assert err is None, err
        return layer.loops
    layer = PolylineVectorLayer(edge_type=DIRECTED, polyline_type=WALK)
    b.start_layer(layer)
    for chain in chains:
        b.add_polyline(chain)
    err = b.build()
    assert err is None, err
    return layer.polylines


def assemble_layers_join(jobs: DataFrame) -> DataFrame:
    """One row per assembled piece: (job, piece_idx, n_vertices,
    digest); pieces ordered canonically by digest so the output is
    deterministic regardless of executor scheduling."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.coords import latlng_to_xyz

        job, kind = key
        pdf = pdf.sort_values(["chain_idx", "vertex_idx"])
        chains = []
        for _, grp in pdf.groupby("chain_idx", sort=True):
            x, y, z = latlng_to_xyz(
                grp["lat"].to_numpy(np.float64),
                grp["lng"].to_numpy(np.float64),
            )
            chains.append(np.stack([x, y, z], -1))
        pieces = assemble_job(kind, chains)
        rows = sorted(
            (piece_digest(p), len(p)) for p in pieces
        )
        return pd.DataFrame(
            {
                "job": job,
                "piece_idx": range(len(rows)),
                "n_vertices": [n for _, n in rows],
                "digest": [d for d, _ in rows],
            }
        )

    return jobs.groupBy("job", "kind").applyInPandas(
        run, "job string, piece_idx int, n_vertices int, digest string"
    )
