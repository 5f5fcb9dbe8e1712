"""Distributed antimeridian splitting — the GeoJSON-compatibility
transform (s2boolean_operation_test.cc:1727-1795 MeridianSplitting):
subtracting a degenerate loop that follows the 180-degree meridian
splits every polyline and polygon so that NO output edge crosses the
meridian, inserting pole vertices where a loop wraps a pole.

Spark shape: one row per input vertex, one groupBy(job, kind) shuffle,
the whole split runs per job inside a single applyInPandas group via
the exact kernel (kernel/mixed.mixed_boolean_op difference against the
sliver).  At scale the job table holds millions of independent
features (one per OSM way / admin polygon), so per-task cost is
bounded by feature size, never table size — the same plan shape as
operators/layer_ops.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .layer_ops import piece_digest

# the degenerate sliver along the 180-degree meridian
# (s2boolean_operation_test.cc:1730-1733: S2Point loops
# {(0,0,-1), (-1,0,0), (0,0,1), (-1,0,0)})
_MERIDIAN_RING = np.array(
    [[0.0, 0.0, -1.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [-1.0, 0.0, 0.0]]
)


def meridian_jobs_df(
    spark: SparkSession,
    fixtures: list[tuple[str, str, list[list[tuple[float, float]]]]],
    partitions: int = 4,
) -> DataFrame:
    """(name, kind ∈ {polyline, polygon}, chains) → one row per vertex."""
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


def split_job(kind: str, chains: list[np.ndarray]) -> list[np.ndarray]:
    """One meridian split on the executor: difference against the
    sliver.  Returns the output pieces (split polylines, or split
    polygon boundary loops) as (n,3) vertex arrays."""
    from ..kernel.contains import Loop, Polygon
    from ..kernel.mixed import (
        MixedGeometry,
        MixedOptions,
        mixed_boolean_op,
    )

    if kind == "polygon":
        from ..kernel.contains import lax_polygon_reading

        # input loops are LAX (interior on the left, like
        # MakeIndexOrDie): a CW outer ring means world-minus-ring
        g = MixedGeometry(
            polygon=lax_polygon_reading(Polygon([Loop(c) for c in chains]))
        )
    else:
        g = MixedGeometry(polylines=list(chains))
    mer = MixedGeometry(polygon=Polygon([Loop(_MERIDIAN_RING)]))
    out = mixed_boolean_op(g, mer, "difference", MixedOptions())
    pieces = [np.asarray(l, np.float64).reshape(-1, 3)
              for l in out.polylines]
    pieces += [lp.vertices for lp in out.polygon.loops
               if len(lp.vertices) >= 2]
    return pieces


def _crosses_meridian(v: np.ndarray, closed: bool) -> bool:
    """True if any edge crosses the 180-degree meridian with both
    endpoints strictly off it (y=0, x<0 is ON the meridian plane)."""
    n = len(v)
    m = n if closed else n - 1
    for i in range(m):
        a, b = v[i], v[(i + 1) % n]
        on_a = abs(a[1]) < 1e-14 and a[0] <= 0
        on_b = abs(b[1]) < 1e-14 and b[0] <= 0
        if on_a or on_b:
            continue
        # crossing the half-plane y=0, x<0: y changes sign and the
        # great-circle intersection with y=0 has x<0
        if a[1] * b[1] < 0:
            t = a[1] / (a[1] - b[1])
            x = a[0] + t * (b[0] - a[0])
            if x < 0:
                return True
    return False


def split_meridian_join(jobs: DataFrame) -> DataFrame:
    """One row per output piece: (job, piece_idx, n_vertices,
    crosses_meridian, digest), pieces in canonical digest order.
    crosses_meridian must be false for every row — the transform's
    whole point."""

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
        pieces = split_job(kind, chains)
        rows = sorted(
            (piece_digest(p), len(p),
             bool(_crosses_meridian(p, kind == "polygon")))
            for p in pieces
        )
        return pd.DataFrame(
            {
                "job": job,
                "piece_idx": range(len(rows)),
                "n_vertices": [n for _, n, _ in rows],
                "crosses_meridian": [c for _, _, c in rows],
                "digest": [d for d, _, _ in rows],
            }
        )

    return jobs.groupBy("job", "kind").applyInPandas(
        run,
        "job string, piece_idx int, n_vertices int,"
        " crosses_meridian boolean, digest string",
    )
