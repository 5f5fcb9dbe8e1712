"""Distributed S2BufferOperation over a jobs table
(kernel/buffer.BufferOperation; s2buffer_operation.h).

Spark shape: buffer jobs arrive exploded as (job, kind, radius_rad,
error_fraction, end_cap, side, vertex_idx, lat, lng) — one row per
input vertex, with the options repeated per row (tiny and uniform per
job).  Buffering is whole-input work (the winding resolution couples
every offset path of one job) but embarrassingly parallel across jobs,
so the plan is ONE shuffle — groupBy over the job key — with the kernel
facade running per job inside applyInPandas.  A task is bounded by one
job's offset-path size, never the table's.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .polyline_ops import simplify_digest


def buffer_shapes_join(jobs: DataFrame) -> DataFrame:
    """Per job: one row per output loop (loop_idx -1 with empty/full
    flags when the result has no loops) — (job, loop_idx, n_vertices,
    digest, full_i, empty_i)."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.buffer import BufferOperation, BufferOptions
        from ..kernel.coords import latlng_to_xyz

        job, kind, radius, error_fraction, end_cap, side = key
        options = BufferOptions(float(radius))
        options.set_error_fraction(float(error_fraction))
        options.end_cap_style = end_cap
        options.polyline_side = side
        op = BufferOperation(options)
        pdf = pdf.sort_values("vertex_idx")
        lat = pdf["lat"].to_numpy(np.float64)
        lng = pdf["lng"].to_numpy(np.float64)
        x, y, z = latlng_to_xyz(lat, lng)
        v = np.stack([x, y, z], -1)
        if kind == "point":
            for p in v:
                op.add_point(p)
        elif kind == "polyline":
            op.add_polyline(v)
        else:
            op.add_loop(v)
        result = op.build()
        if not result.loops:
            return pd.DataFrame(
                {
                    "job": [job],
                    "loop_idx": [-1],
                    "n_vertices": [0],
                    "digest": [simplify_digest(np.empty((0, 3)))],
                    "full_i": [int(result.is_full())],
                    "empty_i": [int(result.is_empty())],
                }
            )
        return pd.DataFrame(
            {
                "job": job,
                "loop_idx": np.arange(len(result.loops)),
                "n_vertices": [len(l) for l in result.loops],
                "digest": [simplify_digest(l) for l in result.loops],
                "full_i": 0,
                "empty_i": 0,
            }
        )

    return jobs.groupBy(
        "job", "kind", "radius_rad", "error_fraction", "end_cap", "side"
    ).applyInPandas(
        run,
        "job string, loop_idx int, n_vertices int, digest string,"
        " full_i int, empty_i int",
    )
