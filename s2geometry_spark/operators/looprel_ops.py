"""Distributed loop↔loop relation classification
(S2Loop::Contains/Intersects/CompareBoundary, s2loop.cc:1056-1235).

Spark shape: a lake of candidate loop PAIRS (produced upstream by a
covering/cell-bucket join) arrives exploded as
(pair_id, side, vertex_idx, x, y, z).  Each pair's relation is
whole-pair work (the crossing sweep couples all edges of both loops)
but embarrassingly parallel across pairs, so the plan is ONE shuffle —
groupBy(pair_id) — with the kernel relation sweep running per pair in
applyInPandas.  Per-task cost is O(edges_a · edges_b) vectorized sign
triage, bounded by loop size, never table size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def loop_relations_join(pair_vertices: DataFrame) -> DataFrame:
    """Per pair: (pair_id, contains_ab_i, contains_ba_i, intersects_i,
    cmp_boundary).  `side` distinguishes the two operands ('a' < 'b')."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.contains import Loop
        from ..kernel.looprel import (
            compare_boundary,
            loop_contains,
            loop_intersects,
        )

        loops = {}
        for side, g in pdf.groupby("side"):
            loops[side] = Loop(
                g.sort_values("vertex_idx")[["x", "y", "z"]].to_numpy(np.float64)
            )
        a, b = loops["a"], loops["b"]
        return pd.DataFrame(
            {
                "pair_id": [key[0]],
                "contains_ab_i": [int(loop_contains(a, b))],
                "contains_ba_i": [int(loop_contains(b, a))],
                "intersects_i": [int(loop_intersects(a, b))],
                "cmp_boundary": [compare_boundary(a, b)],
            }
        )

    return pair_vertices.groupBy("pair_id").applyInPandas(
        run,
        "pair_id string, contains_ab_i int, contains_ba_i int,"
        " intersects_i int, cmp_boundary int",
    )
