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

    # sorted-run batched (operators/_group_batch.py): one Python call
    # sweeps thousands of pairs; loop vertices are ordered inside the
    # pair slice, so results are row-identical to the per-group form.
    from ._group_batch import group_bounds, sorted_run_map

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.contains import Loop
        from ..kernel.looprel import (
            compare_boundary,
            loop_contains,
            loop_intersects,
        )

        pid = pdf["pair_id"].to_numpy()
        ids, ab, ba, inter, cmpb = [], [], [], [], []
        for lo, hi in group_bounds(pid):
            g0 = pdf.iloc[lo:hi]
            loops = {}
            for side, g in g0.groupby("side"):
                loops[side] = Loop(
                    g.sort_values("vertex_idx")[["x", "y", "z"]].to_numpy(
                        np.float64
                    )
                )
            a, b = loops["a"], loops["b"]
            ids.append(pid[lo])
            ab.append(int(loop_contains(a, b)))
            ba.append(int(loop_contains(b, a)))
            inter.append(int(loop_intersects(a, b)))
            cmpb.append(compare_boundary(a, b))
        return pd.DataFrame(
            {
                "pair_id": ids,
                "contains_ab_i": ab,
                "contains_ba_i": ba,
                "intersects_i": inter,
                "cmp_boundary": cmpb,
            }
        )

    return sorted_run_map(
        pair_vertices, "pair_id", emit,
        "pair_id string, contains_ab_i int, contains_ba_i int,"
        " intersects_i int, cmp_boundary int",
    )
