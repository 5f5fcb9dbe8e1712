"""Distributed shell/hole nesting classification
(S2ShapeNestingQuery, s2shape_nesting_query.h:76-103).

Spark shape: a lake of multi-ring polygons (millions of shapes, each
with a bounded number of chains) arrives exploded as
(shape_id, chain_id, vertex_idx, x, y, z).  Chain nesting is inherently
whole-shape work (the crossing parity sweep and transitive reduction
couple all chains of one shape) but embarrassingly parallel across
shapes, so the plan is ONE shuffle — groupBy(shape_id) — with the
kernel port running per shape inside applyInPandas.  Per-task cost is
O(chains · shape_edges) for the vectorized crossing matrices; shape
size, not table size, bounds a task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def shape_nesting_join(chain_vertices: DataFrame, datum: int = 0) -> DataFrame:
    """Per shape: chain relations (shape_id, chain_id, parent_id,
    is_shell_i).  parent_id is −1 for shells, per ChainRelation
    (s2shape_nesting_query.h:112-122)."""

    # sorted-run batched (operators/_group_batch.py): one Python call
    # resolves thousands of shapes; chain/vertex order is established
    # inside the group slice, so results are row-identical to the
    # per-group form.
    from ._group_batch import group_bounds, sorted_run_map

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.nesting import shape_nesting

        sid = pdf["shape_id"].to_numpy()
        out_sid, out_cid, out_pid, out_shell = [], [], [], []
        for lo, hi in group_bounds(sid):
            g0 = pdf.iloc[lo:hi]
            chains = [
                g.sort_values("vertex_idx")[["x", "y", "z"]].to_numpy(
                    np.float64
                )
                for _, g in sorted(
                    g0.groupby("chain_id"), key=lambda kv: kv[0]
                )
            ]
            rel = shape_nesting(chains, datum=datum)
            out_sid.append(np.repeat(sid[lo], len(rel)))
            out_cid.append(np.arange(len(rel)))
            out_pid.extend(r.parent_id for r in rel)
            out_shell.extend(int(r.is_shell) for r in rel)
        if not out_sid:
            return pd.DataFrame(
                columns=["shape_id", "chain_id", "parent_id", "is_shell_i"]
            )
        return pd.DataFrame(
            {
                "shape_id": np.concatenate(out_sid),
                "chain_id": np.concatenate(out_cid),
                "parent_id": out_pid,
                "is_shell_i": out_shell,
            }
        )

    return sorted_run_map(
        chain_vertices, "shape_id", emit,
        "shape_id string, chain_id int, parent_id int, is_shell_i int",
    )
