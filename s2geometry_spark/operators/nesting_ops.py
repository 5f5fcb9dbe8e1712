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

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.nesting import shape_nesting

        chains = [
            g.sort_values("vertex_idx")[["x", "y", "z"]].to_numpy(np.float64)
            for _, g in sorted(pdf.groupby("chain_id"), key=lambda kv: kv[0])
        ]
        rel = shape_nesting(chains, datum=datum)
        return pd.DataFrame(
            {
                "shape_id": key[0],
                "chain_id": np.arange(len(rel)),
                "parent_id": [r.parent_id for r in rel],
                "is_shell_i": [int(r.is_shell) for r in rel],
            }
        )

    return chain_vertices.groupBy("shape_id").applyInPandas(
        run, "shape_id string, chain_id int, parent_id int, is_shell_i int"
    )
