"""Distributed geometry validation (S2ValidQuery / S2LegacyValidQuery,
s2validation_query.h) over a lake of geometries.

Spark shape: geometries arrive exploded as
(geom_id, shape_id, dim, chain_id, vertex_idx, x, y, z) — one row per
vertex of every chain of every shape.  Validation couples all shapes of
one geometry (duplicate edges, crossings, and containment are
cross-shape checks) but is embarrassingly parallel across geometries,
so the plan is ONE shuffle — groupBy(geom_id) — with the kernel
validation queries running per geometry inside applyInPandas.  Per-task
cost is O(edges²) in the GEOMETRY's edge count, never the table's —
the plan a lake of millions of documents' extracted geometries needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _build_vshapes(pdf: pd.DataFrame):
    from ..kernel.valid_query import VShape

    shapes = []
    for (_sid, dim), g in sorted(
        pdf.groupby(["shape_id", "dim"]), key=lambda kv: kv[0][0]
    ):
        dim = int(dim)
        chains = []
        for _cid, cg in sorted(g.groupby("chain_id"), key=lambda kv: kv[0]):
            if (cg["vertex_idx"] < 0).any():
                # sentinel row: the 0-vertex chain (the FULL polygon
                # convention for dim-2 lax shapes)
                chains.append([])
                continue
            v = cg.sort_values("vertex_idx")[["x", "y", "z"]].to_numpy(
                np.float64
            )
            if dim == 0:
                for p in v:
                    chains.append([(p, p)])
            elif dim == 1:
                chains.append([(v[i], v[i + 1]) for i in range(len(v) - 1)])
            else:
                n = len(v)
                chains.append([(v[i], v[(i + 1) % n]) for i in range(n)])
        shapes.append(VShape(dim, chains))
    return shapes


def validate_geometries(geoms: DataFrame) -> DataFrame:
    """Per geometry: (geom_id, valid_i, code, legacy_valid_i,
    legacy_code) from S2ValidQuery and S2LegacyValidQuery.

    Sorted-run batched (operators/_group_batch.py): one Python call
    validates thousands of geometries; `_build_vshapes` orders
    shapes/chains/vertices itself, so results are row-identical to the
    per-group form."""
    from ._group_batch import group_bounds, sorted_run_map

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.valid_query import LegacyValidQuery, ValidQuery

        gid = pdf["geom_id"].to_numpy()
        ids, oks, codes, loks, lcodes = [], [], [], [], []
        for lo, hi in group_bounds(gid):
            shapes = _build_vshapes(pdf.iloc[lo:hi])
            ok, code = ValidQuery().validate(shapes)
            lok, lcode = LegacyValidQuery().validate(shapes)
            ids.append(gid[lo])
            oks.append(int(ok))
            codes.append(code)
            loks.append(int(lok))
            lcodes.append(lcode)
        return pd.DataFrame(
            {
                "geom_id": ids,
                "valid_i": oks,
                "code": codes,
                "legacy_valid_i": loks,
                "legacy_code": lcodes,
            }
        )

    return sorted_run_map(
        geoms, "geom_id", emit,
        "geom_id string, valid_i int, code string,"
        " legacy_valid_i int, legacy_code string",
    )
