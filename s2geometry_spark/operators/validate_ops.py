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
    legacy_code) from S2ValidQuery and S2LegacyValidQuery."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.valid_query import LegacyValidQuery, ValidQuery

        shapes = _build_vshapes(pdf)
        ok, code = ValidQuery().validate(shapes)
        lok, lcode = LegacyValidQuery().validate(shapes)
        return pd.DataFrame(
            {
                "geom_id": [key[0]],
                "valid_i": [int(ok)],
                "code": [code],
                "legacy_valid_i": [int(lok)],
                "legacy_code": [lcode],
            }
        )

    return geoms.groupBy("geom_id").applyInPandas(
        run,
        "geom_id string, valid_i int, code string,"
        " legacy_valid_i int, legacy_code string",
    )
