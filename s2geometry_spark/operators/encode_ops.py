"""Distributed region encoding: serialize a lake of geometries to the
reference wire format (s2region Encode; s2loop.cc:640-651,
s2polygon.cc:731-805, s2polyline.cc:425-536).

Spark shape: geometries arrive exploded as
(geom_id, kind, chain_id, depth, vertex_idx, x, y, z) — one row per
vertex (vertex_idx -1 marks an intentionally empty geometry).  Encoding
couples all chains of one geometry but nothing across geometries, so
the plan is ONE shuffle — groupBy(geom_id) — with the byte-exact kernel
encoders running per geometry inside applyInPandas.  Per-task memory is
one geometry's vertex count, never the table's: the plan for exporting
millions of geometries from Parquet to the reference wire format.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _encode_one(pdf: pd.DataFrame) -> bytes:
    from ..kernel import encodings as E

    kind = pdf["kind"].iloc[0]
    chains = []
    for cid, cg in sorted(pdf.groupby("chain_id"), key=lambda kv: kv[0]):
        depth = int(cg["depth"].iloc[0])
        if (cg["vertex_idx"] < 0).any():
            chains.append((np.zeros((0, 3)), depth))
            continue
        v = cg.sort_values("vertex_idx")[["x", "y", "z"]].to_numpy(np.float64)
        chains.append((v, depth))

    if kind == "loop":
        return bytes(E.encode_loop(chains[0][0], chains[0][1]).buf)
    if kind == "polyline":
        v = chains[0][0] if chains else np.zeros((0, 3))
        return bytes(E.encode_polyline(v).buf)
    if kind == "polyline_compact":
        v = chains[0][0] if chains else np.zeros((0, 3))
        return bytes(E.encode_polyline_compact(v).buf)
    if kind == "polygon":
        loops = [(v, d) for v, d in chains if len(v)]
        return bytes(E.encode_polygon_uncompressed(loops).buf)
    if kind == "polygon_compact":
        loops = [(v, d) for v, d in chains if len(v)]
        return bytes(E.encode_polygon(loops).buf)
    raise ValueError(f"unknown geometry kind {kind!r}")


def encode_geometries(geoms: DataFrame) -> DataFrame:
    """Per geometry: (geom_id, encoding_hex, n_bytes)."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        raw = _encode_one(pdf)
        return pd.DataFrame(
            {
                "geom_id": [key[0]],
                "encoding_hex": [raw.hex().upper()],
                "n_bytes": [len(raw)],
            }
        )

    return geoms.groupBy("geom_id").applyInPandas(
        run, "geom_id string, encoding_hex string, n_bytes int"
    )
