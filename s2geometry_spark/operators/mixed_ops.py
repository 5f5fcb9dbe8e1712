"""Distributed mixed-dimension boolean operations.

Mixed-geometry operand pairs (points # polylines # polygon text rows)
travel as DataFrame rows; each Arrow batch runs the
kernel/mixed.mixed_boolean_op engine on the executors via
``mapInPandas`` — the full S2BooleanOperation surface (all four
OpTypes x PolygonModel x PolylineModel x polyline_loops_have_boundaries,
s2boolean_operation.h:100-183) at pair-table scale.  Every pair is
independent: the physical plan is a single scan -> project with no
exchange, so a table of millions of operations distributes linearly
across executors (same plan shape as operators/overlay.py).

The output carries per-dimension feature counts plus a canonical
digest: the sorted multiset of rounded output features (points, line
edges, interior-on-left polygon boundary edges, degenerate features)
hashed with md5.  The digest is what the DuckDB oracle pins, so any
semantic drift in the kernel fails the contract query's value hash.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MIXED_PAIR_SCHEMA = (
    "pair string, geom_a string, geom_b string, op string,"
    " polygon_model string, polyline_model string, lhb boolean"
)

MIXED_OUT_SCHEMA = (
    "pair string, op string, polygon_model string, polyline_model string,"
    " n_points int, n_line_edges int, n_poly_edges int,"
    " n_deg_features int, digest string"
)


def mixed_pairs_df(spark: SparkSession, rows: list, partitions: int = 4) -> DataFrame:
    return spark.createDataFrame(rows, MIXED_PAIR_SCHEMA).repartition(partitions)


def _canonical_features(res, e: int = 6) -> tuple:
    """(n_points, n_line_edges, n_poly_edges, n_deg, digest)."""
    from ..kernel.coords import xyz_to_latlng
    from ..kernel.mixed import directed_boundary_loops

    def key(v):
        lat, lng = xyz_to_latlng(float(v[0]), float(v[1]), float(v[2]))
        # normalize -0.0 so bitwise-negated zeros digest identically
        return (round(float(lat), e) + 0.0, round(float(lng), e) + 0.0)

    feats = []
    for p in np.asarray(res.points).reshape(-1, 3):
        feats.append(("P", key(p)))
    n_line_edges = 0
    for line in res.polylines:
        line = np.asarray(line).reshape(-1, 3)
        for i in range(len(line) - 1):
            feats.append(("L", key(line[i]), key(line[i + 1])))
            n_line_edges += 1
    n_poly_edges = 0
    for v in directed_boundary_loops(res.polygon):
        n = len(v)
        if n < 3:
            if n == 2 and not np.array_equal(v[0], v[1]):
                feats.append(("GS", key(v[0]), key(v[1])))  # sibling pair
            continue
        for i in range(n):
            feats.append(("G", key(v[i]), key(v[(i + 1) % n])))
            n_poly_edges += 1
    for c, d, kind in res.deg_edges:
        feats.append(("DE", kind, key(c), key(d)))
    for p, kind in res.deg_points:
        feats.append(("DP", kind, key(p)))
    n_deg = len(res.deg_edges) + len(res.deg_points)
    digest = hashlib.md5(repr(sorted(map(repr, feats))).encode()).hexdigest()
    n_points = int(len(res.points))
    return n_points, n_line_edges, n_poly_edges, n_deg, digest


def mixed_ops_join(pairs: DataFrame) -> DataFrame:
    """Per (pair, op, models) row: feature counts + canonical digest of
    the mixed boolean operation's output."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.mixed import MixedOptions, mixed_boolean_op, parse_mixed

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                a = parse_mixed(row.geom_a)
                b = parse_mixed(row.geom_b)
                opt = MixedOptions(
                    row.polygon_model, row.polyline_model, bool(row.lhb)
                )
                res = mixed_boolean_op(a, b, row.op, opt)
                np_, nl, ng, nd, dig = _canonical_features(res)
                out.append(
                    (row.pair, row.op, row.polygon_model,
                     row.polyline_model, np_, nl, ng, nd, dig)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "pair", "op", "polygon_model", "polyline_model",
                    "n_points", "n_line_edges", "n_poly_edges",
                    "n_deg_features", "digest",
                ],
            )

    return pairs.mapInPandas(run, schema=MIXED_OUT_SCHEMA)
