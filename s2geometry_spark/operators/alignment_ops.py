"""Distributed polyline alignment (DTW) — pairwise costs, per-group
medoid, per-group DBA consensus.

Reference surface: s2polyline_alignment.h:125-266 (GetExactVertexAlignment
/ GetApproxVertexAlignment / GetMedoidPolyline / GetConsensusPolyline).

Spark shape (a trajectory-clustering job over millions of GPS traces):

- Polylines arrive exploded as (group, polyline_id, ord, vertex_idx,
  x, y, z) rows — the layout of operators/polyline_ops.vertices_df plus
  a grouping key (road segment, vehicle, region cell).
- ``alignment_cost_pairs``: every DTW evaluation needs BOTH operands in
  one task, so each pair's vertices are co-located with ONE shuffle: the
  pair table joins the vertex table per side (two broadcast-able or
  shuffled equi joins), the union is hash-partitioned by pair_id, and a
  single applyInPandas runs the vectorized kernel DTW per pair.  Cost
  per task is O(|a|·|b|) for exact, O(max·radius) for approx — bounded
  by trajectory length, never by table size.
- ``medoid_per_group``: the (N²−N)/2 within-group pairs are generated
  by a self-join on the group key (the quadratic blow-up the reference
  documents at s2polyline_alignment.h:176-180 — group size is the skew
  knob); per-id summed costs fold map-side, and the argmin-by-(cost,
  ord) is one aggregation — the reference's lowest-index tie-break
  (s2polyline_alignment.cc:352-372) rides the same sort key.
- ``consensus_per_group``: DBA iterations are sequential over a whole
  group, so the group IS the task: groupBy(group).applyInPandas runs
  the kernel consensus; parallel across groups, one shuffle total.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VERT_COLS = ("polyline_id", "vertex_idx", "x", "y", "z")


def _pairs_with_vertices(vertices: DataFrame, pairs: DataFrame) -> DataFrame:
    """Co-locate both operands of every pair under one pair_id key:
    two equi joins + union, each vertex row tagged with its side."""
    a = pairs.join(
        vertices, pairs.id_a == vertices.polyline_id
    ).select("pair_id", F.lit(0).alias("side"), "vertex_idx", "x", "y", "z")
    b = pairs.join(
        vertices, pairs.id_b == vertices.polyline_id
    ).select("pair_id", F.lit(1).alias("side"), "vertex_idx", "x", "y", "z")
    return a.unionByName(b)


def alignment_cost_pairs(
    vertices: DataFrame, pairs: DataFrame, approx: bool = False
) -> DataFrame:
    """Per-pair vertex-alignment cost: (pair_id, cost).

    vertices: (polyline_id, vertex_idx, x, y, z); pairs: (pair_id,
    id_a, id_b).  Exact mode runs the O(A·B) DP, approx the FastDTW
    window recursion — both per-pair inside one applyInPandas."""
    both = _pairs_with_vertices(vertices, pairs)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.alignment import approx_alignment, exact_alignment_cost

        pdf = pdf.sort_values(["side", "vertex_idx"])
        av = pdf[pdf["side"] == 0][["x", "y", "z"]].to_numpy(np.float64)
        bv = pdf[pdf["side"] == 1][["x", "y", "z"]].to_numpy(np.float64)
        cost = (
            approx_alignment(av, bv)[0]
            if approx
            else exact_alignment_cost(av, bv)
        )
        return pd.DataFrame({"pair_id": [key[0]], "cost": [cost]})

    return both.groupBy("pair_id").applyInPandas(
        run, "pair_id string, cost double"
    )


def group_pairs(polylines: DataFrame) -> DataFrame:
    """All unordered within-group pairs (ord_a < ord_b) from a
    (grp, polyline_id, ord) table — the lower-triangle evaluation of
    GetMedoidPolyline (s2polyline_alignment.cc:355-370)."""
    l = polylines.select(
        "grp", F.col("polyline_id").alias("id_a"), F.col("ord").alias("ord_a")
    )
    r = polylines.select(
        "grp", F.col("polyline_id").alias("id_b"), F.col("ord").alias("ord_b")
    )
    return (
        l.join(r, "grp")
        .where(F.col("ord_a") < F.col("ord_b"))
        .withColumn(
            "pair_id",
            F.concat_ws("|", "grp", F.col("ord_a").cast("string"),
                        F.col("ord_b").cast("string")),
        )
    )


def medoid_per_group(
    vertices: DataFrame, polylines: DataFrame, approx: bool = False
) -> DataFrame:
    """Per-group medoid: (grp, medoid_ord).  Summed pair costs are
    mirrored across the diagonal (cost(i,j) charges both i and j); the
    argmin tie-breaks on the lowest ord, matching the reference
    contract (s2polyline_alignment.h:171-173)."""
    pairs = group_pairs(polylines)
    costs = alignment_cost_pairs(vertices, pairs.select("pair_id", "id_a", "id_b"))
    per_pair = pairs.select("pair_id", "grp", "ord_a", "ord_b").join(
        costs, "pair_id"
    )
    charged = per_pair.select(
        "grp", F.col("ord_a").alias("ord"), "cost"
    ).unionByName(per_pair.select("grp", F.col("ord_b").alias("ord"), "cost"))
    totals = charged.groupBy("grp", "ord").agg(F.sum("cost").alias("total"))
    best = totals.groupBy("grp").agg(
        F.min(F.struct("total", "ord")).alias("_m")
    )
    return best.select("grp", F.col("_m.ord").alias("medoid_ord"))


def consensus_per_group(
    vertices_with_group: DataFrame,
    approx: bool = False,
    seed_medoid: bool = False,
    iteration_cap: int = 5,
) -> DataFrame:
    """Per-group DBA consensus polyline: (grp, vertex_idx, x, y, z).

    vertices_with_group: (grp, polyline_id, ord, vertex_idx, x, y, z).
    The whole group lands in one task (DBA iterations are inherently
    sequential within a group); millions of groups run in parallel."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.alignment import consensus_polyline

        lines = [
            g.sort_values("vertex_idx")[["x", "y", "z"]].to_numpy(np.float64)
            for _, g in sorted(pdf.groupby("ord"), key=lambda kv: kv[0])
        ]
        out = consensus_polyline(
            lines, approx=approx, seed_medoid=seed_medoid,
            iteration_cap=iteration_cap,
        )
        return pd.DataFrame(
            {
                "grp": key[0],
                "vertex_idx": np.arange(len(out)),
                "x": out[:, 0],
                "y": out[:, 1],
                "z": out[:, 2],
            }
        )

    return vertices_with_group.groupBy("grp").applyInPandas(
        run, "grp string, vertex_idx int, x double, y double, z double"
    )
