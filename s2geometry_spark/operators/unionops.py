"""S2CellUnion set algebra over DataFrames — the engine's primary
geometric set-op layer (SURVEY.md §2.6; s2cell_union.cc:171-448).

Representation: exploded rows ``(region_id, cell_id_s)`` per union.
 - normalization runs as an ``applyInPandas`` group kernel (each
   region's array through the exact kernel port — regions are small,
   regions-per-table is the scale axis);
 - containment/intersection joins are pure-JVM range predicates on the
   biased ids (signed order == unsigned cell order);
 - difference/union compose the two.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as CC
from ..kernel import cellunion as CU
from ..kernel.cid import CID

_SCHEMA = "region_id string, cell_id_s long"


def _to_cids(arr) -> list[CID]:
    return [CID(int(v) + (1 << 63)) for v in arr]


def _to_biased(cids: list[CID]) -> list[int]:
    return [c.id - (1 << 63) for c in cids]


def normalize_unions(df: DataFrame) -> DataFrame:
    """Per-region Normalize (sort, dedupe, 4-sibling collapse)."""

    def norm(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = CU.normalize(_to_cids(pdf.cell_id_s))
        return pd.DataFrame({"region_id": key[0], "cell_id_s": _to_biased(out)})

    return df.groupBy("region_id").applyInPandas(norm, _SCHEMA)


def denormalize_unions(df: DataFrame, min_level: int, level_mod: int = 1) -> DataFrame:
    def denorm(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = CU.denormalize(
            CU.normalize(_to_cids(pdf.cell_id_s)), min_level, level_mod
        )
        return pd.DataFrame({"region_id": key[0], "cell_id_s": _to_biased(out)})

    return df.groupBy("region_id").applyInPandas(denorm, _SCHEMA)


def union_unions(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union = concat + Normalize (s2cell_union.cc:366-371)."""
    return normalize_unions(a.unionByName(b))


def intersect_unions(a: DataFrame, b: DataFrame) -> DataFrame:
    """Intersection of normalized unions, as two range semi-joins:
    cells of a contained in b ∪ cells of b contained in a (two cells of
    normalized unions either nest or are disjoint).  Pure JVM."""
    a_in_b = a.alias("x").join(
        b.alias("y"),
        (F.col("x.region_id") == F.col("y.region_id"))
        & CC.contains(F.col("y.cell_id_s"), F.col("x.cell_id_s")),
        "left_semi",
    )
    b_in_a = b.alias("x").join(
        a.alias("y"),
        (F.col("x.region_id") == F.col("y.region_id"))
        & CC.contains(F.col("y.cell_id_s"), F.col("x.cell_id_s")),
        "left_semi",
    )
    return a_in_b.unionByName(b_in_a).distinct()


def subtract_unions(a: DataFrame, b: DataFrame) -> DataFrame:
    """Difference a \\ b via cogrouped exact kernel (recursive subdivide,
    s2cell_union.cc:424-448)."""

    def diff(key, pdf_a: pd.DataFrame, pdf_b: pd.DataFrame) -> pd.DataFrame:
        out = CU.difference(_to_cids(pdf_a.cell_id_s), _to_cids(pdf_b.cell_id_s))
        return pd.DataFrame({"region_id": key[0], "cell_id_s": _to_biased(out)})

    return (
        a.groupBy("region_id")
        .cogroup(b.groupBy("region_id"))
        .applyInPandas(diff, _SCHEMA)
    )


def contains_points_join(unions: DataFrame, points: DataFrame) -> DataFrame:
    """points(cell_id_s leaf) semi-joined into each region they fall in —
    a pure-JVM range containment join (broadcast the union side)."""
    u = unions.select(
        "region_id",
        CC.range_min("cell_id_s").alias("_rmin"),
        CC.range_max("cell_id_s").alias("_rmax"),
    )
    return points.join(
        F.broadcast(u),
        (points["cell_id_s"] >= u["_rmin"]) & (points["cell_id_s"] <= u["_rmax"]),
        "inner",
    ).drop("_rmin", "_rmax")
