"""S2CellIndex analog (s2cell_index.h:33-100): a (cell, label) table
queried by "which labels intersect this cell" — as pure-JVM range joins.

The reference compiles (cell,label) pairs into disjoint leaf ranges for
iterator efficiency; relationally the same semantics is an interval
join on [range_min, range_max] of the biased ids, which Spark executes
as a broadcast-nested-loop for small indexes or (after
repartitionByRange on the range start) as a sort-merge range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as CC


def build_cell_index(cells: DataFrame) -> DataFrame:
    """(label, cell_id_s) → (label, range_start_s, range_end_s)."""
    return cells.select(
        "label",
        CC.range_min("cell_id_s").alias("range_start_s"),
        CC.range_max("cell_id_s").alias("range_end_s"),
    )


def intersecting_labels(index: DataFrame, targets: DataFrame) -> DataFrame:
    """targets(target_id, cell_id_s) → distinct (target_id, label) whose
    indexed cells intersect the target cell (GetIntersectingLabels)."""
    t = targets.select(
        "target_id",
        CC.range_min("cell_id_s").alias("_tlo"),
        CC.range_max("cell_id_s").alias("_thi"),
    )
    j = t.join(
        F.broadcast(index),
        (F.col("_tlo") <= F.col("range_end_s"))
        & (F.col("_thi") >= F.col("range_start_s")),
        "inner",
    )
    return j.select("target_id", "label").distinct()


def contained_labels(index: DataFrame, targets: DataFrame) -> DataFrame:
    """Labels of indexed cells fully contained in the target cell."""
    t = targets.select(
        "target_id",
        CC.range_min("cell_id_s").alias("_tlo"),
        CC.range_max("cell_id_s").alias("_thi"),
    )
    j = t.join(
        F.broadcast(index),
        (F.col("range_start_s") >= F.col("_tlo"))
        & (F.col("range_end_s") <= F.col("_thi")),
        "inner",
    )
    return j.select("target_id", "label").distinct()
