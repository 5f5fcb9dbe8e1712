"""Point indexing: mentions → S2 cells (the ingest path, SURVEY.md §3.1).

The Spark analog of S2PointIndex (s2point_index.h:44-58): a DataFrame of
(url, mention_idx, x, y, z, cell_id_s [, cell_token]) laid out by
``repartitionByRange(cell_id_s)`` + ``sortWithinPartitions`` so Parquet
min/max stats line up with Hilbert locality and range joins merge without
re-shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as CC
from ..functions.udfs import s2_cell_from_latlng, s2_latlng_to_xyz


def index_points(
    mentions: DataFrame,
    level: int = 30,
    with_xyz: bool = False,
    with_token: bool = False,
) -> DataFrame:
    """mentions(lat,lng,…) → points with biased cell ids at `level`.

    One Arrow-batched pUDF for the leaf id (s2cell_id.cc:309-317 pipeline),
    then a pure-JVM parent() to the storage level — the only Python work is
    the trig + Hilbert encode, everything else stays in codegen.
    """
    leaf = s2_cell_from_latlng(F.col("lat"), F.col("lng"))
    cell = leaf if level >= 30 else CC.parent(leaf, level)
    out = mentions.withColumn("cell_id_s", cell)
    if with_xyz:
        out = out.withColumn("_p", s2_latlng_to_xyz(F.col("lat"), F.col("lng"))).select(
            "*", "_p.x", "_p.y", "_p.z"
        ).drop("_p")
    if with_token:
        out = out.withColumn("cell_token", CC.token("cell_id_s"))
    return out


def layout_by_cell(points: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Hilbert-locality layout: range partition + sort on cell_id_s.

    This is the DataFrame analog of the reference's btree point index —
    equal cell ranges land in equal partitions, Parquet row-group stats
    become partition-pruning predicates, and sort-merge joins on cell
    ranges need no extra shuffle.
    """
    if num_partitions:
        parted = points.repartitionByRange(num_partitions, "cell_id_s")
    else:
        parted = points.repartitionByRange("cell_id_s")
    return parted.sortWithinPartitions("cell_id_s")


def cell_histogram(points: DataFrame, level: int) -> DataFrame:
    """Mentions per cell at `level` — partial+final agg, one shuffle."""
    return (
        points.groupBy(CC.parent("cell_id_s", level).alias("cell_id_s"))
        .agg(F.count("*").alias("n_points"))
    )
