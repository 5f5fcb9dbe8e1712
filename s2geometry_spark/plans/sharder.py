"""S2RegionSharder analog (s2region_sharder.h:29-72): assign each region
(covering) to the shard whose cell partition it overlaps most.

The shard map comes from an equal-weight density partitioning
(S2DensityTree::GetPartitioning analog): sort the level-L histogram by
cell id (Hilbert order = spatial locality) and cut into ≈equal-weight
contiguous ranges — each shard is a cell-id range, so shard assignment
of any cell is a range lookup and the "most-intersecting shard" of a
covering is a weighted groupBy.
"""

from __future__ import annotations

import bisect

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import columns as CC
from ..kernel.cid import CID


def equal_weight_ranges(
    density: DataFrame, level: int, n_shards: int
) -> list[tuple[int, int, int]]:
    """(shard_id, range_start_s, range_end_s) cuts of Hilbert space with
    ≈equal point weight, from the level-L density histogram."""
    rows = sorted(
        density.filter(F.col("level") == level)
        .select("cell_id_s", "weight")
        .collect(),
        key=lambda r: r.cell_id_s,
    )
    total = sum(r.weight for r in rows)
    per_shard = max(1, total // n_shards)
    shards = []
    acc = 0
    start = -(1 << 63)
    sid = 0
    for r in rows:
        acc += r.weight
        if acc >= per_shard and sid < n_shards - 1:
            end = CID(r.cell_id_s + (1 << 63)).range_max().id - (1 << 63)
            shards.append((sid, start, end))
            start = end + 1
            acc = 0
            sid += 1
    shards.append((sid, start, (1 << 63) - 1))
    return shards


def shard_of_cells(shards: list[tuple[int, int, int]], cells_s: list[int]) -> list[int]:
    """Range lookup: shard id for each biased cell id (by range_min)."""
    starts = [s[1] for s in shards]
    out = []
    for c in cells_s:
        i = bisect.bisect_right(starts, c) - 1
        out.append(shards[max(0, i)][0])
    return out


def most_intersecting_shard(
    spark: SparkSession,
    shards: list[tuple[int, int, int]],
    coverings: DataFrame,
) -> DataFrame:
    """region covering rows (region_id, cell_id_s) → (region_id, shard_id)
    by maximum overlapping leaf weight — broadcast range join + argmax."""
    shard_df = spark.createDataFrame(
        shards, "shard_id int, start_s long, end_s long"
    )
    c = coverings.select(
        "region_id",
        CC.range_min("cell_id_s").alias("_lo"),
        CC.range_max("cell_id_s").alias("_hi"),
    )
    j = c.join(
        F.broadcast(shard_df),
        (F.col("_lo") <= F.col("end_s")) & (F.col("_hi") >= F.col("start_s")),
        "inner",
    )
    overlap = (
        F.least(F.col("_hi"), F.col("end_s"))
        - F.greatest(F.col("_lo"), F.col("start_s"))
        + F.lit(1)
    )
    w = j.groupBy("region_id", "shard_id").agg(F.sum(overlap).alias("w"))
    from pyspark.sql import Window

    win = Window.partitionBy("region_id").orderBy(
        F.col("w").desc(), F.col("shard_id").asc()
    )
    return (
        w.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select("region_id", "shard_id")
    )
