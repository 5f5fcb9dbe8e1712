"""Streaming exact deduplication over the pages stream.

The batch dedup family (operators/dedup.py) answers "which documents in
the lake are duplicates"; an ingest pipeline also needs the incremental
question — "is this arriving page a repeat of something already seen?" —
answered without re-scanning the lake.  This module is that operator:
content-hash the stream and keep the first arrival per hash, with state
bounded by the event-time watermark.

Scale shape (the 100-TB contract): state is one 32-byte digest per
DISTINCT document inside the watermark horizon, hash-partitioned across
executors by Spark's streaming-dedup state store — no shuffle of the
page payload beyond the one keyed exchange, no Python in the plan.  A
longer horizon trades state size for dedup recall against older
repeats; the lake-wide guarantee stays with the batch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_pages_stream(
    pages_stream: DataFrame,
    watermark: str = "2 hours",
    text_col: str = "text",
) -> DataFrame:
    """First-arrival-wins exact dedup on sha256(text).

    Uses dropDuplicatesWithinWatermark so the state store evicts hashes
    once the watermark passes them (bounded state — plain dropDuplicates
    on a stream retains every key forever).  Within one micro-batch the
    surviving ROW per hash is arrival-order dependent; the guaranteed
    invariants are (a) exactly one output row per content hash and
    (b) the output hash set equals the batch-distinct hash set — the
    properties the matching test pins.
    """
    keyed = pages_stream.withColumn(
        "content_hash", F.sha2(F.col(text_col).cast("binary"), 256)
    )
    return keyed.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def duplicate_rate_stream(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    text_col: str = "text",
) -> DataFrame:
    """Per-event-time-window ingest quality metric: pages seen vs
    distinct contents seen (count + approx_count_distinct — the sketch
    keeps the aggregate mergeable and O(1) per window at any scale)."""
    keyed = pages_stream.withColumn(
        "content_hash", F.sha2(F.col(text_col).cast("binary"), 256)
    )
    return (
        keyed.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_pages"),
            F.approx_count_distinct("content_hash").alias("n_distinct_approx"),
        )
        .select(F.col("w.start").alias("w_start"), "n_pages", "n_distinct_approx")
    )
