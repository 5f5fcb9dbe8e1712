"""Structured Streaming ingest: pages stream → mentions → cells → tiles.

The reference has no streaming (SURVEY.md §2.8) and the north rule's
resumability is batch-side (sources/checkpoint.py); this module covers
the incremental-ingest path a production lake needs anyway: a stream of
pages is parsed, indexed to S2 cells with the same Arrow kernels, and
aggregated into per-cell tumbling-window counts with a watermark for
late data.  Every transformation is identical to the batch operators —
one code path, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as CC
from ..functions.udfs import s2_cell_from_latlng
from ..sources.pages import _GEO_RE


def parse_pages_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming analog of sources.pages.extract_mentions (same regex)."""
    return (
        pages_stream.select(
            "url",
            "warc_ts",
            F.posexplode(
                F.regexp_extract_all("text", F.lit(_GEO_RE), 0)
            ).alias("mention_idx", "geo"),
        )
        .select(
            "url",
            "warc_ts",
            "mention_idx",
            F.regexp_extract("geo", _GEO_RE, 1).cast("double").alias("lat"),
            F.regexp_extract("geo", _GEO_RE, 2).cast("double").alias("lng"),
        )
    )


def index_stream(mentions_stream: DataFrame, level: int = 12) -> DataFrame:
    leaf = s2_cell_from_latlng(F.col("lat"), F.col("lng"))
    cell = leaf if level >= 30 else CC.parent(leaf, level)
    return mentions_stream.withColumn("cell_id_s", cell)


def windowed_cell_counts(
    indexed_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time windows on warc_ts with late-data watermark."""
    return (
        indexed_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("cell_id_s"))
        .agg(F.count("*").alias("n_mentions"))
        .select(F.col("w.start").alias("w_start"), "cell_id_s", "n_mentions")
    )
