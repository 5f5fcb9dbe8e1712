"""Structured Streaming ingest: file source → windowed cell counts."""

import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators.indexing import index_points
from s2geometry_spark.sources.pages import extract_mentions, synthesize_pages
from s2geometry_spark.streaming.ingest import (
    index_stream,
    parse_pages_stream,
    windowed_cell_counts,
)


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_parquet")
    ckpt = str(tmp_path / "ckpt")
    pages = synthesize_pages(spark, 300, partitions=4)
    pages.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    indexed = index_stream(parse_pages_stream(stream), level=8)
    counts = windowed_cell_counts(indexed, window="1 hour", watermark="2 hours")
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("cell_counts")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.w_start, r.cell_id_s): r.n_mentions
        for r in spark.sql("select * from cell_counts").collect()
    }
    # batch oracle with the same operators
    batch = index_points(extract_mentions(pages), level=8)
    pages_ts = pages.select("url", "warc_ts")
    want_rows = (
        batch.join(pages_ts, "url")
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "cell_id_s")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "cell_id_s", "n")
        .collect()
    )
    want = {(r.w_start, r.cell_id_s): r.n for r in want_rows}
    assert got == want
    assert sum(got.values()) > 0


def test_stateful_sessionization_matches_batch_session_window(spark, tmp_path):
    """applyInPandasWithState sessionizer == batch F.session_window for
    the sessions that are CLOSED within the stream (the per-cell last
    session stays open in state)."""
    import pandas as pd

    from s2geometry_spark.streaming.ingest import sessionize_cells

    src = str(tmp_path / "pages_src")
    ckpt = str(tmp_path / "sess_ckpt")
    pages = synthesize_pages(spark, 400, partitions=4)
    pages.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    indexed = index_stream(parse_pages_stream(stream), level=4)
    sessions = sessionize_cells(indexed, gap_minutes=0.25)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.cell_id_s, r.session_start, r.session_end, r.n_mentions)
        for r in spark.sql("select * from sessions").collect()
    }

    # batch oracle: native session_window aggregation with the same gap
    # (parse_pages_stream works on batch frames too and keeps warc_ts)
    batch = index_stream(parse_pages_stream(pages), level=4)
    agg = (
        batch.groupBy(
            F.col("cell_id_s"), F.session_window("warc_ts", "15 seconds").alias("w")
        )
        .agg(
            F.count("*").alias("n_mentions"),
            F.min("warc_ts").alias("s_start"),
            F.max("warc_ts").alias("s_end"),
        )
        .collect()
    )
    # drop each cell's LAST session (still open in streaming state)
    by_cell = {}
    for r in agg:
        by_cell.setdefault(r.cell_id_s, []).append(r)
    expected = set()
    for cell, rows in by_cell.items():
        rows.sort(key=lambda r: r.s_start)
        for r in rows[:-1]:
            expected.add((cell, r.s_start, r.s_end, r.n_mentions))
    assert expected, "fixture produced no closed sessions — widen the data"
    assert got == expected
