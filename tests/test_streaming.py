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


def test_stream_dedup_drops_planted_duplicates(spark, tmp_path):
    """dedup_pages_stream keeps exactly one row per content hash and its
    hash set equals the batch distinct set; the planted re-crawls (same
    text, new url, later warc_ts) are dropped."""
    from s2geometry_spark.streaming.dedup import dedup_pages_stream

    src = str(tmp_path / "pages_dup_src")
    ckpt = str(tmp_path / "dedup_ckpt")
    pages = synthesize_pages(spark, 300, partitions=4)
    dups = (
        pages.limit(100)
        .withColumn("url", F.concat(F.col("url"), F.lit("#recrawl")))
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    pages.unionByName(dups).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = dedup_pages_stream(stream, watermark="2 hours")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("deduped_pages")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select content_hash, count(*) as n from deduped_pages group by 1"
    ).collect()
    want = {
        r.h
        for r in spark.read.parquet(src)
        .select(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
        .distinct()
        .collect()
    }
    assert {r.content_hash for r in got} == want
    assert all(r.n == 1 for r in got)
    assert len(got) == 300  # the 100 re-crawls deduped away


def test_stream_duplicate_rate_matches_batch(spark, tmp_path):
    """The windowed ingest-quality metric equals the batch aggregate with
    the same expressions (approx_count_distinct's HLL is deterministic
    for identical input)."""
    from s2geometry_spark.streaming.dedup import duplicate_rate_stream

    src = str(tmp_path / "pages_rate_src")
    ckpt = str(tmp_path / "rate_ckpt")
    pages = synthesize_pages(spark, 300, partitions=4)
    dups = pages.limit(60).withColumn(
        "url", F.concat(F.col("url"), F.lit("#recrawl"))
    )
    pages.unionByName(dups).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    rate = duplicate_rate_stream(stream, window="1 hour", watermark="2 hours")
    q = (
        rate.writeStream.outputMode("complete")
        .format("memory")
        .queryName("dup_rate")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.w_start, r.n_pages, r.n_distinct_approx)
        for r in spark.sql("select * from dup_rate").collect()
    }
    want_rows = (
        spark.read.parquet(src)
        .withColumn("content_hash", F.sha2(F.col("text").cast("binary"), 256))
        .groupBy(F.window("warc_ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_pages"),
            F.approx_count_distinct("content_hash").alias("n_distinct_approx"),
        )
        .select(F.col("w.start").alias("w_start"), "n_pages", "n_distinct_approx")
        .collect()
    )
    want = {(r.w_start, r.n_pages, r.n_distinct_approx) for r in want_rows}
    assert got == want and sum(r[1] for r in got) == 360


def test_stream_pip_enrichment_matches_batch_flagship(spark, tmp_path):
    """The streaming spatial enrichment runs the batch flagship operator
    unchanged (stream-static broadcast join + Arrow PIP filter) and must
    produce exactly the batch join's rows; the windowed per-polygon
    rollup must equal the batch aggregate."""
    from s2geometry_spark.kernel.contains import parse_polygon
    from s2geometry_spark.operators.indexing import index_points
    from s2geometry_spark.operators.spatial_join import point_in_polygon_join
    from s2geometry_spark.sources.pages import extract_mentions
    from s2geometry_spark.streaming.enrich import (
        enrich_mentions_stream,
        polygon_mention_counts_stream,
    )

    polygons = [
        ("nyc", parse_polygon("40.2:-74.5, 40.2:-73.5, 41.2:-73.5, 41.2:-74.5")),
        ("london", parse_polygon("51.0:-0.7, 51.0:0.4, 52.0:0.4, 52.0:-0.7")),
        ("tokyo_w_hole", parse_polygon(
            "35.1:139.2, 35.1:140.2, 36.2:140.2, 36.2:139.2;"
            "35.5:139.5, 35.5:139.9, 35.9:139.9, 35.9:139.5"
        )),
    ]
    src = str(tmp_path / "pages_pip_src")
    pages = synthesize_pages(spark, 500, partitions=4)
    pages.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    enriched = enrich_mentions_stream(stream, polygons)
    q1 = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched_mentions")
        .option("checkpointLocation", str(tmp_path / "pip_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(180)
    got = {
        (r.url, r.mention_idx, r.polygon_id)
        for r in spark.sql(
            "select url, mention_idx, polygon_id from enriched_mentions"
        ).collect()
    }
    batch_pts = index_points(extract_mentions(pages), level=30)
    want_df = point_in_polygon_join(batch_pts, polygons)
    want = {
        (r.url, r.mention_idx, r.polygon_id)
        for r in want_df.select("url", "mention_idx", "polygon_id").collect()
    }
    assert got == want and len(got) > 0

    # windowed rollup: re-stream through the aggregate and compare
    counts = polygon_mention_counts_stream(
        enrich_mentions_stream(
            spark.readStream.schema(spark.read.parquet(src).schema).parquet(src),
            polygons,
        )
    )
    q2 = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("polygon_counts")
        .option("checkpointLocation", str(tmp_path / "cnt_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    got_counts = {
        (r.w_start, r.polygon_id): r.n_mentions
        for r in spark.sql("select * from polygon_counts").collect()
    }
    want_rows = (
        want_df.join(pages.select("url", "warc_ts"), "url")
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "polygon_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "polygon_id", "n")
        .collect()
    )
    want_counts = {(r.w_start, r.polygon_id): r.n for r in want_rows}
    assert got_counts == want_counts
