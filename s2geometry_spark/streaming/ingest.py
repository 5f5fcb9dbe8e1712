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


SESSION_OUT_SCHEMA = (
    "cell_id_s long, session_start timestamp, session_end timestamp,"
    " n_mentions long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"


def sessionize_cells(
    indexed_stream: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-cell
    activity sessions — consecutive mentions in one cell separated by
    less than `gap_minutes` form a session; a session is emitted when a
    later event (or the event-time timeout) closes it.  This is the
    session-window pattern the reference has no analog for; state is one
    (start, last, n) triple per cell, so memory is O(active cells)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes * 60 * 1_000_000)

    def fn(key, pdf_iter, state: GroupState):
        cell = key[0]
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                closed.append((cell, s, last, n))
                state.remove()
        else:
            ts = []
            for pdf in pdf_iter:
                ts.extend(
                    int(v.value) // 1000  # ns → µs
                    for v in pd.to_datetime(pdf["warc_ts"])
                )
            ts.sort()
            # interval merge of (new events ∪ the open session): late
            # within-watermark events older than session_start must not
            # be absorbed into the open session (they may extend it
            # backwards, or form a separate earlier session) — matching
            # session_window's merge semantics for out-of-order input
            intervals = [(t, t, 1) for t in ts]
            if state.exists:
                intervals.append(tuple(state.get))
            intervals.sort(key=lambda v: (v[0], v[1]))
            merged: list[tuple[int, int, int]] = []
            for s, last, n in intervals:
                if merged and s - merged[-1][1] <= gap_us:
                    ps, plast, pn = merged[-1]
                    merged[-1] = (min(ps, s), max(plast, last), pn + n)
                else:
                    merged.append((s, last, n))
            for s, last, n in merged[:-1]:
                closed.append((cell, s, last, n))
            if merged:
                s, last, n = merged[-1]
                state.update((s, last, n))
                state.setTimeoutTimestamp((last + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "cell_id_s": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_mentions": [c[3] for c in closed],
                }
            )

    return (
        indexed_stream.withWatermark("warc_ts", watermark)
        .groupBy("cell_id_s")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
