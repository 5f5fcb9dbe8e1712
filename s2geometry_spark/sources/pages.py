"""Deterministic synthetic Common-Crawl-style pages (north-rule input).

Schema per BASELINE.json input_hint / FIXTURES.md §1:
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Every byte of ``text`` is a pure function of ``url`` (the per-row
invariant): all randomness is ``xxhash64(id, k)`` on the page's numeric id
with fixed literal seeds, computed JVM-side, so regeneration at any scale
factor or partition count is byte-identical.

The geotag distribution is deliberately **skewed** (80% of mentions drawn
from 24 hotspot "cities", 20% uniform) so the spatial join exercises the
salted shuffle path exactly like city-vs-ocean skew at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "it", "pt", "nl", "pl"]

# 24 deterministic hotspot centers (lat, lng) — roughly "cities".
CITIES = [
    (40.71, -74.00), (51.51, -0.13), (35.68, 139.69), (48.86, 2.35),
    (-33.87, 151.21), (55.76, 37.62), (19.43, -99.13), (-23.55, -46.63),
    (39.90, 116.40), (28.61, 77.21), (30.04, 31.24), (6.52, 3.38),
    (34.05, -118.24), (41.88, -87.63), (52.52, 13.40), (37.57, 126.98),
    (1.35, 103.82), (-26.20, 28.05), (59.33, 18.07), (45.42, -75.70),
    (47.37, 8.54), (-34.60, -58.38), (31.23, 121.47), (25.20, 55.27),
]

_FILLER = (
    "the quick brown fox jumps over the lazy dog while crawling the web "
    "for pages mentioning places and coordinates in plain text "
)


def _mention_expr(k: int) -> F.Column:
    """Deterministic GEO(lat,lng) marker #k for a page id, JVM-side only.

    h1 picks hotspot-vs-uniform (80/20); hotspot mentions jitter ±0.5° around
    a city center; uniform mentions cover lat∈[-88,88], lng∈[-180,180).
    Values are formatted to fixed 6 decimals so extraction is byte-stable.
    """
    id_ = F.col("id")
    h1 = F.abs(F.xxhash64(id_, F.lit(k), F.lit(1)))
    h2 = F.abs(F.xxhash64(id_, F.lit(k), F.lit(2)))
    h3 = F.abs(F.xxhash64(id_, F.lit(k), F.lit(3)))
    h4 = F.abs(F.xxhash64(id_, F.lit(k), F.lit(4)))

    city_idx = (h2 % len(CITIES)).cast("int")
    city_lat = F.element_at(
        F.array(*[F.lit(c[0]) for c in CITIES]), city_idx + 1
    )
    city_lng = F.element_at(
        F.array(*[F.lit(c[1]) for c in CITIES]), city_idx + 1
    )
    jit_lat = (h3 % 1000000) / 1000000.0 - 0.5
    jit_lng = (h4 % 1000000) / 1000000.0 - 0.5

    uni_lat = (h3 % 17600000) / 100000.0 - 88.0
    uni_lng = (h4 % 36000000) / 100000.0 - 180.0

    is_city = (h1 % 10) < 8
    lat = F.when(is_city, city_lat + jit_lat).otherwise(uni_lat)
    lng = F.when(is_city, city_lng + jit_lng).otherwise(uni_lng)
    return F.format_string("GEO(%.6f,%.6f)", lat, lng)


def synthesize_pages(
    spark: SparkSession, n_pages: int, partitions: int = 32
) -> DataFrame:
    """Build the pages table for `n_pages` ids, deterministic per id."""
    df = spark.range(0, n_pages, 1, partitions)
    n_mentions = (F.abs(F.xxhash64(F.col("id"), F.lit(0))) % 3 + 1).cast("int")
    # text: filler + up to 3 GEO markers gated by n_mentions
    pieces = [F.format_string("Page %d. ", F.col("id")), F.lit(_FILLER)]
    for k in range(3):
        pieces.append(
            F.when(F.lit(k) < n_mentions, F.concat(_mention_expr(k), F.lit(" ")))
            .otherwise(F.lit(""))
        )
    pieces.append(F.lit(_FILLER))
    text = F.concat(*pieces)
    return df.select(
        F.format_string("https://example.org/p/%d", F.col("id")).alias("url"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(
            secs=(F.col("id") % 86400).cast("double")
        )).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html>"), text, F.lit("</html>")), "UTF-8").alias("html"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(l) for l in LANGS]),
            (F.abs(F.xxhash64(F.col("id"), F.lit(9))) % len(LANGS)).cast("int") + 1,
        ).alias("lang"),
    )


_GEO_RE = r"GEO\(([-0-9.]+),([-0-9.]+)\)"


def extract_mentions(pages: DataFrame) -> DataFrame:
    """pages → mentions(url, mention_idx, lat, lng); byte-stable extraction.

    Pure JVM regex (regexp_extract_all + posexplode) — no Python in the path.
    """
    return (
        pages.select(
            "url",
            F.posexplode(
                F.regexp_extract_all("text", F.lit(_GEO_RE), 0)
            ).alias("mention_idx", "geo"),
        )
        .select(
            "url",
            "mention_idx",
            F.regexp_extract("geo", _GEO_RE, 1).cast("double").alias("lat"),
            F.regexp_extract("geo", _GEO_RE, 2).cast("double").alias("lng"),
        )
    )
