"""Text-analysis operators for training-data pipelines over `documents`.

All pure JVM Column expressions (whole-stage codegen; no Python in the
data path) so they scale linearly and every one has an exact DuckDB
oracle in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def with_tokens(df: DataFrame) -> DataFrame:
    """Whitespace tokenization + counts."""
    words = F.split(F.col("text"), " ")
    return df.withColumn("n_tokens", F.size(words)).withColumn(
        "n_distinct_tokens", F.size(F.array_distinct(words))
    )


def token_stats(df: DataFrame) -> DataFrame:
    """Per-document token statistics (exact-SQL oracle)."""
    words = F.split(F.col("text"), " ")
    return df.select(
        "doc_id",
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars_computed"),
        (F.length("text") / F.size(words)).alias("avg_token_len"),
    )


def quality_score(df: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristics."""
    words = F.split(F.col("text"), " ")
    n_tokens = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), stop_arr))
    n_punct = F.length(F.regexp_replace(F.col("text"), "[^.,;:!?]", ""))
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopword_types"),
        n_punct.alias("n_punct"),
        (n_punct / F.length("text")).alias("punct_ratio"),
        (
            (n_tokens >= 10)
            & (n_punct / F.length("text") < 0.1)
        ).cast("int").alias("is_quality"),
    )


def lang_id(df: DataFrame) -> DataFrame:
    """Stopword-marker language ID: count marker-token OCCURRENCES per
    language; argmax with fixed tie order en>de>fr>es>zh."""
    words = F.split(F.col("text"), " ")
    scores = []
    for lang in ["en", "de", "fr", "es", "zh"]:
        markers = LANG_MARKERS[lang]
        cnt = F.size(
            F.filter(words, lambda w: w.isin(*markers))  # noqa: B023
        )
        scores.append(cnt.alias(f"score_{lang}"))
    scored = df.select("doc_id", F.col("lang").alias("lang_true"), *scores)
    best = F.greatest(*[F.col(f"score_{l}") for l in LANG_MARKERS])
    pred = (
        F.when(F.col("score_en") == best, "en")
        .when(F.col("score_de") == best, "de")
        .when(F.col("score_fr") == best, "fr")
        .when(F.col("score_es") == best, "es")
        .otherwise("zh")
    )
    return scored.select("doc_id", "lang_true", pred.alias("lang_pred"))


def fingerprint(df: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    + a content prefix key (md5 of the first 8 tokens) for clustering."""
    norm = F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")
    words = F.split(norm, " ")
    prefix = F.concat_ws(" ", F.slice(words, 1, 8))
    return df.select(
        "doc_id",
        F.md5(norm).alias("fp_full"),
        F.md5(prefix).alias("fp_prefix"),
    )
