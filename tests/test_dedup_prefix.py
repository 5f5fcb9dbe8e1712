"""Prefix-filtering exact Jaccard join == brute-force global pairs."""

import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators.dedup import (
    ngram_jaccard_pairs_prefix,
    shingles,
)


@pytest.mark.parametrize("threshold", [0.15, 0.5])
def test_prefix_filter_equals_brute(spark, threshold):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(300)
    got = (
        ngram_jaccard_pairs_prefix(docs, threshold=threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 9).alias("j"))
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # brute force: full cross self-join (test scale only)
    sh = docs.select("doc_id", shingles().alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    uni = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    exp = (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter / uni).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 9).alias("j"))
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got.equals(exp)


def test_deterministic_sampling_stable_under_repartition(spark):
    from s2geometry_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = set(
        r.doc_id for r in deterministic_sample(docs, "doc_id", 0.3).collect()
    )
    b = set(
        r.doc_id
        for r in deterministic_sample(docs.repartition(17), "doc_id", 0.3).collect()
    )
    assert a == b and 0.2 < len(a) / docs.count() < 0.4
    # stratified rates land near their quotas per stratum
    s = stratified_sample(docs, "doc_id", "lang", {"en": 0.1, "de": 0.6}).groupBy(
        "lang"
    ).count().collect()
    rates = {r.lang: r["count"] for r in s}
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert set(rates) <= {"en", "de"}
    assert rates.get("de", 0) / totals["de"] > rates.get("en", 1) / totals["en"]


def test_minhash_carry_sig_path_equals_large_path(spark):
    """The size-gated small-corpus plan (signatures carried through the
    band join) must return exactly the same pair set + estimates as the
    100 TB plan (bare-key distinct + signature re-join)."""
    import pandas as pd

    from s2geometry_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    def norm(df):
        return (
            df.select("doc_a", "doc_b", F.round("est_jaccard", 9).alias("e"))
            .toPandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )

    small = norm(minhash_lsh_pairs(docs, n_docs=1))  # force carry-sig
    large = norm(minhash_lsh_pairs(docs, n_docs=10_000_000))  # force re-join
    pd.testing.assert_frame_equal(small, large)
