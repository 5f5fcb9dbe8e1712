"""ANN quality: sign-LSH and IVF find planted near-duplicates; scores exact."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    ann_pq_topk,
    cosine_topk,
)


def test_lsh_finds_planted_near_duplicates(spark):
    base = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    pdf = base.toPandas()
    rng = np.random.default_rng(42)
    planted = []
    for i in range(10):
        src = np.array(pdf.embedding.iloc[100 + i], dtype=np.float32)
        noisy = src + rng.normal(0, 0.01, len(src)).astype(np.float32)
        planted.append((int(i), [float(x) for x in noisy], -1))
    q = spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    emb = q.unionByName(base.select("vec_id", "embedding", "label"))
    out = ann_lsh_topk(emb, n_queries=10, k=1, bits=6).collect()
    # with multi-probe (Hamming-1 shell) a planted pair separated by a
    # single hyperplane is still found: recall must be ≥ 0.95 here, and
    # the planted neighbors are near-identical (θ ≈ 0.01 rad), so all 10
    # should be found
    hits = {r.query_id: r.cand_id for r in out}
    found = sum(1 for i in range(10) if hits.get(i) == 100 + i)
    assert found == 10, hits
    # single-probe still finds the vast majority (regression guard for the
    # non-multiprobe path)
    single = ann_lsh_topk(emb, n_queries=10, k=1, bits=6, multiprobe=False).collect()
    hits1 = {r.query_id: r.cand_id for r in single}
    assert sum(1 for i in range(10) if hits1.get(i) == 100 + i) >= 9
    # and the LSH path's cosine scores equal the exact path's
    exact = {(r.query_id, r.cand_id): r.cosine
             for r in cosine_topk(emb, n_queries=10, k=3).collect()}
    for r in out:
        key = (r.query_id, r.cand_id)
        if key in exact:
            assert abs(r.cosine - exact[key]) < 1e-9


def test_ivf_finds_planted_near_duplicates(spark):
    base = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    pdf = base.toPandas()
    rng = np.random.default_rng(42)
    planted = []
    for i in range(10):
        src = np.array(pdf.embedding.iloc[100 + i], dtype=np.float32)
        noisy = src + rng.normal(0, 0.01, len(src)).astype(np.float32)
        planted.append((int(i), [float(x) for x in noisy], -1))
    q = spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    # drop the corpus rows whose ids the planted queries reuse so vec_id
    # stays a key (the codebook sample orders by md5(vec_id))
    emb = q.unionByName(
        base.select("vec_id", "embedding", "label").filter(F.col("vec_id") >= 10)
    )
    out = ann_ivf_topk(emb, n_queries=10, k=1, n_centroids=8, nprobe=2).collect()
    # a near-identical pair shares its nearest inverted list except when
    # the source sits exactly on a list boundary; nprobe=2 covers that
    hits = {r.query_id: r.cand_id for r in out}
    found = sum(1 for i in range(10) if hits.get(i) == 100 + i)
    assert found == 10, hits
    # IVF scores are exact cosines (same re-rank as the brute path)
    exact = {(r.query_id, r.cand_id): r.cosine
             for r in cosine_topk(emb, n_queries=10, k=5).collect()}
    for r in out:
        key = (r.query_id, r.cand_id)
        if key in exact:
            assert abs(r.cosine - exact[key]) < 1e-9


def test_ivf_plan_is_map_only_plus_topk_window(spark):
    """Assignment/probing ride expression literals (no shuffle, no
    Python UDF); the only hash exchange is the per-query top-k window;
    the probe join broadcasts the query side."""
    import re

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = ann_ivf_topk(emb, n_queries=10, k=5, n_centroids=8, nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_ivf_pudf_path_matches_expression_path(spark):
    """The large-C pandas path's d-ordered accumulation must reproduce
    the JVM fold bit-for-bit: identical assignments, probes, and
    therefore identical top-k rows."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = ann_ivf_topk(
        emb, n_queries=10, k=5, n_centroids=16, nprobe=3, plan="expr"
    ).collect()
    b = ann_ivf_topk(
        emb, n_queries=10, k=5, n_centroids=16, nprobe=3, plan="pudf"
    ).collect()
    rows_a = sorted((r.query_id, r.cand_id, r.cosine, r.rank) for r in a)
    rows_b = sorted((r.query_id, r.cand_id, r.cosine, r.rank) for r in b)
    assert rows_a == rows_b


def test_pq_finds_planted_near_duplicates(spark):
    """PQ ADC over 8x4 codes keeps a near-identical pair inside the
    top-r candidate set; the exact re-rank then scores it first."""
    base = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    pdf = base.toPandas()
    rng = np.random.default_rng(42)
    planted = []
    for i in range(10):
        src = np.array(pdf.embedding.iloc[100 + i], dtype=np.float32)
        noisy = src + rng.normal(0, 0.01, len(src)).astype(np.float32)
        planted.append((int(i), [float(x) for x in noisy], -1))
    q = spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    emb = q.unionByName(
        base.select("vec_id", "embedding", "label").filter(F.col("vec_id") >= 10)
    )
    out = ann_pq_topk(emb, n_queries=10, k=1, r_candidates=20).collect()
    hits = {r.query_id: r.cand_id for r in out}
    found = sum(1 for i in range(10) if hits.get(i) == 100 + i)
    assert found == 10, hits
    # PQ re-rank scores are exact cosines (same re-rank as the brute path)
    exact = {(r.query_id, r.cand_id): r.cosine
             for r in cosine_topk(emb, n_queries=10, k=5).collect()}
    for r in out:
        key = (r.query_id, r.cand_id)
        if key in exact:
            assert abs(r.cosine - exact[key]) < 1e-9


def test_pq_plan_is_map_only_plus_topk_windows(spark):
    """Encode + LUT ride expression literals (no Python); the candidate
    scan is a broadcast join of the query side against the coded corpus;
    both the ADC top-r and the re-rank top-k windows share ONE hash
    exchange on query_id (the corpus never shuffles twice)."""
    import re

    from s2geometry_spark.operators.similarity import ann_pq_topk as pq

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = pq(emb, n_queries=10, k=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_pq_degenerates_to_brute_force_when_r_covers_corpus(spark):
    """With r_candidates >= corpus size the ADC stage prunes nothing and
    the exact re-rank must reproduce brute-force cosine_topk row-for-row
    (rounded scores, ranks, tie-breaks).  With a tight r the per-query
    candidate count is bounded by r; on random vectors a coarse 8x4
    codebook is a weak approximation, so top-1 agreement is asserted
    only via the planted-near-dup test above."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    full = ann_pq_topk(emb, n_queries=10, k=5, r_candidates=600).collect()
    brute = cosine_topk(emb, n_queries=10, k=5).collect()
    rows_a = sorted((r.query_id, r.cand_id, r.cosine, r.rank) for r in full)
    rows_b = sorted((r.query_id, r.cand_id, r.cosine, r.rank) for r in brute)
    assert rows_a == rows_b
    tight = ann_pq_topk(emb, n_queries=10, k=5, r_candidates=7).collect()
    from collections import Counter
    per_q = Counter(r.query_id for r in tight)
    assert all(v <= 5 for v in per_q.values()) and len(per_q) == 10
