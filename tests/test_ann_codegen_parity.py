"""The size-gated codegen plans of the ANN paths must be bit-identical
to the interpreted-HOF plans (same left folds, unrolled): the gate
(`similarity._want_codegen`) picks a PLAN, never a result.

Mirrors the minhash size-gated pair-plan parity test: run each operator
with codegen forced on and forced off over the same input and require
identical row sets (cosine values compared exactly — both plans must
produce the same doubles before rounding for the oracle hash to hold at
any scale).
"""

import pytest

from s2geometry_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    ann_pq_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("query_id", "cand_id", "cosine", "rank").collect()
    )


def test_lsh_codegen_parity(emb):
    slow = _rows(ann_lsh_topk(emb, n_queries=10, k=5, bits=6, codegen=False))
    fast = _rows(ann_lsh_topk(emb, n_queries=10, k=5, bits=6, codegen=True))
    assert slow == fast
    assert len(slow) == 50


def test_ivf_codegen_parity(emb):
    slow = _rows(
        ann_ivf_topk(emb, n_queries=10, k=5, n_centroids=8, nprobe=2, codegen=False)
    )
    fast = _rows(
        ann_ivf_topk(emb, n_queries=10, k=5, n_centroids=8, nprobe=2, codegen=True)
    )
    assert slow == fast
    assert len(slow) == 50


def test_pq_codegen_parity(emb):
    slow = _rows(
        ann_pq_topk(
            emb, n_queries=10, k=5, n_codewords=8, m_subspaces=4, codegen=False
        )
    )
    fast = _rows(
        ann_pq_topk(
            emb, n_queries=10, k=5, n_codewords=8, m_subspaces=4, codegen=True
        )
    )
    assert slow == fast
    assert len(slow) == 50


def test_gate_reads_scan_size(emb):
    from s2geometry_spark.operators.similarity import _want_codegen

    # the sf0.01 fixture scan is far below the 32 MB gate
    assert _want_codegen(emb) is False
