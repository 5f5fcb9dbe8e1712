"""Bit-parity of the codegen chord-distance expression vs the NumPy kernel.

The round-6 fast path of indexed_closest_edges_join computes
point-to-edge squared-chord distance as a whole-stage-codegen Column
(_dist2_expr).  Declared-query hashes depend on these doubles being
BIT-identical to kernel.distance.point_edge_dist2_rowwise, so this test
compares raw float64 bit patterns over a deterministic sample that
exercises every branch (interior / vertex, near-degenerate edges, points
on the edge plane).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.kernel.distance import point_edge_dist2_rowwise
from s2geometry_spark.operators.shape_index import _dist2_expr


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def cases():
    rng = np.random.RandomState(20260821)
    n = 5000
    X = _unit(rng.randn(n, 3))
    A = _unit(rng.randn(n, 3))
    # mix of edge scales: long random edges, tiny edges, near-degenerate
    B = np.empty_like(A)
    B[: n // 3] = _unit(rng.randn(n // 3, 3))
    m = (2 * n // 3) - (n // 3)
    B[n // 3 : 2 * n // 3] = _unit(
        A[n // 3 : 2 * n // 3] + 1e-6 * rng.randn(m, 3)
    )
    B[2 * n // 3 :] = _unit(A[2 * n // 3 :] + 1e-13 * rng.randn(n - 2 * n // 3, 3))
    # a slab of points very close to the edge interior (projections)
    mid = _unit(A[: n // 4] + B[: n // 4])
    X[: n // 4] = _unit(mid + 1e-9 * rng.randn(n // 4, 3))
    return X, A, B


def test_dist2_sql_bit_identical(spark, cases):
    X, A, B = cases
    pdf = pd.DataFrame(
        {
            "px": X[:, 0], "py": X[:, 1], "pz": X[:, 2],
            "ax": A[:, 0], "ay": A[:, 1], "az": A[:, 2],
            "bx": B[:, 0], "by": B[:, 1], "bz": B[:, 2],
            "row": np.arange(len(X)),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.withColumn(
            "d2",
            _dist2_expr(
                F.col("px"), F.col("py"), F.col("pz"),
                F.col("ax"), F.col("ay"), F.col("az"),
                F.col("bx"), F.col("by"), F.col("bz"),
            ),
        )
        .select("row", "d2")
        .toPandas()
        .sort_values("row")["d2"]
        .to_numpy()
    )
    want = point_edge_dist2_rowwise(X, A, B)
    assert np.array_equal(
        got.view(np.uint64), want.view(np.uint64)
    ), f"bit mismatch on {np.count_nonzero(got.view(np.uint64) != want.view(np.uint64))} rows"
