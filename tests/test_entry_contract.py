"""Mimics the driver's correctness gate: run each __spark_entry__ query
on Spark and its DuckDB oracle on the same parquet, compare row count,
column names, and order-insensitive values."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(9)
        elif "datetime" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        elif np.issubdtype(pdf[c].dtype, np.integer):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["polygon_id", "tile8_s", "n_mentions"]
    assert len(rows) > 0


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = E.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    want = duck.execute(E.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {got.columns} vs {want.columns}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    g = _canon(got)
    w = _canon(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=1e-9)


@pytest.mark.parametrize(
    "name", sorted(set(E.queries().keys()) - set(E.oracle_sql().keys()))
)
def test_rows_only_queries_run(spark, name):
    df = E.queries()[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    if name in ("geo_mentions_per_cell", "geo_pip_join", "geo_knn",
                "geo_polygon_covering", "multimodal_features"):
        assert n > 0, name
