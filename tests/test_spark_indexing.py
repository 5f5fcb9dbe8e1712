"""End-to-end Spark tests: pages → mentions → cell index → histogram.

Cross-checks the JVM column algebra (functions/columns.py) and the Arrow
UDFs against the NumPy kernel on the same rows.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.functions import columns as CC
from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.operators.indexing import cell_histogram, index_points
from s2geometry_spark.sources.pages import extract_mentions, synthesize_pages

N_PAGES = 500


@pytest.fixture(scope="module")
def mentions(spark):
    pages = synthesize_pages(spark, N_PAGES, partitions=4)
    return extract_mentions(pages).cache()


def test_pages_deterministic(spark):
    a = synthesize_pages(spark, 50, partitions=2).orderBy("url").collect()
    b = synthesize_pages(spark, 50, partitions=7).orderBy("url").collect()
    assert [r.text for r in a] == [r.text for r in b]
    assert [bytes(r.html) for r in a] == [bytes(r.html) for r in b]
    # per-row invariant: text is a pure function of url
    assert all(r.html == b"<html>" + r.text.encode() + b"</html>" for r in a)


def test_mention_extraction_counts(spark, mentions):
    rows = mentions.groupBy("url").count().collect()
    assert len(rows) == N_PAGES  # every page has ≥1 mention
    assert all(1 <= r["count"] <= 3 for r in rows)
    dom = mentions.agg(
        F.min("lat"), F.max("lat"), F.min("lng"), F.max("lng")
    ).first()
    assert -90 < dom[0] and dom[1] < 90 and -180.5 < dom[2] and dom[3] < 180.5


def test_index_points_matches_kernel(spark, mentions):
    pts = index_points(mentions, level=30, with_token=True)
    pdf = pts.toPandas()
    ids = K.unbias(pdf.cell_id_s.to_numpy(np.int64))
    expect = K.from_latlng(pdf.lat.to_numpy(), pdf.lng.to_numpy())
    assert (ids == expect).all()
    assert pdf.cell_token.tolist() == K.to_token(expect)


def test_jvm_parent_level_token_vs_kernel(spark, mentions):
    pts = index_points(mentions, level=30)
    out = pts.select(
        "cell_id_s",
        CC.parent("cell_id_s", 12).alias("p12"),
        CC.level("cell_id_s").alias("lvl"),
        CC.face("cell_id_s").alias("face"),
        CC.range_min(CC.parent("cell_id_s", 12)).alias("rmin"),
        CC.range_max(CC.parent("cell_id_s", 12)).alias("rmax"),
        CC.is_leaf("cell_id_s").alias("leaf"),
        CC.is_valid("cell_id_s").alias("valid"),
    ).toPandas()
    ids = K.unbias(out.cell_id_s.to_numpy(np.int64))
    assert (K.unbias(out.p12.to_numpy(np.int64)) == K.parent(ids, 12)).all()
    assert (out.lvl.to_numpy() == 30).all()
    assert (out.face.to_numpy() == K.face(ids)).all()
    assert (K.unbias(out.rmin.to_numpy(np.int64)) == K.range_min(K.parent(ids, 12))).all()
    assert (K.unbias(out.rmax.to_numpy(np.int64)) == K.range_max(K.parent(ids, 12))).all()
    assert out.leaf.all() and out.valid.all()


def test_cell_histogram_matches_duckdb_style_group(spark, mentions):
    import duckdb

    pts = index_points(mentions, level=30)
    hist = cell_histogram(pts, 8).toPandas().sort_values("cell_id_s").reset_index(drop=True)
    # oracle: group the same biased ids with the same bit-mask formula in DuckDB
    base = pts.select("cell_id_s").toPandas()
    nlsb = 1 << (2 * (30 - 8))
    oracle = duckdb.sql(
        f"select ((cell_id_s & {-nlsb}) | {nlsb}) as cell_id_s, count(*) as n_points "
        "from base group by 1 order by 1"
    ).df()
    assert (hist.cell_id_s.to_numpy() == oracle.cell_id_s.to_numpy()).all()
    assert (hist.n_points.to_numpy() == oracle.n_points.to_numpy()).all()


def test_histogram_is_skewed(spark, mentions):
    # the 80/20 city mixture must produce hot cells (salting rationale)
    pts = index_points(mentions, level=30)
    hist = cell_histogram(pts, 6).toPandas()
    top = hist.n_points.max()
    med = hist.n_points.median()
    assert top > 5 * med
