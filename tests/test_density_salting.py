"""Density rollup, index-level selection, salted join equivalence."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from s2geometry_spark.operators.indexing import index_points
from s2geometry_spark.operators.spatial_join import cover_polygons
from s2geometry_spark.plans.density import (
    density_rollup,
    hot_cells,
    pick_index_level,
    salted_candidate_join,
)
from s2geometry_spark.sources.pages import extract_mentions, synthesize_pages


@pytest.fixture(scope="module")
def points(spark):
    pages = synthesize_pages(spark, 1500, partitions=8)
    return index_points(extract_mentions(pages), level=30).cache()


def test_density_rollup_consistent(spark, points):
    levels = [4, 6, 8]
    d = density_rollup(points, levels).cache()
    total = points.count()
    for l in levels:
        s = d.filter(F.col("level") == l).agg(F.sum("weight")).first()[0]
        assert s == total
    # coarser levels have fewer, heavier cells
    counts = {r.level: r.n for r in d.groupBy("level").agg(F.count("*").alias("n")).collect()}
    assert counts[4] <= counts[6] <= counts[8]


def test_pick_index_level(spark, points):
    d = density_rollup(points, [4, 6, 8, 10]).cache()
    lvl = pick_index_level(d, target_rows_per_cell=50)
    assert lvl in (4, 6, 8, 10)
    p99 = (
        d.filter(F.col("level") == lvl)
        .agg(F.expr("percentile_approx(weight, 0.99)"))
        .first()[0]
    )
    assert p99 <= 50 or lvl == 10


def test_hot_cells_found_for_skewed_data(spark, points):
    # the 80/20 city mixture must produce hot cells at a coarse level
    d = density_rollup(points, [6]).cache()
    hot = hot_cells(d, 6, rows_per_salt=20)
    assert len(hot) > 0
    assert all(1 < n <= 64 for n in hot.values())


def test_salted_join_matches_unsalted(spark, points):
    polygons = E._fixture_polygons()
    cov_rows = cover_polygons(polygons)
    cov = spark.createDataFrame(
        cov_rows, "polygon_id string, cell_id_s long, is_interior boolean"
    )
    d = density_rollup(points, [6]).cache()
    hot = hot_cells(d, 6, rows_per_salt=20)
    salted = salted_candidate_join(points, cov, hot).select(
        "url", "mention_idx", "polygon_id"
    )
    # unsalted reference candidate join
    from s2geometry_spark.functions import columns as CC
    from s2geometry_spark.kernel.cid import CID

    levels = sorted({CID(c + (1 << 63)).level() for _, c, _ in cov_rows})
    terms = points.withColumn(
        "_t", F.explode(F.array(*[CC.parent("cell_id_s", l) for l in levels]))
    )
    plain = terms.join(cov, terms["_t"] == cov["cell_id_s"]).select(
        "url", "mention_idx", "polygon_id"
    )
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert len(a) > 0
    assert a == b
