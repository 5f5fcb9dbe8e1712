"""Equal-weight Hilbert-range sharding + region→shard assignment."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from s2geometry_spark.operators.indexing import index_points
from s2geometry_spark.operators.spatial_join import cover_polygons
from s2geometry_spark.plans.density import density_rollup
from s2geometry_spark.plans.sharder import (
    equal_weight_ranges,
    most_intersecting_shard,
    shard_of_cells,
)
from s2geometry_spark.sources.pages import extract_mentions, synthesize_pages


@pytest.fixture(scope="module")
def points(spark):
    pages = synthesize_pages(spark, 1200, partitions=8)
    return index_points(extract_mentions(pages), level=30).cache()


def test_equal_weight_ranges_balanced(spark, points):
    d = density_rollup(points, [8]).cache()
    shards = equal_weight_ranges(d, 8, 8)
    assert len(shards) == 8
    # ranges tile the whole id space without gaps
    assert shards[0][1] == -(1 << 63)
    assert shards[-1][2] == (1 << 63) - 1
    for (_sid, _s, e), (_sid2, s2, _e2) in zip(shards, shards[1:]):
        assert s2 == e + 1
    # shard weights within 3x of each other (skewed data, coarse cells)
    cells = [r.cell_id_s for r in points.select("cell_id_s").collect()]
    assign = shard_of_cells(shards, cells)
    counts = np.bincount(assign, minlength=8)
    assert counts.sum() == len(cells)
    assert counts.max() <= max(4 * counts[counts > 0].min(), len(cells) // 2)


def test_most_intersecting_shard(spark, points):
    d = density_rollup(points, [8]).cache()
    shards = equal_weight_ranges(d, 8, 8)
    cov_rows = cover_polygons(E._fixture_polygons())
    cov = spark.createDataFrame(
        [(p, c) for p, c, _ in cov_rows], "region_id string, cell_id_s long"
    )
    out = {r.region_id: r.shard_id for r in most_intersecting_shard(spark, shards, cov).collect()}
    assert set(out) == {p for p, _ in E._fixture_polygons()}
    assert all(0 <= s < 8 for s in out.values())
