"""Physical-plan regression guards: the plans we rely on at 100 TB.

These assert plan *shape* (broadcast vs shuffle, pushdown, codegen), not
timings — the properties that decide whether an operator survives a
100× scale-up."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pip_join_broadcasts_polygon_side(spark):
    import __spark_entry__ as E
    from s2geometry_spark.operators.indexing import index_points
    from s2geometry_spark.operators.spatial_join import point_in_polygon_join

    pts = index_points(E._tile_points(spark, SF_DIR), level=30)
    out = point_in_polygon_join(pts, E._continental_polygons())
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    # the fact table must not be exchanged for the join (no shuffle on it)
    assert "SortMergeJoin" not in plan


def test_parquet_scan_prunes_columns(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    q = cust.select("c_custkey").filter(F.col("c_custkey") < 100)
    plan = _plan(q)
    # column pruning: only c_custkey read
    assert "c_custkey" in plan
    assert "c_name" not in plan
    # predicate pushdown reaches the scan
    assert "PushedFilters" in plan and "LessThan(c_custkey,100)" in plan


def test_cell_histogram_has_partial_aggregation(spark):
    import __spark_entry__ as E
    from s2geometry_spark.operators.indexing import cell_histogram, index_points

    pts = index_points(E._tile_points(spark, SF_DIR), level=30)
    plan = _plan(cell_histogram(pts, 8))
    # partial + final HashAggregate pair (map-side combine before shuffle)
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_containment_join_is_pure_jvm(spark):
    """The range-containment join must contain no Python evaluation —
    the predicate is bit algebra the JVM executes in codegen."""
    from s2geometry_spark.operators.cellops import cell_containment_join

    plan = _plan(cell_containment_join(spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_indexed_closest_edges_join_broadcasts_probe(spark):
    import __spark_entry__ as E
    from s2geometry_spark.operators.indexing import index_points
    from s2geometry_spark.operators.shape_index import (
        build_shape_index,
        edges_to_df,
        indexed_closest_edges_join,
    )

    shape = E._ring_polyline_shape()
    index = build_shape_index(edges_to_df(spark, [shape]), max_edges_per_cell=4)
    pts = index_points(E._tile_points(spark, SF_DIR), level=30)
    out = indexed_closest_edges_join(pts, index, k=1, max_distance_rad=0.2)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan


def test_minhash_pair_distinct_carries_no_signatures(spark):
    """The band-bucket pair dedup must shuffle only (doc_a, doc_b) —
    carrying the 12-element md5 signature arrays through the distinct
    would multiply the shuffle bytes ~NUM_HASHES×.  The signatures
    re-join after the distinct."""
    import re

    from s2geometry_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # n_docs hint above the carry-sig gate forces the 100 TB plan shape
    plan = _plan(minhash_lsh_pairs(docs, n_docs=10_000_000))
    # every distinct (HashAggregate with keys=[...]) must key on the bare
    # doc ids, never the sig arrays
    keys_matches = re.findall(r"HashAggregate\(keys=\[(.*?)\]", plan)
    assert keys_matches, "plan shape changed — update the regex"
    for keys in keys_matches:
        assert "sig" not in keys, f"distinct keys carry signatures: {keys}"
    hash_parts = re.findall(r"hashpartitioning\((.*?)\)", plan)
    assert hash_parts, "plan shape changed — update the regex"
    for m in hash_parts:
        assert "sig" not in m, f"shuffle carries signatures: {m}"


def test_encode_shape_indexes_single_shuffle(spark):
    """The exact-index snapshot export must be ONE hash shuffle on
    index_id (repartition + in-partition sort + MapInPandas) — no
    per-group FlatMapGroupsInPandas, no extra exchange, no row-at-a-time
    Python."""
    import re

    import __spark_entry__ as entry
    from s2geometry_spark.operators.encode_ops import encode_shape_indexes

    shapes = spark.createDataFrame(
        entry._shape_index_rows(),
        "index_id string, shape_id int, kind string, chain_id int,"
        " vertex_idx int, x double, y double, z double",
    )
    plan = _plan(encode_shape_indexes(shapes))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
