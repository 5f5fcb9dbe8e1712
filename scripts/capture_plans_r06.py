#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query → plans/r06/.

Usage: python scripts/capture_plans_r06.py before|after
Builds the same dataframes bench.py times (sf0.1 inputs, same params) but
only explains them — no execution of the heavy actions, so it is safe to
run on a loaded host.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")
os.makedirs(OUT, exist_ok=True)


def save(name: str, df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {name}_{TAG}.txt")


def main():
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from s2geometry_spark.session import get_spark
    from s2geometry_spark.kernel.closest_edge import Shape
    from s2geometry_spark.kernel.coords import latlng_to_xyz
    from s2geometry_spark.operators.dedup import minhash_lsh_pairs
    from s2geometry_spark.operators.indexing import cell_histogram, index_points
    from s2geometry_spark.operators.knn import knn_join
    from s2geometry_spark.operators.shape_index import (
        build_shape_index, edges_to_df, indexed_closest_edges_join,
    )
    from s2geometry_spark.operators.similarity import cosine_topk
    from s2geometry_spark.operators.spatial_join import cover_polygons, point_in_polygon_join
    from s2geometry_spark.sources.pages import extract_mentions, synthesize_pages

    spark = get_spark(app_name="plan-capture", master="local[4]",
                      shuffle_partitions=64)
    pages = synthesize_pages(spark, 1000, partitions=4)
    mentions = extract_mentions(pages)
    points = index_points(mentions, level=30)

    save("q_index_cells",
         index_points(mentions, level=30, with_token=True)
         .agg(F.count("*"), F.min("cell_id_s"), F.max("cell_id_s")))
    save("q_cell_histogram", cell_histogram(points, 8))

    polys = E._fixture_polygons()
    cov_rows = cover_polygons(polys)
    save("q_pip_join",
         point_in_polygon_join(points, polys, covering_rows=cov_rows)
         .groupBy("polygon_id").count())

    queries = pd.DataFrame({
        "query_id": [f"q{i}" for i in range(64)],
        "lat": [(-80 + (i * 2.51) % 160) for i in range(64)],
        "lng": [(-180 + (i * 11.37) % 360) for i in range(64)],
    })
    save("q_knn", knn_join(queries, points, k=10, level=8, fact_rows=2_000_000))

    t = np.arange(2_001) / 2_000
    slat = 20 + 8 * t * np.cos(14 * np.pi * t)
    slng = 30 + 8 * t * np.sin(14 * np.pi * t)
    sx, sy, sz = latlng_to_xyz(slat, slng)
    sv = np.stack([sx, sy, sz], -1)
    spiral = Shape(0, 1, sv[:-1], sv[1:])
    index = build_shape_index(edges_to_df(spark, [spiral], partitions=4),
                              max_edges_per_cell=10)
    save("q_shape_index_build", index)
    index = index.persist()
    index.count()
    pts_keyed = points.withColumn("key", F.xxhash64("url", "mention_idx"))
    save("q_shape_index_join",
         indexed_closest_edges_join(pts_keyed, index, k=1, max_distance_rad=0.001))
    index.unpersist()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    save("q_dedup_minhash", minhash_lsh_pairs(docs, n_docs=docs.count()))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    save("q_ann_cosine", cosine_topk(emb, n_queries=20, k=10))
    spark.stop()


if __name__ == "__main__":
    main()
