#!/usr/bin/env python
"""Isolated per-query measurements (guide §1.4): each bench query timed
with labeled jobs, plus a prep-phase breakdown.  Complements bench.py
(FROZEN for the driver) — numbers from here are cited in
OPTIMIZATION_r06.md but never fed to the driver.

Usage:
  python bench_extra.py [phase ...]   # default: all
Phases: prep, cover, index_cells, cell_histogram, pip, knn, shape_build,
        shape_join, minhash, cosine
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "1000000"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))

sel = set(sys.argv[1:])


def want(p):
    return not sel or p in sel


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
    from s2geometry_spark.operators.spatial_join import (
        cover_polygons, point_in_polygon_join,
    )
    from s2geometry_spark.sources.pages import extract_mentions, synthesize_pages

    t_start = time.perf_counter()
    spark = get_spark(
        app_name="bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS) * 2,
    )
    sc = spark.sparkContext
    print(f"[t] session: {time.perf_counter() - t_start:.2f}s")

    def timed(name, fn, reps=REPS, warm=1):
        sc.setJobDescription(name)
        for _ in range(warm):
            fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        print(f"[t] {name}: min={min(ts):.3f} all={[round(t,3) for t in ts]}")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # ---- prep ----
    polys = E._fixture_polygons()
    if want("cover"):
        t0 = time.perf_counter()
        cov_rows = cover_polygons(polys)
        print(f"[t] cover_polygons(driver): {time.perf_counter() - t0:.2f}s")
    else:
        cov_rows = cover_polygons(polys)

    pages = synthesize_pages(spark, N_PAGES, partitions=int(CPUS) * 2)
    mentions = extract_mentions(pages)
    points = index_points(mentions, level=30).cache()
    if want("prep"):
        t0 = time.perf_counter()
        n_points = points.count()
        print(f"[t] prep cache count ({n_points}): {time.perf_counter() - t0:.2f}s")
        timed("prep: synth+extract only",
              lambda: noop(extract_mentions(synthesize_pages(
                  spark, N_PAGES, partitions=int(CPUS) * 2))), reps=1, warm=0)
    else:
        n_points = points.count()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(int(CPUS))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_docs = docs.count()

    if want("index_cells"):
        timed("q_index_cells", lambda: index_points(
            mentions, level=30, with_token=True
        ).agg(F.count("*"), F.min("cell_id_s"), F.max("cell_id_s")).collect())
    if want("cell_histogram"):
        timed("q_cell_histogram", lambda: cell_histogram(points, 8).count())
    if want("pip"):
        timed("q_pip_join", lambda: point_in_polygon_join(
            points, E._fixture_polygons(), covering_rows=cov_rows
        ).groupBy("polygon_id").count().collect())
    if want("knn"):
        queries = pd.DataFrame({
            "query_id": [f"q{i}" for i in range(64)],
            "lat": [(-80 + (i * 2.51) % 160) for i in range(64)],
            "lng": [(-180 + (i * 11.37) % 360) for i in range(64)],
        })
        timed("q_knn", lambda: knn_join(
            queries, points, k=10, level=8, fact_rows=n_points
        ).count())
    if want("shape_build") or want("shape_join"):
        t = np.arange(100_001) / 100_000
        slat = 20 + 8 * t * np.cos(14 * np.pi * t)
        slng = 30 + 8 * t * np.sin(14 * np.pi * t)
        sx, sy, sz = latlng_to_xyz(slat, slng)
        sv = np.stack([sx, sy, sz], -1)
        spiral = Shape(0, 1, sv[:-1], sv[1:])
        if want("shape_build"):
            timed("q_shape_index_build", lambda: build_shape_index(
                edges_to_df(spark, [spiral], partitions=int(CPUS)),
                max_edges_per_cell=10,
            ).count())
        index = build_shape_index(
            edges_to_df(spark, [spiral], partitions=int(CPUS)),
            max_edges_per_cell=10,
        ).persist()
        n_index = index.count()
        print(f"[i] index rows: {n_index}")
        if want("shape_join"):
            pts_keyed = points.withColumn("key", F.xxhash64("url", "mention_idx"))
            timed("q_shape_index_join", lambda: indexed_closest_edges_join(
                pts_keyed, index, k=1, max_distance_rad=0.001
            ).count())
        index.unpersist()
    if want("minhash"):
        timed("q_dedup_minhash",
              lambda: minhash_lsh_pairs(docs, n_docs=n_docs).count())
    if want("cosine"):
        timed("q_ann_cosine", lambda: cosine_topk(emb, n_queries=20, k=10).count())
    # -- oracle-only ANN paths (not in bench.py's timed suite): measured
    # here with the oracle parameterization at this SF so the HOF->codegen
    # rewrites have before/after evidence.
    if want("ann_lsh") or want("ann_ivf") or want("ann_pq") or want("near_dup"):
        from s2geometry_spark.operators.similarity import (
            ann_ivf_topk, ann_lsh_topk, ann_pq_topk, embedding_near_dup_pairs,
        )
        if want("ann_lsh"):
            timed("ann_lsh_topk", lambda: ann_lsh_topk(
                emb, n_queries=10, k=5, bits=6, dim=64).count())
        if want("ann_ivf"):
            timed("ann_ivf_topk", lambda: ann_ivf_topk(
                emb, n_queries=10, k=5, n_centroids=8, nprobe=2).count())
        if want("ann_pq"):
            timed("ann_pq_topk", lambda: ann_pq_topk(
                emb, n_queries=10, k=5, n_codewords=8, m_subspaces=4,
                r_candidates=20).count())
        if want("near_dup"):
            timed("embedding_near_dup", lambda: embedding_near_dup_pairs(
                emb, threshold=0.4, bits=6, dim=64).count())
    spark.stop()


if __name__ == "__main__":
    main()
