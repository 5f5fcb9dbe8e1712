#!/usr/bin/env python
"""Cluster entry point for the north-rule pipeline.

Package and launch:
    python scripts/make_dist.py                       # builds dist/s2geometry_spark.zip
    spark-submit --py-files dist/s2geometry_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<4x cores> \
        scripts/run_pipeline.py \
        --checkpoint-root s3://bucket/ckpt --n-pages 1000000

The pipeline is resumable: each stage commits a parquet checkpoint with
per-partition lineage; re-running with the same --checkpoint-root skips
completed stages (sources/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root on sys.path so `__spark_entry__` / `s2geometry_spark` import
# when launched as `python scripts/run_pipeline.py` (sys.path[0] is
# scripts/); under spark-submit --py-files the zip provides the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-root", required=True)
    ap.add_argument("--n-pages", type=int, default=100000)
    ap.add_argument("--level", type=int, default=30)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("s2geometry-spark-pipeline").getOrCreate()

    import __spark_entry__ as E
    from s2geometry_spark.sources.checkpoint import run_geo_pipeline

    t0 = time.perf_counter()
    joined, pipe = run_geo_pipeline(
        spark, args.checkpoint_root, args.n_pages, E._fixture_polygons(),
        level=args.level,
    )
    n = joined.count()
    print(
        json.dumps(
            {
                "rows": n,
                "wall_sec": round(time.perf_counter() - t0, 2),
                "stages": pipe.metrics,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
