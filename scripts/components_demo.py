"""Connected-components scale demo (the dedup-clustering worst case).

Deterministic graph: `50k·MULT` chains of length 100 — the
label-propagation adversary, forcing the full O(log n) round schedule —
plus `1M·MULT` random cross edges within blocks of 1000 nodes
(near-clique duplicate clusters, the realistic dedup shape).  No
external data; xxhash64 makes the graph identical at every parallelism.

Usage: python scripts/components_demo.py [--cores N] [--mult M]
Prints one JSON line: nodes, components, wall seconds, rounds proxy.

Run at two core counts for the north-rule scaling evidence, e.g.:
    python scripts/components_demo.py --cores 8
    python scripts/components_demo.py --cores 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--mult", type=float, default=1.0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from s2geometry_spark.operators.components import connected_components

    # bench.py --scaling protocol: pin the process tree to the first
    # `cores` CPUs and FIX shuffle partitions across parallelism levels
    # (on a real cluster the partitioning is a property of the data
    # layout, not of how many executors happen to run).
    os.sched_setaffinity(0, range(args.cores))
    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = int(5_000_000 * args.mult)
    n_rand = int(1_000_000 * args.mult)
    chains = (
        spark.range(n)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .where((F.col("id") % 100) != 99)
    )
    rand = spark.range(n_rand).select(
        (F.floor(F.col("id") / 10) * 1000 + F.abs(F.xxhash64("id")) % 1000).alias("src"),
        (
            F.floor(F.col("id") / 10) * 1000
            + F.abs(F.xxhash64(F.col("id") + 7)) % 1000
        ).alias("dst"),
    )
    edges = chains.union(rand)

    t0 = time.time()
    comp = connected_components(edges)
    ncomp = comp.select("component").distinct().count()
    nnodes = comp.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "cores": args.cores,
                "mult": args.mult,
                "edges_approx": n - n // 100 + n_rand,
                "nodes": nnodes,
                "components": ncomp,
                "wall_sec": round(wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
