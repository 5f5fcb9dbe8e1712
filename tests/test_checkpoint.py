"""Resumability: killed-job semantics via checkpoint markers + lineage."""

import json
import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from s2geometry_spark.sources.checkpoint import (
    CheckpointedPipeline,
    run_geo_pipeline,
)


def test_pipeline_checkpoints_and_resumes(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    polygons = E._fixture_polygons()
    out1, pipe1 = run_geo_pipeline(spark, root, 300, polygons)
    n1 = out1.count()
    assert n1 > 0
    assert all(not m["resumed"] for m in pipe1.metrics.values())

    # lineage carries per-partition rows/bytes
    lin = pipe1.lineage("points")
    rows = lin.collect()
    assert {r.stage for r in rows} == {"points"}
    assert sum(r.rows for r in rows) == pipe1.spark.read.parquet(
        f"{root}/points/data"
    ).count()
    assert all(r.bytes > 0 for r in rows)

    # "killed and restarted": a fresh pipeline over the same root resumes
    # every stage from the checkpoint without recomputation
    out2, pipe2 = run_geo_pipeline(spark, root, 300, polygons)
    assert out2.count() == n1
    assert all(m["resumed"] for m in pipe2.metrics.values())


def test_torn_stage_is_recomputed(spark, tmp_path):
    root = str(tmp_path / "ckpt2")
    polygons = E._fixture_polygons()
    out1, _ = run_geo_pipeline(spark, root, 200, polygons)
    n1 = out1.count()

    # simulate a kill mid-write of the last stage: marker removed
    os.remove(f"{root}/pip_join/_COMMITTED")
    out2, pipe2 = run_geo_pipeline(spark, root, 200, polygons)
    assert out2.count() == n1
    assert pipe2.metrics["pages"]["resumed"]
    assert pipe2.metrics["mentions"]["resumed"]
    assert pipe2.metrics["points"]["resumed"]
    assert not pipe2.metrics["pip_join"]["resumed"]  # recomputed

    # simulate lineage/data mismatch (torn write of data files)
    marker = f"{root}/points/_COMMITTED"
    with open(marker) as fh:
        manifest = json.load(fh)
    manifest["rows"] += 1
    with open(marker, "w") as fh:
        json.dump(manifest, fh)
    pipe3 = CheckpointedPipeline(spark, root)
    assert not pipe3.is_complete("points")
