"""Distributed DTW alignment operators vs the kernel (parity) —
operators/alignment_ops.py."""

import numpy as np
import pytest

from s2geometry_spark.kernel.alignment import (
    consensus_polyline,
    exact_alignment_cost,
    medoid_polyline,
    polylines_approx_equal,
)
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.operators.alignment_ops import (
    alignment_cost_pairs,
    consensus_per_group,
    group_pairs,
    medoid_per_group,
)

SPECS = {
    "ga": ["5:0, 5:1, 5:2", "3:0, 3:1, 3:2", "1:0, 1:1, 1:2"],
    "gb": ["0:0, 0:1, 0:2, 0:3", "0.4:0, 0.4:1.1, 0.4:2.2", "0.1:0, 0.2:1, 0.1:2, 0.2:3"],
    "gc": ["7:0, 7:1", "9:0, 9:1"],  # 2-line tie -> lowest ord wins
}


def _frames(spark):
    vrows, prows = [], []
    for grp, lines in SPECS.items():
        for o, s in enumerate(lines):
            pid = f"{grp}|{o}"
            prows.append((grp, pid, o))
            for vi, p in enumerate(parse_points(s)):
                vrows.append((grp, pid, o, vi, float(p[0]), float(p[1]), float(p[2])))
    vertices = spark.createDataFrame(
        [(r[1], r[3], r[4], r[5], r[6]) for r in vrows],
        "polyline_id string, vertex_idx int, x double, y double, z double",
    )
    withgrp = spark.createDataFrame(
        vrows,
        "grp string, polyline_id string, ord int, vertex_idx int,"
        " x double, y double, z double",
    )
    polylines = spark.createDataFrame(
        prows, "grp string, polyline_id string, ord int"
    )
    return vertices, withgrp, polylines


def test_pair_costs_match_kernel(spark):
    vertices, _, polylines = _frames(spark)
    pairs = group_pairs(polylines)
    got = {
        r.pair_id: r.cost
        for r in alignment_cost_pairs(
            vertices, pairs.select("pair_id", "id_a", "id_b")
        ).collect()
    }
    n_pairs = sum(len(v) * (len(v) - 1) // 2 for v in SPECS.values())
    assert len(got) == n_pairs
    for grp, lines in SPECS.items():
        pts = [parse_points(s) for s in lines]
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                exp = exact_alignment_cost(pts[i], pts[j])
                assert got[f"{grp}|{i}|{j}"] == pytest.approx(exp, rel=1e-12)


def test_medoid_per_group_matches_kernel(spark):
    vertices, _, polylines = _frames(spark)
    got = {
        r.grp: r.medoid_ord
        for r in medoid_per_group(vertices, polylines).collect()
    }
    for grp, lines in SPECS.items():
        exp = medoid_polyline([parse_points(s) for s in lines], approx=False)
        assert got[grp] == exp, grp
    # the 2-line group is an exact tie: contract says lowest ord
    assert got["gc"] == 0


def test_consensus_per_group_matches_kernel(spark):
    _, withgrp, _ = _frames(spark)
    out = consensus_per_group(withgrp, approx=False).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append((r.vertex_idx, r.x, r.y, r.z))
    for grp, lines in SPECS.items():
        exp = consensus_polyline(
            [parse_points(s) for s in lines], approx=False
        )
        rows = sorted(by_grp[grp])
        got = np.array([[x, y, z] for _, x, y, z in rows])
        assert polylines_approx_equal(got, exp, 1e-12), grp
