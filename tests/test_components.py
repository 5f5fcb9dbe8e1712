"""Connected components over dedup pair tables (operators/components.py):
Large-Star/Small-Star (Kiveris et al., SoCC 2014) vs a driver-side BFS
oracle, plus the dedup_components canonicalization contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators.components import (
    connected_components,
    dedup_components,
)


def _bfs_components(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    adj: dict[int, set[int]] = {u: set() for u in n_nodes}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    comp: dict[int, int] = {}
    for start in sorted(adj):
        if start in comp:
            continue
        stack, seen = [start], {start}
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        label = min(seen)
        for u in seen:
            comp[u] = label
    return comp


def _check(spark, edges: list[tuple[int, int]]):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    nodes = sorted({u for e in edges for u in e})
    want_map = _bfs_components(nodes, edges)
    want = {(u, c) for u, c in want_map.items()}
    assert got == want


def test_single_edge(spark):
    _check(spark, [(2, 1)])


def test_chain_and_clique(spark):
    # A long path (worst case for label propagation, easy for star
    # rounds) plus a clique plus a 2-cycle of duplicates.
    edges = [(i, i + 1) for i in range(10, 20)]
    edges += [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
    edges += [(7, 3), (3, 7)]
    _check(spark, edges)


def test_self_loops_and_duplicates(spark):
    _check(spark, [(5, 5), (5, 6), (6, 5), (6, 7), (5, 7), (9, 8)])


def test_random_graphs_vs_bfs(spark):
    rng = np.random.RandomState(42)
    for trial in range(3):
        n = 60
        m = [15, 40, 90][trial]
        edges = [
            (int(a), int(b))
            for a, b in zip(rng.randint(0, n, m), rng.randint(0, n, m))
            if a != b
        ]
        if not edges:
            continue
        _check(spark, edges)


def test_dedup_components_contract(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id: long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 7), (5, 6)], "doc_a: long, doc_b: long"
    )
    rows = {
        r["doc_id"]: (r["component_id"], r["component_size"])
        for r in dedup_components(docs, pairs).collect()
    }
    assert rows[0] == (0, 3) and rows[3] == (0, 3) and rows[7] == (0, 3)
    assert rows[5] == (5, 2) and rows[6] == (5, 2)
    for singleton in (1, 2, 4, 8, 9):
        assert rows[singleton] == (singleton, 1)
    # keep-one-per-cluster projection: component_id == doc_id keeps
    # exactly one representative per cluster.
    keepers = [d for d, (c, _s) in rows.items() if c == d]
    assert sorted(keepers) == [0, 1, 2, 4, 5, 8, 9]


def test_empty_pairs(spark):
    docs = spark.createDataFrame([(1,), (2,)], "doc_id: long")
    pairs = spark.createDataFrame([], "doc_a: long, doc_b: long")
    rows = {
        r["doc_id"]: (r["component_id"], r["component_size"])
        for r in dedup_components(docs, pairs).collect()
    }
    assert rows == {1: (1, 1), 2: (2, 1)}


def test_plan_has_no_python_udf(spark):
    """The star rounds must stay JVM-side (window + distinct only)."""
    df = spark.createDataFrame([(2, 1), (3, 2)], "src: long, dst: long")
    out = connected_components(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_star_round_shuffle_budget(spark):
    """Each star step is exactly TWO shuffles (per-node window min +
    dedup) and zero joins (PLANS.md contract).  Small-Star emits both
    link kinds from one windowed row (explode), so there is no union
    branch that could double the window exchange."""
    import re

    from s2geometry_spark.operators.components import _star_round

    df = spark.createDataFrame([(2, 1), (3, 2)], "src: long, dst: long")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for large in (True, False):
            plan = _star_round(df, large)._jdf.queryExecution().executedPlan().toString()
            n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
            assert "Join" not in plan
            assert n_exchange == 2, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
