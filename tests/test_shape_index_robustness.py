"""Ports of the mutable_s2shape_index_test.cc robustness inputs onto
the distributed index (build_shape_index): many identical long edges,
degenerate edges, many tiny edges, loops spanning three faces.  The
engine replaces the C++ mutable cell map with a DataFrame superset
index, so the gates here are the reference's INVARIANTS — linear index
size via the short-edge rule, the superset guarantee, bounded
occupancy of short edges — not the exact cell set."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.closest_edge import Shape
from s2geometry_spark.kernel.fractal import make_regular_points
from s2geometry_spark.operators.shape_index import (
    build_shape_index,
    edges_to_df,
)


def _norm(p):
    p = np.asarray(p, dtype=np.float64)
    return p / np.linalg.norm(p)


def _superset_holds(idx, shapes, samples=7, rng_seed=5):
    """Every sampled point of every edge lies in one of that edge's
    indexed cells (what distance/containment queries rely on)."""
    raw = idx.cell_id_s.to_numpy(np.int64).astype(np.uint64) + (1 << 63)
    rmin = K.range_min(raw).astype(np.uint64)
    rmax = K.range_max(raw).astype(np.uint64)
    ranges = {}
    for sid, e, lo, hi in zip(idx.shape_id, idx.edge_id, rmin, rmax):
        ranges.setdefault((int(sid), int(e)), []).append((int(lo), int(hi)))
    for shape in shapes:
        for e in range(len(shape.edges_c)):
            a, b = shape.edges_c[e], shape.edges_d[e]
            key = (shape.shape_id, e)
            assert key in ranges, key
            for t in np.linspace(0, 1, samples):
                p = _norm((1 - t) * a + t * b)
                leaf = int(K.from_point(p[0:1], p[1:2], p[2:3])[0])
                assert any(lo <= leaf <= hi for lo, hi in ranges[key]), (
                    key, t)
    return True


def test_one_edge(spark):
    """OneEdge (mutable_s2shape_index_test.cc:460-466)."""
    a = np.array([1.0, 0, 0])
    b = np.array([0.0, 1, 0])
    shape = Shape(0, 1, a[None], b[None])
    idx = build_shape_index(edges_to_df(spark, [shape])).toPandas()
    assert len(idx) > 0
    assert _superset_holds(idx, [shape])


def test_many_identical_edges(spark):
    """ManyIdenticalEdges (mutable_s2shape_index_test.cc:498-514): 100
    identical face-diagonal edges must NOT subdivide — the short-edge
    rule keeps every cell at the seed level, so the index stays linear
    in edge count instead of exploding to max_level along the
    diagonal."""
    a = _norm((0.99, 0.99, 1.0))
    b = _norm((-0.99, -0.99, 1.0))
    shapes = [Shape(i, 1, a[None], b[None]) for i in range(100)]
    seed_level = 6
    idx = build_shape_index(
        edges_to_df(spark, shapes), seed_level=seed_level
    ).toPandas()
    # No subdivision below the seed level (reference: all cells level 0;
    # the distributed index's floor is its seed level).
    assert (idx.level <= seed_level).all()
    # Linear size: #rows == #edges x #seed-cells-per-edge (each edge has
    # the same path), NOT O(4^max_level).
    per_edge = idx.groupby("shape_id").size()
    assert per_edge.nunique() == 1
    assert len(idx) == 100 * per_edge.iloc[0]
    assert _superset_holds(idx, shapes[:5])


def test_degenerate_edge(spark):
    """DegenerateEdge (mutable_s2shape_index_test.cc:516-534): a
    point-edge at a cube-face corner is indexed and queryable."""
    a = _norm((1.0, 1.0, 1.0))
    shape = Shape(0, 1, a[None], a[None])
    idx = build_shape_index(edges_to_df(spark, [shape])).toPandas()
    assert len(idx) >= 1
    # The corner point is inside every indexed cell's range.
    leaf = int(K.from_point(a[0:1], a[1:2], a[2:3])[0])
    raw = idx.cell_id_s.to_numpy(np.int64).astype(np.uint64) + (1 << 63)
    rmin = K.range_min(raw).astype(np.uint64)
    rmax = K.range_max(raw).astype(np.uint64)
    assert any(lo <= leaf <= hi for lo, hi in zip(rmin, rmax))


def test_many_tiny_edges(spark):
    """ManyTinyEdges (mutable_s2shape_index_test.cc:536-556):
    subdivision stops at max_level when identical tiny edges can never
    separate."""
    x, y, z = K.to_point(K.from_point(
        np.array([1.0]), np.array([0.0]), np.array([0.0])))
    a = np.array([float(x[0]), float(y[0]), float(z[0])])
    b = _norm(a + np.array([0, 1e-12, 0]))
    shapes = [Shape(i, 1, a[None], b[None]) for i in range(100)]
    max_level = 20
    idx = build_shape_index(
        edges_to_df(spark, shapes), max_level=max_level
    ).toPandas()
    # All 100 edges land in max_level cells around the point; the
    # recursion terminated at the cap instead of looping.
    assert (idx.level == max_level).all()
    assert set(idx.shape_id) == set(range(100))
    # Each edge occupies a bounded number of max_level cells.
    assert idx.groupby("shape_id").size().max() <= 4


def test_loops_spanning_three_faces(spark):
    """LoopsSpanningThreeFaces (mutable_s2shape_index_test.cc:482-496):
    two concentric 100-vertex loops around the cube vertex shared by
    three faces."""
    center = _norm((1.0, -1.0, -1.0))
    shapes = []
    for i, radius_deg in enumerate([10.0, 5.0]):
        v = make_regular_points(center, math.radians(radius_deg), 100)
        shapes.append(Shape(i, 2, v, np.roll(v, -1, axis=0)))
    idx = build_shape_index(edges_to_df(spark, shapes)).toPandas()
    faces = set((idx.cell_id_s.to_numpy(np.int64).astype(np.uint64)
                 + (1 << 63)) >> 61)
    assert len(faces) >= 3
    assert _superset_holds(idx, shapes, samples=3)
