"""Distributed shape index: invariants + indexed distance join == brute."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.kernel.closest_edge import Shape
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.operators.shape_index import (
    build_shape_index,
    edges_to_df,
    indexed_closest_edges_join,
)


def _spiral_polyline(n_edges: int, shape_id: int = 0) -> Shape:
    """Deterministic spiral around (20°, 30°) with `n_edges` edges."""
    t = np.arange(n_edges + 1) / n_edges
    lat = 20 + 8 * t * np.cos(14 * np.pi * t)
    lng = 30 + 8 * t * np.sin(14 * np.pi * t)
    x, y, z = latlng_to_xyz(lat, lng)
    v = np.stack([x, y, z], -1)
    return Shape(shape_id, 1, v[:-1], v[1:])


def test_index_invariants(spark):
    from s2geometry_spark.kernel import cellid as K

    shape = _spiral_polyline(500)
    edges = edges_to_df(spark, [shape])
    idx = build_shape_index(edges, max_edges_per_cell=10, max_level=20).toPandas()
    # every edge appears at least once
    assert set(idx.edge_id) == set(range(500))
    # cell occupancy invariant: ≤ 10 distinct edges unless at max_level
    occ = idx.groupby("cell_id_s").agg(
        n=("edge_id", "nunique"), lvl=("level", "max")
    )
    assert ((occ.n <= 10) | (occ.lvl >= 20)).all()
    # SUPERSET guarantee (what distance queries rely on): every point of
    # every edge lies inside one of that edge's indexed cells
    raw = idx.cell_id_s.to_numpy(np.int64).astype(np.uint64) + (1 << 63)
    rmin = K.range_min(raw).astype(np.uint64)
    rmax = K.range_max(raw).astype(np.uint64)
    by_edge = {}
    for k, (e, lo, hi) in enumerate(zip(idx.edge_id, rmin, rmax)):
        by_edge.setdefault(int(e), []).append((int(lo), int(hi)))
    rng = np.random.default_rng(11)
    for e in rng.choice(500, 60, replace=False):
        a, b = shape.edges_c[e], shape.edges_d[e]
        for t in np.linspace(0, 1, 9):
            p = (1 - t) * a + t * b
            p = p / np.linalg.norm(p)
            leaf = int(K.from_point(p[0:1], p[1:2], p[2:3])[0])
            assert any(lo <= leaf <= hi for lo, hi in by_edge[int(e)]), (e, t)


def test_indexed_join_matches_brute(spark):
    from s2geometry_spark.operators.closest_edges import closest_edges_join
    from s2geometry_spark.operators.indexing import index_points

    shape = _spiral_polyline(800)
    edges = edges_to_df(spark, [shape])
    index = build_shape_index(edges, max_edges_per_cell=10)

    rng = np.random.default_rng(3)
    pts_pdf = pd.DataFrame(
        {
            "key": np.arange(400),
            "lat": 20 + rng.uniform(-10, 10, 400),
            "lng": 30 + rng.uniform(-10, 10, 400),
        }
    )
    pts = index_points(spark.createDataFrame(pts_pdf), level=30)
    radius = math.radians(1.5)

    got = (
        indexed_closest_edges_join(pts, index, k=1, max_distance_rad=radius)
        .select("key", "shape_id", "edge_id", "dist2")
        .toPandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    exp = (
        closest_edges_join(
            pts, [shape], k=1, max_distance_rad=radius, include_interiors=False
        )
        .select("key", "shape_id", "edge_id", "dist2")
        .toPandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 50
    assert (got.key.values == exp.key.values).all()
    # distances agree to fp noise; the chosen edge agrees except at exact
    # near-ties (adjacent spiral arms) — require dist2 agreement always
    assert np.allclose(got.dist2.values, exp.dist2.values, atol=1e-12)
    mism = got.edge_id.values != exp.edge_id.values
    assert mism.sum() <= 2, got[mism]


class TestIncrementalUpdate:
    """update_shape_index must be row-identical to a from-scratch build
    (the refine stage is deterministic per (seed cell, edge set)) while
    reusing every untouched seed group verbatim."""

    @staticmethod
    def _shape(shape_id, lat0, lng0, n=40):
        import numpy as np

        from s2geometry_spark.kernel.closest_edge import Shape
        from s2geometry_spark.kernel.coords import latlng_to_xyz

        t = np.arange(n + 1) / n
        lat = lat0 + 3 * np.cos(2 * np.pi * t)
        lng = lng0 + 3 * np.sin(2 * np.pi * t)
        x, y, z = latlng_to_xyz(lat, lng)
        v = np.stack([x, y, z], -1)
        return Shape(shape_id, 1, v[:-1], v[1:])

    @staticmethod
    def _rows(df):
        return sorted(tuple(r) for r in df.collect())

    def test_add_and_remove_match_full_rebuild(self, spark):
        from s2geometry_spark.operators.shape_index import (
            build_shape_index,
            edges_to_df,
            update_shape_index,
        )

        a = self._shape(0, 10.0, 10.0)
        b = self._shape(1, 11.0, 11.0)   # overlaps a's seed cells
        c = self._shape(2, 40.0, -60.0)  # disjoint seed region
        kw = dict(max_edges_per_cell=4, max_level=18, seed_level=6)

        idx_ab = build_shape_index(edges_to_df(spark, [a, b]), **kw)

        # add a disjoint shape
        got = update_shape_index(
            idx_ab, added_edges=edges_to_df(spark, [c]), **kw
        )
        want = build_shape_index(edges_to_df(spark, [a, b, c]), **kw)
        assert self._rows(got) == self._rows(want)

        # remove an overlapping shape (forces coarsening of shared cells)
        got2 = update_shape_index(idx_ab, removed_shape_ids=(1,), **kw)
        want2 = build_shape_index(edges_to_df(spark, [a]), **kw)
        assert self._rows(got2) == self._rows(want2)

        # combined add + remove in one pass
        got3 = update_shape_index(
            idx_ab,
            added_edges=edges_to_df(spark, [c]),
            removed_shape_ids=(0,),
            **kw,
        )
        want3 = build_shape_index(edges_to_df(spark, [b, c]), **kw)
        assert self._rows(got3) == self._rows(want3)

    def test_untouched_seed_groups_not_recomputed(self, spark):
        """The left_anti/left_semi split: rows of seed groups the change
        does not touch come from the ORIGINAL index partitioning (plan
        contains a left_anti join reusing the input), and the rebuild
        input excludes untouched edges."""
        from s2geometry_spark.operators.shape_index import (
            build_shape_index,
            edges_to_df,
            update_shape_index,
        )

        a = self._shape(0, 10.0, 10.0)
        c = self._shape(2, 40.0, -60.0)
        kw = dict(max_edges_per_cell=4, max_level=18, seed_level=6)
        idx = build_shape_index(edges_to_df(spark, [a]), **kw)
        got = update_shape_index(idx, added_edges=edges_to_df(spark, [c]), **kw)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan
