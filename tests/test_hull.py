"""Convex hull: all input points must be contained in the hull loop."""

import numpy as np
import pytest

from s2geometry_spark.kernel.contains import Loop
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.operators.hull import _hull_indices, convex_hulls

RNG = np.random.default_rng(42)


def _cloud(lat0, lng0, spread, n):
    lat = lat0 + RNG.uniform(-spread, spread, n)
    lng = lng0 + RNG.uniform(-spread, spread, n)
    return np.stack(latlng_to_xyz(lat, lng), -1)


def test_hull_contains_all_points_kernel():
    for _ in range(5):
        pts = _cloud(RNG.uniform(-50, 50), RNG.uniform(-150, 150), 5, 60)
        idx = _hull_indices(pts)
        assert 3 <= len(idx) <= len(pts)
        loop = Loop(pts[idx])
        interior = np.array([i for i in range(len(pts)) if i not in idx])
        assert loop.contains(pts[interior]).all()


def test_hull_of_triangle_is_triangle():
    pts = _cloud(10, 20, 3, 3)
    idx = _hull_indices(pts)
    assert sorted(idx) == [0, 1, 2]


def test_convex_hulls_spark(spark):
    rows = []
    for g, (lat0, lng0) in enumerate([(10, 20), (-30, 100)]):
        pts = _cloud(lat0, lng0, 4, 40)
        rows += [
            (f"g{g}", float(p[0]), float(p[1]), float(p[2])) for p in pts
        ]
    df = spark.createDataFrame(rows, "group_id string, x double, y double, z double")
    hulls = convex_hulls(df).collect()
    by_group = {}
    for r in hulls:
        by_group.setdefault(r.group_id, []).append((r.hull_idx, [r.x, r.y, r.z]))
    pdf = df.toPandas()
    for g, verts in by_group.items():
        verts = np.array([v for _, v in sorted(verts)])
        loop = Loop(verts)
        pts = pdf[pdf.group_id == g][["x", "y", "z"]].to_numpy()
        # all group points inside or on the hull
        hull_set = {tuple(np.round(v, 12)) for v in verts}
        inner = np.array(
            [p for p in pts if tuple(np.round(p, 12)) not in hull_set]
        )
        assert loop.contains(inner).all()
