"""ContainsVertexQuery fixtures — port of
s2contains_vertex_query_test.cc:30-105 (Undetermined,
Contained/NotContainedWithDuplicates, CompatibleWithAngleContainsVertex
incl. the degenerate-edge case)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.predicates import (
    ContainsVertexQuery,
    angle_contains_vertex,
)


def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
    return np.array([x, y, z], float)


def test_undetermined():
    # s2contains_vertex_query_test.cc:30-36
    q = ContainsVertexQuery(_pt(1, 2))
    q.add_edge(_pt(3, 4), 1)
    q.add_edge(_pt(3, 4), -1)
    assert q.contains_sign() == 0
    assert not q.duplicate_edges()


def test_contained_with_duplicates():
    # s2contains_vertex_query_test.cc:38-56
    q = ContainsVertexQuery(_pt(0, 0))
    q.add_edge(_pt(3, -3), -1)
    q.add_edge(_pt(1, -5), 1)
    q.add_edge(_pt(2, -4), 1)
    q.add_edge(_pt(1, -5), -1)
    assert q.contains_sign() == 1
    assert not q.duplicate_edges()

    # incoming and outgoing to 1:-5 cancel, so one more isn't a duplicate
    q.add_edge(_pt(1, -5), -1)
    assert not q.duplicate_edges()

    # 3:-3 was seen once incoming; another incoming is a duplicate
    q.add_edge(_pt(3, -3), -1)
    assert q.duplicate_edges()


def test_not_contained_with_duplicates():
    # s2contains_vertex_query_test.cc:58-77
    q = ContainsVertexQuery(_pt(1, 1))
    q.add_edge(_pt(1, -5), 1)
    q.add_edge(_pt(2, -4), -1)
    q.add_edge(_pt(3, -3), 1)
    q.add_edge(_pt(1, -5), -1)
    assert q.contains_sign() == -1
    assert not q.duplicate_edges()

    q.add_edge(_pt(1, -5), -1)
    assert not q.duplicate_edges()

    q.add_edge(_pt(3, -3), 1)
    assert q.duplicate_edges()


def _regular_points(center, radius_rad, n):
    z = center / np.linalg.norm(center)
    ref = np.array([1.0, 0.0, 0.0]) if abs(z[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    x = np.cross(z, ref)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    out = []
    for i in range(n):
        theta = 2 * math.pi * i / n
        d = math.cos(theta) * x + math.sin(theta) * y
        v = math.cos(radius_rad) * z + math.sin(radius_rad) * d
        out.append(v / np.linalg.norm(v))
    return out


def test_compatible_with_angle_contains_vertex():
    # s2contains_vertex_query_test.cc:79-94: a 10-vertex regular loop
    # near the pole — the query must agree with AngleContainsVertex
    pts = _regular_points(_pt(89, 1), math.radians(5), 10)
    n = len(pts)
    for i in range(n):
        a, b, c = pts[i], pts[(i + 1) % n], pts[(i + 2) % n]
        q = ContainsVertexQuery(b)
        q.add_edge(a, -1)
        q.add_edge(c, 1)
        assert (q.contains_sign() > 0) == angle_contains_vertex(a, b, c), i
        assert not q.duplicate_edges()


def test_compatible_with_angle_contains_vertex_degenerate():
    # s2contains_vertex_query_test.cc:96-104: degenerate edge (a, b, a)
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    q = ContainsVertexQuery(b)
    q.add_edge(a, -1)
    q.add_edge(a, 1)
    assert (q.contains_sign() > 0) == angle_contains_vertex(a, b, a)
    assert not q.duplicate_edges()
