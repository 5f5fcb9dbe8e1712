"""Port of s2contains_point_query_test.cc over
kernel/contains_point.ContainsPointQuery."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.closest_edge import parse_index
from s2geometry_spark.kernel.contains import Loop, parse_points
from s2geometry_spark.kernel.contains_point import (
    CLOSED,
    OPEN,
    SEMI_OPEN,
    ContainsPointQuery,
)
from s2geometry_spark.kernel.fractal import make_regular_points


def pt(s: str) -> np.ndarray:
    return parse_points(s)[0]


INDEX = "0:0 # -1:1, 1:1 # 0:5, 0:7, 2:6"


def test_vertex_model_open():
    """test.cc:55-77."""
    q = ContainsPointQuery(parse_index(INDEX), OPEN)
    for s in ("0:0", "-1:1", "1:1", "0:2", "0:3", "0:5", "0:7", "2:6",
              "10:10"):
        assert not q.contains(pt(s)), s
    assert q.contains(pt("1:6"))
    assert not q.shape_contains(1, pt("1:6"))
    assert q.shape_contains(2, pt("1:6"))
    assert not q.shape_contains(2, pt("0:5"))
    assert not q.shape_contains(2, pt("0:7"))


def test_vertex_model_semi_open():
    """test.cc:79-100."""
    q = ContainsPointQuery(parse_index(INDEX), SEMI_OPEN)
    for s in ("0:0", "-1:1", "1:1", "0:2", "0:5", "2:6", "10:10"):
        assert not q.contains(pt(s)), s
    assert q.contains(pt("0:7"))  # contained vertex
    assert q.contains(pt("1:6"))
    assert not q.shape_contains(1, pt("1:6"))
    assert q.shape_contains(2, pt("1:6"))
    assert not q.shape_contains(2, pt("0:5"))
    assert q.shape_contains(2, pt("0:7"))


def test_vertex_model_closed():
    """test.cc:102-123."""
    q = ContainsPointQuery(parse_index(INDEX), CLOSED)
    for s in ("0:0", "-1:1", "1:1", "0:5", "0:7", "2:6", "1:6"):
        assert q.contains(pt(s)), s
    assert not q.contains(pt("0:2"))
    assert not q.contains(pt("10:10"))
    assert not q.shape_contains(1, pt("1:6"))
    assert q.shape_contains(2, pt("1:6"))
    assert q.shape_contains(2, pt("0:5"))
    assert q.shape_contains(2, pt("0:7"))


def test_visit_containing_shapes_can_stop_early():
    """test.cc:125-142: 3 shapes contain 0:0 under CLOSED, but a
    false-returning visitor sees only the first."""
    shapes = parse_index("0:0 # 0:0, 1:1 # -1:0, 0:1, 1:0, 0:-1")
    q = ContainsPointQuery(shapes, CLOSED)
    count = 0

    def visitor(_shape):
        nonlocal count
        count += 1
        return False

    status = q.visit_containing_shapes(pt("0:0"), visitor)
    assert not status
    assert count == 1


def test_get_containing_shapes():
    """GetContainingShapes (test.cc:144-180): 100 random regular loops,
    query results match S2Loop::Contains exactly."""
    from s2geometry_spark.kernel.closest_edge import Shape
    from s2geometry_spark.kernel.contains import Polygon

    rng = np.random.default_rng(20260818)
    max_loop_radius = 10 / 6371.01  # S2Testing::KmToAngle(10)
    center = rng.standard_normal(3)
    center /= np.linalg.norm(center)

    def sample_in_cap(c, radius):
        # uniform in the cap around c
        h = 1 - (1 - math.cos(radius)) * rng.random()
        theta = 2 * math.pi * rng.random()
        r = math.sqrt(max(0.0, 1 - h * h))
        # local frame
        x = np.cross(c, [0.0, 0.0, 1.0])
        if np.linalg.norm(x) < 1e-9:
            x = np.cross(c, [0.0, 1.0, 0.0])
        x /= np.linalg.norm(x)
        y = np.cross(c, x)
        return h * c + r * (math.cos(theta) * x + math.sin(theta) * y)

    loops = []
    shapes = []
    for i in range(60):
        loop_center = sample_in_cap(center, max_loop_radius)
        radius = rng.random() * max_loop_radius
        v = make_regular_points(loop_center, radius, 10)
        v = np.asarray(v, float)
        loop = Loop(v)
        loops.append(loop)
        shapes.append(
            Shape(i, 2, v, np.roll(v, -1, axis=0), polygon=Polygon([loop]))
        )
    q = ContainsPointQuery(shapes)  # default SEMI_OPEN, like S2Loop
    for _ in range(60):
        p = sample_in_cap(center, max_loop_radius)
        expected = [
            i for i, loop in enumerate(loops) if bool(loop.contains(p[None])[0])
        ]
        for i, loop in enumerate(loops):
            assert q.shape_contains(i, p) == bool(loop.contains(p[None])[0])
        assert q.get_containing_shape_ids(p) == expected


def test_visit_incident_edges():
    """VisitIncidentEdges (test.cc:196-204)."""
    shapes = parse_index("0:0 | 1:1 # 1:1, 1:2 # 1:2, 1:3, 2:2")
    q = ContainsPointQuery(shapes)

    def incident(p):
        out = []
        assert q.visit_incident_edges(
            p, lambda e: (out.append((e[0], e[1])), True)[1]
        )
        return out

    assert incident(pt("0:0")) == [(0, 0)]
    assert incident(pt("1:1")) == [(0, 1), (1, 0)]
    assert incident(pt("1:2")) == [(1, 0), (2, 0), (2, 2)]
    assert incident(pt("1:3")) == [(2, 0), (2, 1)]
    assert incident(pt("2:2")) == [(2, 1), (2, 2)]
