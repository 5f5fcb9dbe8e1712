"""Port of s2lax_polygon_shape_test.cc / s2lax_polyline_shape_test.cc /
s2lax_loop_shape_test.cc (the geometry surface; Move semantics and the
encoder/decoder/fuzz cases are C++-specific — Parquet is the
encoding)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import predicates as P
from s2geometry_spark.kernel.contains import Loop, parse_points
from s2geometry_spark.kernel.fractal import Fractal, make_regular_points
from s2geometry_spark.kernel.shapeutil import (
    LaxClosedPolyline,
    LaxPolygon,
    LaxPolyline,
    contains_brute_force,
    get_reference_point,
    lax_loop_shape,
    vertex_id_lax_loop_shape,
)


def test_empty_polygon():
    """test.cc:147-163."""
    shape = LaxPolygon([])
    assert shape.num_loops() == 0
    assert shape.num_vertices() == 0
    assert shape.num_edges() == 0
    assert shape.num_chains() == 0
    assert shape.dimension() == 2
    assert shape.is_empty()
    assert not shape.is_full()
    assert not get_reference_point(shape)[1]


def test_full_polygon():
    """test.cc:201-212."""
    shape = LaxPolygon([np.empty((0, 3))])
    assert shape.num_loops() == 1
    assert shape.num_vertices() == 0
    assert shape.num_edges() == 0
    assert shape.num_chains() == 1
    assert shape.dimension() == 2
    assert not shape.is_empty()
    assert shape.is_full()
    assert get_reference_point(shape)[1]


def test_single_vertex_polygon():
    """test.cc:214-235."""
    loops = [parse_points("0:0")]
    shape = LaxPolygon(loops)
    assert shape.num_loops() == 1
    assert shape.num_vertices() == 1
    assert shape.num_edges() == 1
    assert shape.num_chains() == 1
    assert shape.chain(0) == (0, 1)
    v0, v1 = shape.edge(0)
    assert np.array_equal(v0, loops[0][0])
    assert np.array_equal(v1, loops[0][0])
    c0, c1 = shape.chain_edge(0, 0)
    assert np.array_equal(v0, c0) and np.array_equal(v1, c1)
    assert shape.dimension() == 2
    assert not shape.is_empty()
    assert not shape.is_full()
    assert not get_reference_point(shape)[1]


def test_single_loop_polygon():
    """test.cc:237-262."""
    vertices = parse_points("0:0, 0:1, 1:1, 1:0")
    shape = LaxPolygon([vertices])
    n = len(vertices)
    assert shape.num_loops() == 1
    assert shape.num_vertices() == n
    assert shape.num_loop_vertices(0) == n
    assert shape.num_edges() == n
    assert shape.num_chains() == 1
    assert shape.chain(0) == (0, n)
    for i in range(n):
        assert np.array_equal(vertices[i], shape.loop_vertex(0, i))
        v0, v1 = shape.edge(i)
        assert np.array_equal(vertices[i], v0)
        assert np.array_equal(vertices[(i + 1) % n], v1)
        c0, c1 = shape.chain_edge(0, i)
        assert np.array_equal(v0, c0) and np.array_equal(v1, c1)
    assert shape.dimension() == 2
    assert not shape.is_empty()
    assert not shape.is_full()
    assert not contains_brute_force(shape, P.ORIGIN)


def test_multi_loop_polygon():
    """test.cc:264-295."""
    loops = [
        parse_points("0:0, 0:3, 3:3"),  # CCW
        parse_points("1:1, 2:2, 1:2"),  # CW
    ]
    shape = LaxPolygon(loops)
    assert shape.num_loops() == len(loops)
    assert shape.num_chains() == len(loops)
    num_vertices = 0
    for i, loop in enumerate(loops):
        assert shape.num_loop_vertices(i) == len(loop)
        assert shape.chain(i) == (num_vertices, len(loop))
        for j in range(len(loop)):
            assert np.array_equal(loop[j], shape.loop_vertex(i, j))
            v0, v1 = shape.edge(num_vertices + j)
            assert np.array_equal(loop[j], v0)
            assert np.array_equal(loop[(j + 1) % len(loop)], v1)
        num_vertices += len(loop)
    assert shape.num_vertices() == num_vertices
    assert shape.num_edges() == num_vertices
    assert shape.dimension() == 2
    assert not shape.is_empty()
    assert not shape.is_full()
    assert not contains_brute_force(shape, P.ORIGIN)


def test_many_loop_polygon():
    """ManyLoopPolygon (test.cc:311-357): chain_position for every edge,
    in order and shuffled."""
    rng = np.random.default_rng(20260818)
    loops = []
    for i in range(100):
        center = parse_points(f"0:{i}")[0]
        n = int(rng.integers(0, 3))
        if n == 0:
            loops.append(np.empty((0, 3)))
        else:
            loops.append(
                np.asarray(
                    make_regular_points(center, math.radians(0.1), max(n, 3))
                )[: max(n, 0)]
            )
    shape = LaxPolygon(loops)
    assert shape.num_loops() == len(loops)
    assert shape.num_chains() == len(loops)
    num_vertices = 0
    edges = []
    for i, loop in enumerate(loops):
        assert shape.num_loop_vertices(i) == len(loop)
        assert shape.chain(i) == (num_vertices, len(loop))
        for j in range(len(loop)):
            e = num_vertices + j
            edges.append((e, i, j))
            assert shape.chain_position(e) == (i, j)
            v0, v1 = shape.edge(e)
            assert np.array_equal(loop[j], v0)
            assert np.array_equal(loop[(j + 1) % len(loop)], v1)
        num_vertices += len(loop)
    assert shape.num_vertices() == num_vertices
    assert shape.num_edges() == num_vertices
    rng.shuffle(edges)
    for e, i, j in edges:
        assert shape.chain_position(e) == (i, j)
        v0, v1 = shape.edge(e)
        assert np.array_equal(loops[i][j], v0)
        assert np.array_equal(loops[i][(j + 1) % len(loops[i])], v1)


def test_degenerate_loops():
    """test.cc:360-368."""
    loops = [
        parse_points("1:1, 1:2, 2:2, 1:2, 1:3, 1:2, 1:1"),
        parse_points("0:0, 0:3, 0:6, 0:9, 0:6, 0:3, 0:0"),
        parse_points("5:5, 6:6"),
    ]
    shape = LaxPolygon(loops)
    assert not get_reference_point(shape)[1]


def test_inverted_loops():
    """test.cc:370-377."""
    loops = [
        parse_points("1:2, 1:1, 2:2"),
        parse_points("3:4, 3:3, 4:4"),
    ]
    shape = LaxPolygon(loops)
    assert contains_brute_force(shape, P.ORIGIN)


def test_compare_to_s2loop():
    """CompareToS2Loop (test.cc:379-411, 40 iterations): lax containment
    matches S2Loop::Contains on random fractal loops."""
    rng = np.random.default_rng(99)
    for _ in range(40):
        fractal = Fractal(rng)
        fractal.set_max_level(int(rng.integers(0, 5)))
        fractal.set_fractal_dimension(1 + rng.uniform(0, 1))
        center = rng.standard_normal(3)
        center /= np.linalg.norm(center)
        x = np.cross(center, rng.standard_normal(3))
        x /= np.linalg.norm(x)
        y = np.cross(center, x)
        frame = np.column_stack([x, y, center])
        loop_obj = fractal.make_loop(frame, math.radians(5))
        vertices = np.asarray(loop_obj.vertices, float)
        loop = Loop(vertices)
        shape = LaxPolygon([vertices])
        # sample points from the loop's neighborhood
        for _i in range(40):
            p = center + 0.2 * rng.standard_normal(3)
            p /= np.linalg.norm(p)
            assert bool(loop.contains(p[None])[0]) == contains_brute_force(
                shape, p
            )


# ----------------------------------------------------- lax polyline


def test_polyline_no_vertices():
    """s2lax_polyline_shape_test.cc:36-45."""
    shape = LaxPolyline(np.empty((0, 3)))
    assert shape.num_edges() == 0
    assert shape.num_chains() == 0
    assert shape.dimension() == 1
    assert not shape.get_reference_point()[1]


def test_polyline_one_vertex():
    """test.cc:47-55."""
    shape = LaxPolyline(parse_points("0:0"))
    assert shape.num_edges() == 0
    assert shape.num_chains() == 0
    assert shape.dimension() == 1


def test_polyline_edge_access():
    """test.cc:83-99."""
    vertices = parse_points("0:0, 0:1, 1:1")
    shape = LaxPolyline(vertices)
    assert shape.num_edges() == 2
    assert shape.num_chains() == 1
    assert shape.chain(0) == (0, 2)
    assert shape.dimension() == 1
    v0, v1 = shape.edge(0)
    assert np.array_equal(v0, vertices[0])
    assert np.array_equal(v1, vertices[1])
    v0, v1 = shape.edge(1)
    assert np.array_equal(v0, vertices[1])
    assert np.array_equal(v1, vertices[2])


# ----------------------------------------------------- lax loop


def test_lax_loop_empty():
    """s2lax_loop_shape_test.cc:39-50."""
    shape = lax_loop_shape(np.empty((0, 3)))
    assert shape.num_edges() == 0
    # NOTE: a 0-vertex chain in LaxPolygon means FULL; S2LaxLoopShape's
    # empty loop is the EMPTY polygon — construct without loops
    empty = LaxPolygon([])
    assert empty.num_edges() == 0
    assert empty.dimension() == 2
    assert not get_reference_point(empty)[1]


def test_lax_loop_non_empty():
    """test.cc:78-98."""
    vertices = parse_points("0:0, 0:1, 1:1, 1:0")
    shape = lax_loop_shape(vertices)
    assert shape.num_vertices() == len(vertices)
    assert shape.num_edges() == len(vertices)
    assert shape.num_chains() == 1
    assert shape.chain(0) == (0, len(vertices))
    for i in range(len(vertices)):
        assert np.array_equal(shape.loop_vertex(0, i), vertices[i])
        v0, v1 = shape.edge(i)
        assert np.array_equal(v0, vertices[i])
        assert np.array_equal(v1, vertices[(i + 1) % len(vertices)])
    assert shape.dimension() == 2
    assert not contains_brute_force(shape, P.ORIGIN)


def test_lax_closed_polyline_no_interior():
    """test.cc:100-108."""
    vertices = parse_points("0:0, 0:1, 1:1, 1:0")
    shape = LaxClosedPolyline(vertices)
    assert shape.dimension() == 1
    assert not shape.get_reference_point()[1]


def test_vertex_id_lax_loop_empty():
    """test.cc:110-119."""
    shape = vertex_id_lax_loop_shape([], np.empty((0, 3)))
    assert shape.num_edges() == 0
    assert shape.num_loop_vertices(0) == 0


def test_vertex_id_lax_loop_inverted():
    """InvertedLoop (test.cc:148-163): vertex ids traversing a loop
    backwards invert the interior."""
    vertex_array = parse_points("0:0, 0:1, 1:1, 1:0")
    vertex_ids = [0, 3, 2, 1]  # reversed
    shape = vertex_id_lax_loop_shape(vertex_ids, vertex_array)
    assert shape.num_edges() == 4
    assert shape.num_loop_vertices(0) == 4
    assert np.array_equal(shape.loop_vertex(0, 0), vertex_array[0])
    assert np.array_equal(shape.loop_vertex(0, 1), vertex_array[3])
    assert np.array_equal(shape.loop_vertex(0, 2), vertex_array[2])
    assert np.array_equal(shape.loop_vertex(0, 3), vertex_array[1])
    assert contains_brute_force(shape, P.ORIGIN)
