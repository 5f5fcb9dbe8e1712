"""Ports of s2point_vector_shape_test.cc, s2edge_vector_shape_test.cc,
s2wrapped_shape_test.cc, and s2shapeutil_edge_iterator_test.cc."""

import numpy as np
import pytest

from s2geometry_spark.kernel.closest_edge import parse_index
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.shapeutil import LaxPolygon
from s2geometry_spark.kernel.vector_shapes import (
    EdgeIterator,
    EdgeVectorShape,
    PointVectorShape,
    WrappedShape,
)


def _random_points(n, seed):
    rng = np.random.RandomState(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


# ---- S2PointVectorShape (s2point_vector_shape_test.cc) ----


def test_point_vector_empty():
    shape = PointVectorShape()
    assert shape.num_edges() == 0
    assert shape.num_chains() == 0
    assert shape.dimension() == 0
    assert shape.is_empty()
    assert not shape.is_full()
    assert shape.get_reference_point() == (None, False)


def test_point_vector_construction_and_access():
    points = _random_points(100, 7)
    shape = PointVectorShape(points)
    assert shape.num_edges() == 100
    assert shape.num_chains() == 100
    assert shape.dimension() == 0
    assert not shape.is_empty()
    assert not shape.is_full()
    for i in range(100):
        assert shape.chain(i) == (i, 1)
        v0, v1 = shape.edge(i)
        assert np.array_equal(v0, points[i])
        assert np.array_equal(v1, points[i])
        assert np.array_equal(shape.point(i), points[i])


def test_point_vector_chain_iterator():
    """ChainIteratorWorks (s2point_vector_shape_test.cc:98-124)."""
    empty = PointVectorShape()
    shape = PointVectorShape(parse_points("0:0, 0:1, 1:1"))

    assert list(empty.chains()) == []
    chain_counter = 0
    for chain in shape.chains():
        assert chain == (chain_counter, 1)
        chain_counter += 1
    assert chain_counter == 3


def test_point_vector_chain_vertex_iterator():
    """ChainVertexIteratorWorks (s2point_vector_shape_test.cc:126-153)."""
    points = parse_points("0:0, 0:1, 1:1")
    shape = PointVectorShape(points)
    for ci, chain in enumerate(shape.chains()):
        vertices = shape.chain_vertices(chain)
        assert len(vertices) == 1
        assert np.array_equal(vertices[0], points[ci])


# ---- S2EdgeVectorShape (s2edge_vector_shape_test.cc) ----


def test_edge_vector_empty():
    shape = EdgeVectorShape()
    assert shape.num_edges() == 0
    assert shape.num_chains() == 0
    assert shape.dimension() == 1
    assert shape.is_empty()
    assert not shape.is_full()
    assert shape.get_reference_point() == (None, False)


def test_edge_vector_edge_access():
    shape = EdgeVectorShape()
    pts = _random_points(200, 11)
    edges = [(pts[2 * i], pts[2 * i + 1]) for i in range(100)]
    for a, b in edges:
        shape.add(a, b)
    assert shape.num_edges() == 100
    assert shape.num_chains() == 100
    assert shape.dimension() == 1
    assert not shape.is_empty()
    assert not shape.is_full()
    for i in range(100):
        assert shape.chain(i) == (i, 1)
        v0, v1 = shape.edge(i)
        assert np.array_equal(v0, edges[i][0])
        assert np.array_equal(v1, edges[i][1])


def test_edge_vector_singleton_constructor():
    a = np.array([1.0, 0, 0])
    b = np.array([0.0, 1, 0])
    shape = EdgeVectorShape(a, b)
    assert shape.num_edges() == 1
    assert shape.num_chains() == 1
    assert not shape.is_empty()
    assert not shape.is_full()
    v0, v1 = shape.edge(0)
    assert np.array_equal(v0, a)
    assert np.array_equal(v1, b)


# ---- S2WrappedShape (s2wrapped_shape_test.cc) ----


def test_wrapped_shape_coverage():
    """All shape methods delegate (s2wrapped_shape_test.cc:27-33)."""
    shape = LaxPolygon([parse_points("0:0"),
                        parse_points("1:1, 1:2, 2:1")])
    wrapped = WrappedShape(shape)
    assert wrapped.num_edges() == shape.num_edges()
    assert wrapped.num_chains() == shape.num_chains()
    assert wrapped.dim == shape.dim
    assert wrapped.chain_lengths() == shape.chain_lengths()
    for (a0, b0), (a1, b1) in zip(wrapped.edges(), shape.edges()):
        assert np.array_equal(a0, a1) and np.array_equal(b0, b1)


# ---- s2shapeutil::EdgeIterator (s2shapeutil_edge_iterator_test.cc) ----


def _get_edges(index):
    out = []
    for shape in index:
        if shape is None:
            continue
        for j in range(len(shape.edges_c)):
            out.append((shape.edges_c[j], shape.edges_d[j]))
    return out


def _verify(index):
    """Verify() (s2shapeutil_edge_iterator_test.cc:36-57)."""
    expected = _get_edges(index)
    i = 0
    shape_id = -1
    edge_id = -1
    it = EdgeIterator(index)
    while not it.done():
        if it.shape_id() != shape_id:
            shape_id = it.shape_id()
            edge_id = 0
        assert i < len(expected)
        v0, v1 = it.edge()
        assert np.array_equal(v0, expected[i][0])
        assert np.array_equal(v1, expected[i][1])
        assert it.edge_id() == edge_id
        assert it.shape_edge_id() == (shape_id, edge_id)
        it.next()
        edge_id += 1
        i += 1
    assert i == len(expected)


@pytest.mark.parametrize("dsl", [
    "##",
    "0:0|1:1##",
    "#0:0,10:10|5:5,5:10|1:2,2:1#",
    "##10:10,10:0,0:0|-10:-10,-10:0,0:0,0:-10",
    "1:1|7:2#1:1,2:2,3:3|2:2,1:7#"
    "10:10,10:0,0:0;20:20,20:10,10:10|15:15,15:0,0:0",
])
def test_edge_iterator(dsl):
    _verify(parse_index(dsl))


def test_edge_iterator_remove():
    """Released shapes are skipped
    (s2shapeutil_edge_iterator_test.cc:96-103)."""
    index = parse_index(
        "1:1|7:2#1:1,2:2,3:3|2:2,1:7#"
        "10:10,10:0,0:0;20:20,20:10,10:10|15:15,15:0,0:0")
    index[0] = None
    _verify(index)


def test_edge_iterator_assignment_and_equality():
    """s2shapeutil_edge_iterator_test.cc:105-127."""
    dsl = ("1:1|7:2#1:1,2:2,3:3|2:2,1:7#"
           "10:10,10:0,0:0;20:20,20:10,10:10|15:15,15:0,0:0")
    index1 = parse_index(dsl)
    index2 = parse_index(dsl)
    it1 = EdgeIterator(index1)
    it2 = EdgeIterator(index2)
    assert it1 != it2  # different indices
    it1.assign(it2)
    assert it1 == it2
    it1.next()
    assert it1 != it2
    it2.next()
    assert it1 == it2
