"""S2PointVectorShape / S2EdgeVectorShape / S2WrappedShape and
s2shapeutil::EdgeIterator (s2point_vector_shape.h, s2edge_vector_shape.h,
s2wrapped_shape.h, s2shapeutil_edge_iterator.h/.cc): the vector-of-
geometry shape adapters and the flat edge iterator over an index."""

from __future__ import annotations

import numpy as np


class PointVectorShape:
    """S2PointVectorShape: each point is a degenerate edge forming its
    own chain (s2point_vector_shape.h:33-92)."""

    dim = 0

    def __init__(self, points=None):
        self.points = (np.asarray(points, dtype=np.float64).reshape(-1, 3)
                       if points is not None else np.zeros((0, 3)))

    def num_points(self) -> int:
        return len(self.points)

    def point(self, i: int) -> np.ndarray:
        return self.points[i]

    def num_edges(self) -> int:
        return len(self.points)

    def num_chains(self) -> int:
        return len(self.points)

    def dimension(self) -> int:
        return 0

    def is_empty(self) -> bool:
        return len(self.points) == 0

    def is_full(self) -> bool:
        return False

    def edge(self, e: int):
        return self.points[e], self.points[e]

    def chain(self, i: int) -> tuple[int, int]:
        return (i, 1)

    def chain_edge(self, i: int, j: int):
        assert j == 0
        return self.edge(i)

    def chain_position(self, e: int) -> tuple[int, int]:
        return (e, 0)

    def get_reference_point(self):
        return None, False

    def chains(self):
        return (self.chain(i) for i in range(self.num_chains()))

    def chain_vertices(self, chain: tuple[int, int]):
        """ChainVertexRange for dim 0: the single point."""
        start, _length = chain
        return [self.points[start]]


class EdgeVectorShape:
    """S2EdgeVectorShape: arbitrary unrelated edges, one chain each
    (s2edge_vector_shape.h:30-88)."""

    dim = 1

    def __init__(self, a=None, b=None):
        self._edges: list[tuple[np.ndarray, np.ndarray]] = []
        if a is not None:
            self.add(a, b)

    def add(self, a, b) -> None:
        self._edges.append(
            (np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64))
        )

    def num_edges(self) -> int:
        return len(self._edges)

    def num_chains(self) -> int:
        return len(self._edges)

    def dimension(self) -> int:
        return 1

    def is_empty(self) -> bool:
        return not self._edges

    def is_full(self) -> bool:
        return False

    def edge(self, e: int):
        return self._edges[e]

    def chain(self, i: int) -> tuple[int, int]:
        return (i, 1)

    def chain_edge(self, i: int, j: int):
        assert j == 0
        return self._edges[i]

    def chain_position(self, e: int) -> tuple[int, int]:
        return (e, 0)

    def get_reference_point(self):
        return None, False

    def chains(self):
        return (self.chain(i) for i in range(self.num_chains()))


class WrappedShape:
    """S2WrappedShape: delegate every S2Shape method to another shape
    without taking ownership (s2wrapped_shape.h:28-63)."""

    def __init__(self, shape):
        self._shape = shape

    def __getattr__(self, name):
        return getattr(self._shape, name)


class EdgeIterator:
    """s2shapeutil::EdgeIterator (s2shapeutil_edge_iterator.h): iterate
    every edge of every shape of an index in (shape_id, edge_id) order.
    The index is a list of objects with num_edges()/edge(e) (None
    entries are skipped, like released shapes)."""

    def __init__(self, index: list):
        self.index = index
        self.shape_pos = 0
        self.edge_pos = -1  # mirrors shape_id_=0, edge_id_=-1 + Next()
        self.num_edges_ = self._shape_edges(0)
        self.next()

    def _shape_edges(self, pos: int) -> int:
        if pos >= len(self.index) or self.index[pos] is None:
            return 0
        s = self.index[pos]
        return s.num_edges() if callable(getattr(s, "num_edges", None)) \
            else len(s.edges_c)

    def done(self) -> bool:
        return self.shape_pos >= len(self.index)

    def next(self) -> None:
        """Advance to the next valid (shape, edge) (cc:48-60)."""
        self.edge_pos += 1
        while self.edge_pos >= self.num_edges_:
            self.shape_pos += 1
            if self.shape_pos >= len(self.index):
                return
            self.edge_pos = 0
            self.num_edges_ = self._shape_edges(self.shape_pos)

    def shape_id(self) -> int:
        return self.shape_pos

    def edge_id(self) -> int:
        return self.edge_pos

    def shape_edge_id(self) -> tuple[int, int]:
        return (self.shape_pos, self.edge_pos)

    def edge(self):
        s = self.index[self.shape_pos]
        if callable(getattr(s, "edge", None)):
            return s.edge(self.edge_pos)
        return s.edges_c[self.edge_pos], s.edges_d[self.edge_pos]

    def __eq__(self, other) -> bool:
        if not isinstance(other, EdgeIterator):
            return NotImplemented
        return (self.index is other.index
                and self.shape_pos == other.shape_pos
                and self.edge_pos == other.edge_pos)

    def assign(self, other: "EdgeIterator") -> None:
        self.index = other.index
        self.shape_pos = other.shape_pos
        self.edge_pos = other.edge_pos
        self.num_edges_ = other.num_edges_
