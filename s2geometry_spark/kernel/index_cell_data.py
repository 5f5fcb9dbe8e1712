"""Decoded-cell cache for shape-index cells — internal/s2index_cell_data.h/.cc.

S2IndexCellData wraps one loaded S2ShapeIndexCell and materializes its
clipped edges (with edge/chain ids) grouped by shape dimension, caching
the S2Cell instance and center point so repeated per-cell queries (the
validation query's per-cell passes) do no redundant decoding.  Dimensions
can be toggled off before LoadCell to skip decoding entirely.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .cell import Cell
from .cid import CID
from .predicates import crossing_sign, vertex_crossing

OPEN, SEMI_OPEN, CLOSED = 0, 1, 2  # S2VertexModel


@dataclass
class EdgeAndIdChain:
    """S2Shape::Edge + edge id, chain id, chain offset
    (s2index_cell_data.h:84-104)."""

    v0: np.ndarray
    v1: np.ndarray
    id: int
    chain: int
    offset: int


class IndexCellData:
    """internal::S2IndexCellData (s2index_cell_data.h:79-272)."""

    def __init__(self) -> None:
        self._index = None
        self._cell_id: CID | None = None
        self._clipped: list | None = None
        self._dim_wanted = [True, True, True]
        self._s2cell: Cell | None = None
        self._center: np.ndarray | None = None
        self._edges: list[EdgeAndIdChain] = []
        self._shape_regions: list[tuple[int, tuple[int, int]]] = []
        self._dim_regions = [(0, 0), (0, 0), (0, 0)]

    # ----------------------------------------------------------- options
    def dim_wanted(self, dim: int) -> bool:
        return self._dim_wanted[dim]

    def set_dim_wanted(self, dim: int, wanted: bool) -> None:
        self._dim_wanted[dim] = wanted

    # --------------------------------------------------------- accessors
    def index(self):
        return self._index

    def id(self) -> CID:
        return self._cell_id

    def cell(self) -> Cell:
        """S2Cell for the current cell, computed lazily (h:143-154)."""
        if self._s2cell is None:
            self._s2cell = Cell(self._cell_id)
        return self._s2cell

    def center(self) -> np.ndarray:
        """Cell center point, computed lazily (h:157-168)."""
        if self._center is None:
            from . import cellid as ci

            x, y, z = ci.to_point(np.array([self._cell_id.id], dtype=np.uint64))
            self._center = np.array([float(x[0]), float(y[0]), float(z[0])])
        return self._center

    def num_clipped(self) -> int:
        return len(self._clipped)

    def clipped_shapes(self) -> list:
        return self._clipped

    def shape(self, clipped) -> object:
        return self._index.shapes[clipped[0]]

    # ------------------------------------------------------------ loading
    def load_cell(self, index, cid: CID, clipped: list) -> None:
        """LoadCell (s2index_cell_data.cc:30-116).  `clipped` is the
        MutableIndex cell payload: [(shape_id, contains_center,
        edge_ids), ...].  A repeated (index, id) load is a no-op."""
        if self._index is index and self._cell_id == cid:
            return
        self._index = index
        self._cell_id = cid
        self._clipped = clipped
        self._s2cell = None
        self._center = None
        self._edges = []
        self._shape_regions = []
        self._dim_regions = [(0, 0), (0, 0), (0, 0)]

        dims_on = [d for d in range(3) if self._dim_wanted[d]]
        if not dims_on:
            return
        for dim in range(dims_on[0], dims_on[-1] + 1):
            dim_start = len(self._edges)
            for shape_id, _contains_center, edge_ids in clipped:
                shape = index.shapes[shape_id]
                if shape.dimension() != dim or not self._dim_wanted[dim]:
                    continue
                shape_start = len(self._edges)
                for edge_id in edge_ids:
                    chain_id, offset = shape.chain_position(edge_id)
                    v0, v1 = shape.chain_edge(chain_id, offset)
                    self._edges.append(
                        EdgeAndIdChain(v0, v1, edge_id, chain_id, offset))
                self._shape_regions.append(
                    (shape_id, (shape_start, len(self._edges) - shape_start)))
            self._dim_regions[dim] = (dim_start, len(self._edges) - dim_start)

    # -------------------------------------------------------------- views
    def shape_edges(self, shape_id: int) -> list[EdgeAndIdChain]:
        """Edges of one shape in the current cell (cc:118-130)."""
        for sid, (start, size) in self._shape_regions:
            if sid == shape_id:
                return self._edges[start:start + size]
        return []

    def dim_edges(self, dim: int) -> list[EdgeAndIdChain]:
        """Edges of all shapes of one dimension (cc:132-140)."""
        start, size = self._dim_regions[dim]
        return self._edges[start:start + size]

    def dim_range_edges(self, dim0: int, dim1: int) -> list[EdgeAndIdChain]:
        """Edges for an inclusive dimension range (cc:142-159)."""
        assert 0 <= dim0 <= dim1 <= 2
        start = self._dim_regions[dim0][0]
        size = 0
        for dim in range(dim0, dim1 + 1):
            start = min(start, self._dim_regions[dim][0])
            size += self._dim_regions[dim][1]
        return self._edges[start:start + size]

    # -------------------------------------------------------- containment
    def shape_contains(self, clipped, point: np.ndarray,
                       model: int = OPEN) -> bool:
        """ShapeContains (cc:161-208): center→point crossing parity over
        this cell's edges only.  REQUIRES point inside the current cell."""
        shape = self._index.shapes[clipped[0]]
        if shape.dimension() < 2:
            if model != CLOSED:
                return False
            return any(
                np.array_equal(e.v0, point) or np.array_equal(e.v1, point)
                for e in self.shape_edges(clipped[0]))
        center = self.center()
        inside = bool(clipped[1])
        for e in self.shape_edges(clipped[0]):
            sign = crossing_sign(center, point, e.v0, e.v1)
            if sign < 0:
                continue
            if sign == 0:
                if model != SEMI_OPEN and (
                        np.array_equal(e.v0, point)
                        or np.array_equal(e.v1, point)):
                    return model == CLOSED
                sign = vertex_crossing(center, point, e.v0, e.v1)
            inside ^= bool(sign)
        return inside
