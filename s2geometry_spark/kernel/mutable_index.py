"""Exact MutableS2ShapeIndex construction (mutable_s2shape_index.cc).

Reproduces the reference's index-cell decomposition bit-for-bit for the
initial-build case: per-face exact edge clipping with the padded-cell
recursion (UpdateEdges, mutable_s2shape_index.cc:1380-1516), interior
tracking along the Hilbert curve (InteriorTracker,
mutable_s2shape_index.cc:351-446), the ShrinkToFit/SkipCellRange face
optimization (cc:1260-1356), and the short-edge subdivision rule in
MakeIndexCell (cc:1709-1925).

The DISTRIBUTED shape index (operators/shape_index.py) keeps its
conservative-superset cell layout — correct and partition-friendly for
queries at scale.  This kernel exists where bit-parity with the
reference matters: the index WIRE FORMAT (kernel/shape_index_coding.py
encodes these cells byte-for-byte per the reference's
MutableS2ShapeIndex::Encode) and fixture parity with
encoded_s2shape_index_test.cc / mutable_s2shape_index_test.cc.

Shapes are kernel shape objects (LaxPolygon / LaxPolyline /
PointVectorShape / EdgeVectorShape …): anything with `.dim`,
`.num_edges()` and an `.edges()` iterator (edge ids are enumeration
order).  A None entry reproduces a released shape id.
"""

from __future__ import annotations

import math

import numpy as np

from . import coords
from .cellunion import from_begin_end
from .cid import CID
from .clipping import (
    EDGE_CLIP_ERROR_UV_COORD,
    FACE_CLIP_ERROR_UV_COORD,
    clip_to_padded_face,
    interpolate_double,
)
from .metrics import AVG_EDGE
from .padded_cell import PaddedCell
from .predicates import edge_or_vertex_crossing
from .shapeutil import contains_brute_force

# kCellPadding (mutable_s2shape_index.cc:183-184)
CELL_PADDING = 2 * (FACE_CLIP_ERROR_UV_COORD + EDGE_CLIP_ERROR_UV_COORD)
MAX_EDGES_PER_CELL = 10  # FLAGS_s2shape_index_default_max_edges_per_cell
MIN_SHORT_EDGE_FRACTION = 0.2  # FLAGS_s2shape_index_min_short_edge_fraction
CELL_SIZE_TO_LONG_EDGE_RATIO = 1.0
MAX_LEVEL = 30


class _FaceEdge:
    __slots__ = ("shape_id", "edge_id", "max_level", "has_interior",
                 "a", "b", "v0", "v1")

    def __init__(self, shape_id, edge_id, max_level, has_interior, v0, v1):
        self.shape_id = shape_id
        self.edge_id = edge_id
        self.max_level = max_level
        self.has_interior = has_interior
        self.v0 = v0
        self.v1 = v1
        self.a = None  # (u, v) endpoints on the current face
        self.b = None


class _ClippedEdge:
    __slots__ = ("face_edge", "bound")

    def __init__(self, face_edge, bound):
        self.face_edge = face_edge
        self.bound = bound  # ((u_lo, u_hi), (v_lo, v_hi))


def _tracker_origin() -> np.ndarray:
    """InteriorTracker::Origin (cc:355-358): the start of the Hilbert
    curve, FaceUVtoXYZ(0, -1, -1).Normalize()."""
    x, y, z = coords.face_uv_to_xyz(
        np.array([0]), np.array([-1.0]), np.array([-1.0]))
    p = np.array([x[0], y[0], z[0]])
    return p / np.linalg.norm(p)


class InteriorTracker:
    """InteriorTracker (mutable_s2shape_index.cc:351-446): tracks which
    shapes contain the focus point as it moves along the Hilbert curve
    (entry vertex → cell center → exit vertex), toggling on
    EdgeOrVertexCrossing."""

    def __init__(self) -> None:
        self.is_active = False
        self.a = None
        self.b = _tracker_origin()
        self.next_cellid = CID.from_face(0).child_begin(MAX_LEVEL)
        self.shape_ids: list[int] = []

    def focus(self) -> np.ndarray:
        return self.b

    def add_shape(self, shape_id: int, contains_focus: bool) -> None:
        self.is_active = True
        if contains_focus:
            self.toggle_shape(shape_id)

    def toggle_shape(self, shape_id: int) -> None:
        if shape_id in self.shape_ids:
            self.shape_ids.remove(shape_id)
        else:
            self.shape_ids.append(shape_id)
            self.shape_ids.sort()

    def move_to(self, b: np.ndarray) -> None:
        self.b = b

    def draw_to(self, b: np.ndarray) -> None:
        self.a = self.b
        self.b = b

    def test_edge(self, shape_id: int, v0, v1) -> None:
        if edge_or_vertex_crossing(self.a, self.b, v0, v1):
            self.toggle_shape(shape_id)

    def at_cellid(self, cellid: CID) -> bool:
        return cellid.range_min().id == self.next_cellid.id

    def set_next_cellid(self, next_cellid: CID) -> None:
        self.next_cellid = next_cellid.range_min()


def _shape_edges(shape):
    """Edges in edge-id order: the shape's edges() iterator when it has
    one, else edge(e) for e in range(num_edges())."""
    if hasattr(shape, "edges"):
        yield from shape.edges()
    else:
        for e in range(shape.num_edges()):
            yield shape.edge(e)


def _copy_face_edge(fe: _FaceEdge) -> _FaceEdge:
    e = _FaceEdge(fe.shape_id, fe.edge_id, fe.max_level, fe.has_interior,
                  fe.v0, fe.v1)
    return e


def _rect_from_points(a, b):
    return ((min(a[0], b[0]), max(a[0], b[0])),
            (min(a[1], b[1]), max(a[1], b[1])))


def _project(interval, x: float) -> float:
    lo, hi = interval
    return max(lo, min(hi, x))


class MutableIndex:
    """The initial-build subset of MutableS2ShapeIndex: Add() shapes,
    then cells() returns the exact reference decomposition as a sorted
    list of (cell_id: CID, clipped) where clipped is a list of
    (shape_id, contains_center, edge_ids tuple)."""

    def __init__(self, max_edges_per_cell: int = MAX_EDGES_PER_CELL) -> None:
        self.shapes: list = []
        self.max_edges_per_cell = max_edges_per_cell
        self._cells: list | None = None

    def add(self, shape) -> int:
        self.shapes.append(shape)
        self._cells = None
        return len(self.shapes) - 1

    def release(self, shape_id: int) -> None:
        """Reference Release(): the slot keeps its id but holds no shape."""
        self.shapes[shape_id] = None
        self._cells = None

    def num_shape_ids(self) -> int:
        return len(self.shapes)

    # -------------------------------------------------------- build
    def cells(self):
        if self._cells is None:
            self._cells = self._build()
        return self._cells

    def _build(self):
        tracker = InteriorTracker()
        all_edges: list[list[_FaceEdge]] = [[] for _ in range(6)]
        for shape_id, shape in enumerate(self.shapes):
            if shape is None:
                continue
            has_interior = getattr(shape, "dim", 2) == 2
            if has_interior:
                tracker.add_shape(
                    shape_id, contains_brute_force(shape, tracker.focus()))
            self._add_shape_edges(shape_id, shape, has_interior, all_edges)

        self._cell_map: list = []
        for face in range(6):
            self._update_face_edges(face, all_edges[face], tracker)
        self._cell_map.sort(key=lambda kv: kv[0].id)
        return self._cell_map

    def _add_shape_edges(self, shape_id: int, shape, has_interior: bool,
                         all_edges: list) -> None:
        """AddShape + AddFaceEdge (cc:1007-1196) with the per-edge math
        vectorized across the whole shape: one get_face / ValidFaceXYZtoUV
        / ilogb pass for all edges, then a cheap append loop that keeps
        the reference's edge ordering (fast path appends directly; the
        rare face-crossing edges clip to all six padded faces)."""
        edges = list(_shape_edges(shape))
        if not edges:
            return
        V0 = np.asarray([e[0] for e in edges], dtype=np.float64)
        V1 = np.asarray([e[1] for e in edges], dtype=np.float64)
        fa = coords.get_face(V0[:, 0], V0[:, 1], V0[:, 2])
        fb = coords.get_face(V1[:, 0], V1[:, 1], V1[:, 2])
        # GetEdgeMaxLevel vectorized: -ilogb(norm * ratio / kAvgEdge)
        norms = np.linalg.norm(V0 - V1, axis=1) \
            * CELL_SIZE_TO_LONG_EDGE_RATIO
        with np.errstate(divide="ignore", invalid="ignore"):
            _m, exp = np.frexp(np.abs(norms / AVG_EDGE.deriv))
        max_levels = np.where(norms > 0,
                              np.clip(-(exp - 1), 0, MAX_LEVEL), MAX_LEVEL)
        # fast-path UVs on the shared face (junk where fa != fb — the
        # divisions there can overflow/NaN, masked out below)
        same = fa == fb
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            au, av = coords.valid_face_xyz_to_uv(
                fa, V0[:, 0], V0[:, 1], V0[:, 2])
            bu, bv = coords.valid_face_xyz_to_uv(
                fa, V1[:, 0], V1[:, 1], V1[:, 2])
        max_uv = 1 - CELL_PADDING
        with np.errstate(invalid="ignore"):
            fast = same & (np.abs(au) <= max_uv) & (np.abs(av) <= max_uv) \
                & (np.abs(bu) <= max_uv) & (np.abs(bv) <= max_uv)
        for edge_id in range(len(edges)):
            fe = _FaceEdge(shape_id, edge_id, int(max_levels[edge_id]),
                           has_interior, V0[edge_id], V1[edge_id])
            if fast[edge_id]:
                fe.a = (float(au[edge_id]), float(av[edge_id]))
                fe.b = (float(bu[edge_id]), float(bv[edge_id]))
                all_edges[int(fa[edge_id])].append(fe)
            else:
                for face in range(6):
                    clipped = clip_to_padded_face(
                        fe.v0, fe.v1, face, CELL_PADDING)
                    if clipped is not None:
                        e = _copy_face_edge(fe)
                        e.a = (float(clipped[0][0]), float(clipped[0][1]))
                        e.b = (float(clipped[1][0]), float(clipped[1][1]))
                        all_edges[face].append(e)

    def _update_face_edges(self, face: int, face_edges: list,
                           tracker: InteriorTracker) -> None:
        """UpdateFaceEdges (cc:1260-1316), initial-build case (the index
        is empty, so every cell is disjoint from it)."""
        if not face_edges and not tracker.shape_ids:
            return
        clipped_edges = []
        bound = None
        for fe in face_edges:
            ce = _ClippedEdge(fe, _rect_from_points(fe.a, fe.b))
            clipped_edges.append(ce)
            if bound is None:
                bound = (ce.bound[0], ce.bound[1])
            else:
                bound = (
                    (min(bound[0][0], ce.bound[0][0]),
                     max(bound[0][1], ce.bound[0][1])),
                    (min(bound[1][0], ce.bound[1][0]),
                     max(bound[1][1], ce.bound[1][1])),
                )
        face_id = CID.from_face(face)
        pcell = PaddedCell(face_id, CELL_PADDING)
        if face_edges:
            shrunk_id = pcell.shrink_to_fit(bound)
            if shrunk_id.id != pcell.id.id:
                self._skip_cell_range(
                    face_id.range_min(), shrunk_id.range_min(), tracker)
                self._update_edges(
                    PaddedCell(shrunk_id, CELL_PADDING), clipped_edges,
                    tracker)
                self._skip_cell_range(
                    shrunk_id.range_max().next(),
                    face_id.range_max().next(), tracker)
                return
        self._update_edges(pcell, clipped_edges, tracker)

    def _skip_cell_range(self, begin: CID, end: CID,
                         tracker: InteriorTracker) -> None:
        """SkipCellRange (cc:1337-1353)."""
        if not tracker.shape_ids:
            return
        for skipped in from_begin_end(begin, end):
            self._update_edges(
                PaddedCell(skipped, CELL_PADDING), [], tracker)

    def _update_edges(self, pcell: PaddedCell, edges: list,
                      tracker: InteriorTracker) -> None:
        """UpdateEdges (cc:1380-1516), no absorb (initial build)."""
        if self._make_index_cell(pcell, edges, tracker):
            return
        child_edges = [[[], []], [[], []]]  # [i][j]
        middle = pcell.middle()
        mid_u, mid_v = middle[0], middle[1]
        for edge in edges:
            if edge.bound[0][1] <= mid_u[0]:
                self._clip_v_axis(edge, mid_v, child_edges[0])
            elif edge.bound[0][0] >= mid_u[1]:
                self._clip_v_axis(edge, mid_v, child_edges[1])
            elif edge.bound[1][1] <= mid_v[0]:
                child_edges[0][0].append(
                    self._clip_u_bound(edge, 1, mid_u[1]))
                child_edges[1][0].append(
                    self._clip_u_bound(edge, 0, mid_u[0]))
            elif edge.bound[1][0] >= mid_v[1]:
                child_edges[0][1].append(
                    self._clip_u_bound(edge, 1, mid_u[1]))
                child_edges[1][1].append(
                    self._clip_u_bound(edge, 0, mid_u[0]))
            else:
                left = self._clip_u_bound(edge, 1, mid_u[1])
                self._clip_v_axis(left, mid_v, child_edges[0])
                right = self._clip_u_bound(edge, 0, mid_u[0])
                self._clip_v_axis(right, mid_v, child_edges[1])
        for pos in range(4):
            i, j = pcell.get_child_ij(pos)
            if child_edges[i][j] or tracker.shape_ids:
                self._update_edges(
                    PaddedCell.child_of(pcell, i, j), child_edges[i][j],
                    tracker)

    def _clip_v_axis(self, edge: _ClippedEdge, middle, child_edges) -> None:
        """ClipVAxis (cc:1357-1373)."""
        if edge.bound[1][1] <= middle[0]:
            child_edges[0].append(edge)
        elif edge.bound[1][0] >= middle[1]:
            child_edges[1].append(edge)
        else:
            child_edges[0].append(self._clip_v_bound(edge, 1, middle[1]))
            child_edges[1].append(self._clip_v_bound(edge, 0, middle[0]))

    def _clip_u_bound(self, edge: _ClippedEdge, u_end: int,
                      u: float) -> _ClippedEdge:
        """ClipUBound (cc:1523-1548)."""
        if u_end == 0:
            if edge.bound[0][0] >= u:
                return edge
        else:
            if edge.bound[0][1] <= u:
                return edge
        e = edge.face_edge
        v = _project(edge.bound[1],
                     interpolate_double(u, e.a[0], e.b[0], e.a[1], e.b[1]))
        v_end = u_end ^ int((e.a[0] > e.b[0]) != (e.a[1] > e.b[1]))
        return self._update_bound(edge, u_end, u, v_end, v)

    def _clip_v_bound(self, edge: _ClippedEdge, v_end: int,
                      v: float) -> _ClippedEdge:
        """ClipVBound (cc:1553-1566)."""
        if v_end == 0:
            if edge.bound[1][0] >= v:
                return edge
        else:
            if edge.bound[1][1] <= v:
                return edge
        e = edge.face_edge
        u = _project(edge.bound[0],
                     interpolate_double(v, e.a[1], e.b[1], e.a[0], e.b[0]))
        u_end = v_end ^ int((e.a[0] > e.b[0]) != (e.a[1] > e.b[1]))
        return self._update_bound(edge, u_end, u, v_end, v)

    @staticmethod
    def _update_bound(edge: _ClippedEdge, u_end: int, u: float,
                      v_end: int, v: float) -> _ClippedEdge:
        """UpdateBound (cc:1571-1586)."""
        bu = [edge.bound[0][0], edge.bound[0][1]]
        bv = [edge.bound[1][0], edge.bound[1][1]]
        bu[u_end] = u
        bv[v_end] = v
        return _ClippedEdge(edge.face_edge, (tuple(bu), tuple(bv)))

    def _make_index_cell(self, pcell: PaddedCell, edges: list,
                         tracker: InteriorTracker) -> bool:
        """MakeIndexCell (cc:1709-1925): short-edge subdivision rule,
        entry→center→exit interior tracking, merged clipped shapes."""
        if not edges and not tracker.shape_ids:
            return True
        if len(edges) > self.max_edges_per_cell:
            max_short_edges = max(
                self.max_edges_per_cell,
                int(MIN_SHORT_EDGE_FRACTION
                    * (len(edges) + len(tracker.shape_ids))))
            count = 0
            for edge in edges:
                count += pcell.level < edge.face_edge.max_level
                if count > max_short_edges:
                    return False

        if tracker.is_active and edges:
            if not tracker.at_cellid(pcell.id):
                tracker.move_to(pcell.get_entry_vertex())
            tracker.draw_to(pcell.get_center())
            self._test_all_edges(edges, tracker)

        cshape_ids = list(tracker.shape_ids)  # sorted
        clipped_shapes = []
        enext = 0
        cnext = 0
        n_edges = len(edges)
        while enext < n_edges or cnext < len(cshape_ids):
            eshape_id = edges[enext].face_edge.shape_id \
                if enext < n_edges else len(self.shapes)
            cshape_id = cshape_ids[cnext] \
                if cnext < len(cshape_ids) else len(self.shapes)
            if cshape_id < eshape_id:
                clipped_shapes.append((cshape_id, True, ()))
                cnext += 1
            else:
                ebegin = enext
                while (enext < n_edges
                       and edges[enext].face_edge.shape_id == eshape_id):
                    enext += 1
                edge_ids = tuple(
                    edges[e].face_edge.edge_id for e in range(ebegin, enext))
                contains_center = cshape_id == eshape_id
                if contains_center:
                    cnext += 1
                clipped_shapes.append(
                    (eshape_id, contains_center, edge_ids))
        self._cell_map.append((pcell.id, clipped_shapes))

        if tracker.is_active and edges:
            tracker.draw_to(pcell.get_exit_vertex())
            self._test_all_edges(edges, tracker)
            tracker.set_next_cellid(pcell.id.next())
        return True

    @staticmethod
    def _test_all_edges(edges: list, tracker: InteriorTracker) -> None:
        """TestAllEdges (cc:1929-1937)."""
        for edge in edges:
            fe = edge.face_edge
            if fe.has_interior:
                tracker.test_edge(fe.shape_id, fe.v0, fe.v1)


def get_crossing_candidates(index: "MutableIndex", a: np.ndarray,
                            b: np.ndarray) -> list[tuple[int, int]]:
    """S2CrossingEdgeQuery::GetCandidates (s2crossing_edge_query.h:47-92)
    over the exact index: every (shape_id, edge_id) stored in an index
    cell whose PADDED uv bound the query edge intersects.  The padding
    (kCellPadding, mutable_s2shape_index.h) is what guarantees no true
    crossing is ever missed — the PerturbedCubeEdges tests fail without
    it."""
    from .cell import Cell
    from .clipping import clip_to_padded_face, intersects_rect

    a = np.asarray(a, np.float64).reshape(3)
    b = np.asarray(b, np.float64).reshape(3)
    cand: set[tuple[int, int]] = set()
    by_face: dict[int, tuple] = {}
    for cid, clipped in index.cells():
        face = cid.face()
        if face not in by_face:
            by_face[face] = clip_to_padded_face(a, b, face, CELL_PADDING)
        uv = by_face[face]
        if uv is None:
            continue
        cell = Cell(cid)
        rect = (cell.u_lo - CELL_PADDING, cell.u_hi + CELL_PADDING,
                cell.v_lo - CELL_PADDING, cell.v_hi + CELL_PADDING)
        if not intersects_rect(uv[0], uv[1], rect):
            continue
        for shape_id, _cc, edge_ids in clipped:
            for e in edge_ids:
                cand.add((shape_id, int(e)))
    return sorted(cand)
