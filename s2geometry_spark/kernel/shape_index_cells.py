"""S2ShapeIndexRegion over a kernel-side index-cell structure
(s2shape_index_region.h; mutable_s2shape_index.cc's ShrinkToFit +
max-edges-per-cell subdivision).

The engine replaces MutableS2ShapeIndex with DataFrame layouts at
scale; this module reproduces the reference's CELL STRUCTURE semantics
for region bounds — per face, shrink to the smallest cell containing
the clipped geometry, then subdivide while a cell holds more than
kMaxEdgesPerCell edges — so GetCellUnionBound / GetCapBound /
GetRectBound match the reference's outputs.
"""

from __future__ import annotations

import math

import numpy as np

from .cell import Cell, average_area, face_xyz_to_uv
from .cid import CID
from .clipping import clip_to_padded_face
from .coords import get_face
from .hilbert import from_face_ij
from .region import Cap, LatLngRect, ShapeRegion, cell_cap_bound

MAX_EDGES_PER_CELL = 10  # MutableS2ShapeIndex::Options default


def _face_rects(regions: list[ShapeRegion], face: int) -> list[tuple]:
    """Padded UV bounding rects of every edge/point clipped to `face`."""
    pad = ShapeRegion.PAD
    rects = []
    for r in regions:
        for a, b in r.edges:
            clipped = clip_to_padded_face(a, b, face, pad)
            if clipped is None:
                continue
            (u0, v0), (u1, v1) = clipped
            rects.append(
                (min(u0, u1), min(v0, v1), max(u0, u1), max(v0, v1))
            )
        for p in r.points:
            if int(get_face(np.array([p[0]]), np.array([p[1]]),
                            np.array([p[2]]))[0]) == face:
                u, v = face_xyz_to_uv(face, p)
                rects.append((u, v, u, v))
    return rects


def _leaf_from_uv(face: int, u: float, v: float) -> CID:
    """Leaf cell of the (clamped) UV point."""
    from .coords import st_to_ij, uv_to_st

    s = uv_to_st(np.clip(u, -1, 1))
    t = uv_to_st(np.clip(v, -1, 1))
    i = int(st_to_ij(s))
    j = int(st_to_ij(t))
    return CID(int(from_face_ij(np.array([face]), np.array([i]),
                                np.array([j]))[0]))


def _shrink_to_fit(face: int, rects: list[tuple]) -> CID:
    """The smallest cell whose bound contains all rects
    (mutable_s2shape_index.cc ShrinkToFit over the face)."""
    lo_u = min(r[0] for r in rects)
    lo_v = min(r[1] for r in rects)
    hi_u = max(r[2] for r in rects)
    hi_v = max(r[3] for r in rects)
    a = _leaf_from_uv(face, lo_u, lo_v)
    b = _leaf_from_uv(face, hi_u, hi_v)
    level = a.common_ancestor_level(b)
    if level < 0:
        return CID.from_face(face)
    return a.parent(level)


def _cell_rect_intersects(cell: Cell, rect: tuple) -> bool:
    u0, u1, v0, v1 = cell.get_bound_uv_expanded(ShapeRegion.PAD)
    return not (
        rect[2] < u0 or rect[0] > u1 or rect[3] < v0 or rect[1] > v1
    )


def build_index_cells(
    regions: list[ShapeRegion], max_edges: int = MAX_EDGES_PER_CELL
) -> list[CID]:
    """The index's cell ids: per face shrink-to-fit, then subdivide
    while a cell carries more than `max_edges` clipped edges."""
    out: list[CID] = []
    for face in range(6):
        rects = _face_rects(regions, face)
        if not rects:
            continue
        root = _shrink_to_fit(face, rects)

        def recurse(cid: CID, items: list[tuple]):
            if len(items) <= max_edges or cid.is_leaf():
                out.append(cid)
                return
            for k in range(4):
                child = cid.child(k)
                cell = Cell(child)
                sub = [r for r in items if _cell_rect_intersects(cell, r)]
                if sub:
                    recurse(child, sub)

        root_cell = Cell(root)
        recurse(root, [r for r in rects if _cell_rect_intersects(root_cell, r)])
    out.sort(key=lambda c: c.id)
    return out


def _cover_range(first: CID, last: CID, cell_ids: list[CID]) -> None:
    """CoverRange (s2shape_index_region.h:292-305): smallest cell
    covering the range [first, last]."""
    if first == last:
        cell_ids.append(first)
    else:
        level = first.common_ancestor_level(last)
        cell_ids.append(first.parent(level))


class IndexRegion:
    """S2ShapeIndexRegion semantics over a list of per-shape
    ShapeRegions."""

    def __init__(self, regions: list[ShapeRegion]):
        self.regions = regions
        self._index_cells: list[CID] | None = None

    def _cells(self) -> list[CID]:
        if self._index_cells is None:
            self._index_cells = build_index_cells(self.regions)
        return self._index_cells

    def get_cell_union_bound(self) -> list[CID]:
        """GetCellUnionBound (s2shape_index_region.h:233-288): one
        covering cell per spanned face-level cell, shrunk to the index
        cells it contains."""
        cells = self._cells()
        out: list[CID] = []
        if not cells:
            return out
        first_id, last_id = cells[0], cells[-1]
        i = 0
        if first_id != last_id:
            level = first_id.common_ancestor_level(last_id) + 1
            last_parent = last_id.parent(level)
            cid = first_id.parent(level)
            while cid != last_parent:
                if cells[i].id <= cid.range_max().id:
                    # find the range of index cells within cid
                    first = cells[i]
                    while (
                        i + 1 < len(cells)
                        and cells[i + 1].id <= cid.range_max().id
                    ):
                        i += 1
                    _cover_range(first, cells[i], out)
                    i += 1
                cid = cid.next()
        _cover_range(cells[i], last_id, out)
        return out

    def get_cap_bound(self) -> Cap:
        """GetCapBound = cell-union cap bound of GetCellUnionBound
        (s2cell_union.cc GetCapBound: area-weighted centroid, expanded
        to cover every cell's cap)."""
        covering = self.get_cell_union_bound()
        centroid = np.zeros(3)
        for cid in covering:
            area = average_area(cid.level())
            centroid = centroid + area * Cell(cid).get_center()
        n = np.linalg.norm(centroid)
        center = centroid / n if n > 0 else np.array([1.0, 0, 0])
        cap = Cap.from_point(center)
        for cid in covering:
            cap = cap.union(cell_cap_bound(Cell(cid)))
        return cap

    def get_rect_bound(self) -> LatLngRect:
        covering = self.get_cell_union_bound()
        rect = LatLngRect.empty()
        for cid in covering:
            rect = rect.union(Cell(cid).get_rect_bound())
        return rect

    def contains_cell(self, cell: Cell) -> bool:
        """Contains (h): true if ANY single shape contains the cell."""
        return any(r.contains_cell(cell) for r in self.regions)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return any(r.may_intersect_cell(cell) for r in self.regions)

    def visit_intersecting_shape_ids(self, cell: Cell, visitor) -> bool:
        """VisitIntersectingShapeIds: (shape_id, contains_target) per
        intersecting shape; stops early when the visitor returns
        False."""
        for shape_id, r in enumerate(self.regions):
            if r.may_intersect_cell(cell):
                if not visitor(shape_id, r.contains_cell(cell)):
                    return False
        return True
