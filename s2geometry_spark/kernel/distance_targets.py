"""S2MinDistance / S2MaxDistance targets (s2min_distance_targets.h/.cc,
s2max_distance_targets.h/.cc): the pluggable "distance to a query
geometry" abstraction shared by the closest/furthest edge, cell, and
point queries.

Distances are squared chord lengths (S1ChordAngle::length2) wrapped in
MinDistance / MaxDistance value objects that implement the reference's
strict-improvement UpdateMin protocol:

  - MinDistance: update succeeds iff the new distance is strictly
    SMALLER (s2min_distance_targets.h:50-71).
  - MaxDistance: stores a chord but orders REVERSED, so UpdateMin
    succeeds iff the new distance is strictly LARGER; Zero() is the
    straight angle, Infinity() the negative chord, Negative() the
    infinite chord (s2max_distance_targets.h:196-232).

Each target implements GetCapBound (for max targets the cap bounds the
ANTIPODE of the target — the points at max-distance Zero),
update_to_point / update_to_edge / update_to_cell, and
visit_containing_shape_ids (VisitContainingShapeIds, which feeds the
include_interiors paths of the queries).

The distributed analogues are operators/closest_edges.py and
operators/knn.py; these kernels are the single-node contract used by
fixtures and per-partition logic.
"""

from __future__ import annotations

import math

import numpy as np

from . import predicates as P
from .cell import (
    Cell,
    _cell_vertices,
    cell_cell_distance2,
    cell_cell_max_distance2,
    cell_distance2,
    cell_edge_distance2,
    cell_edge_max_distance2,
    cell_point_max_distance2,
    edge_point_max_dist2,
)
from .cid import CID
from .closest_edge import Shape
from .contains_point import ContainsPointQuery
from .distance import chord2, point_edge_dist2
from .region import Cap

_INF = math.inf
_STRAIGHT = 4.0  # S1ChordAngle::Straight().length2()


# ------------------------------------------------------------- distances
class MinDistance:
    """S2MinDistance: an S1ChordAngle whose UpdateMin is strict-<."""

    def __init__(self, l2: float):
        self.l2 = float(l2)

    @classmethod
    def zero(cls) -> "MinDistance":
        return cls(0.0)

    @classmethod
    def infinity(cls) -> "MinDistance":
        return cls(_INF)

    @classmethod
    def negative(cls) -> "MinDistance":
        return cls(-1.0)

    def is_negative(self) -> bool:
        return self.l2 < 0

    def __lt__(self, other: "MinDistance") -> bool:
        return self.l2 < other.l2

    def __eq__(self, other) -> bool:
        return isinstance(other, MinDistance) and self.l2 == other.l2

    def update(self, new_l2: float) -> bool:
        """UpdateMin: strictly-smaller distances only."""
        if new_l2 < self.l2:
            self.l2 = float(new_l2)
            return True
        return False


class MaxDistance:
    """S2MaxDistance: chord with reversed ordering
    (s2max_distance_targets.h:196-232)."""

    def __init__(self, l2: float):
        self.l2 = float(l2)

    @classmethod
    def zero(cls) -> "MaxDistance":
        return cls(_STRAIGHT)  # Straight: "distance zero" for furthest

    @classmethod
    def infinity(cls) -> "MaxDistance":
        return cls(-1.0)  # chord Negative: any real distance improves

    @classmethod
    def negative(cls) -> "MaxDistance":
        return cls(_INF)  # chord Infinity: less than everything

    def __lt__(self, other: "MaxDistance") -> bool:
        # x < y iff x.chord > y.chord (reversed)
        return self.l2 > other.l2

    def __eq__(self, other) -> bool:
        return isinstance(other, MaxDistance) and self.l2 == other.l2

    def update(self, new_l2: float) -> bool:
        """UpdateMin in the reversed order: strictly-LARGER chords."""
        if new_l2 > self.l2:
            self.l2 = float(new_l2)
            return True
        return False


# ----------------------------------------------------- edge-pair helpers
def edge_pair_min_dist2(a0, a1, b0, b1) -> float:
    """UpdateEdgePairMinDistance (s2edge_distances.cc:327-351): 0 when
    the edges cross, else the best endpoint-to-edge distance."""
    if P.crossing_sign(a0, a1, b0, b1) >= 0:
        return 0.0
    ab_c = np.asarray([a0, a1], float)
    d1 = float(point_edge_dist2(ab_c, np.asarray(b0)[None],
                                np.asarray(b1)[None]).min())
    cd_c = np.asarray([b0, b1], float)
    d2 = float(point_edge_dist2(cd_c, np.asarray(a0)[None],
                                np.asarray(a1)[None]).min())
    return min(d1, d2)


def edge_pair_max_dist2(a0, a1, b0, b1) -> float:
    """UpdateEdgePairMaxDistance (s2edge_distances.cc:353-379): straight
    when edge a crosses the reflection of edge b, else the best
    endpoint max distance."""
    if P.crossing_sign(a0, a1, -np.asarray(b0, float),
                       -np.asarray(b1, float)) >= 0:
        return _STRAIGHT
    return max(
        edge_point_max_dist2(a0, b0, b1),
        edge_point_max_dist2(a1, b0, b1),
        edge_point_max_dist2(b0, a0, a1),
        edge_point_max_dist2(b1, a0, a1),
    )


def _edge_half_length_cap(a, b, negate: bool) -> Cap:
    """Cap centered at the edge midpoint with radius equal to half the
    edge length, computed stably (s2min_distance_targets.cc:71-78)."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    d2 = float(chord2(a, b))
    r2 = (0.5 * d2) / (1 + math.sqrt(max(0.0, 1 - 0.25 * d2)))
    mid = a + b
    mid = mid / np.linalg.norm(mid)
    return Cap(-mid if negate else mid, r2)


def cell_cap_bound(cell: Cell) -> Cap:
    """S2Cell::GetCapBound: center direction, radius covering the four
    vertices (s2cell.cc GetCapBound)."""
    c = cell.get_center()
    r2 = max(float(chord2(v, c)) for v in _cell_vertices(cell))
    return Cap(c, r2)


def _shapes_cap_bound(shapes: list[Shape], negate: bool) -> Cap:
    """Vertex cap over every edge endpoint (the ShapeRegion bound)."""
    cap = Cap.empty()
    for sh in shapes:
        for arr in (sh.edges_c, sh.edges_d):
            for p in np.asarray(arr, float).reshape(-1, 3):
                cap.add_point(p)
    if cap.is_empty():
        return cap
    grown = Cap.from_center_angle(
        -cap.center if negate else cap.center,
        min(math.pi, cap.radius_radians() * (1 + 1e-14) + 1e-15),
    )
    return grown


# ------------------------------------------------------------ visit core
def _visit_point(shapes: list[Shape], p, visitor, target_point) -> bool:
    """VisitContainingShapeIds for a point probe: containing shapes in
    index order, early exit when the visitor returns False."""
    q = ContainsPointQuery(shapes)
    return q.visit_containing_shapes(
        np.asarray(p, float),
        lambda s: visitor(s.shape_id, np.asarray(target_point, float)),
    )


def _target_index_chain_starts(shapes: list[Shape]):
    """One representative vertex per connected component of each target
    shape, plus the full-polygon special case
    (s2min_distance_targets.cc:277-315): yields (point, is_ref) pairs."""
    for sh in shapes:
        tested = False
        if sh.dim == 0:
            for p in np.asarray(sh.edges_c, float).reshape(-1, 3):
                tested = True
                yield p
        elif sh.dim == 1:
            if len(sh.edges_c):
                tested = True
                yield np.asarray(sh.edges_c[0], float)
        else:
            if sh.polygon is not None:
                for loop in sh.polygon.loops:
                    if loop.is_empty_or_full or len(loop.vertices) < 3:
                        continue
                    tested = True
                    yield np.asarray(loop.vertices[0], float)
            if not tested:
                # Empty/full polygons: visit the reference point only if
                # it is contained (i.e. the polygon is full),
                # s2min_distance_targets.cc:303-311.
                if sh.polygon is not None and sh.polygon.loops:
                    origin = _origin()
                    if sh.polygon.contains(origin[None])[0]:
                        yield origin


def _origin() -> np.ndarray:
    return P.ORIGIN.copy()


# ------------------------------------------------------------ min targets
class MinDistancePointTarget:
    """S2MinDistancePointTarget (s2min_distance_targets.cc:43-69)."""

    def __init__(self, point):
        self.point = np.asarray(point, float)

    def get_cap_bound(self) -> Cap:
        return Cap(self.point, 0.0)

    def update_to_point(self, p, dist: MinDistance) -> bool:
        return dist.update(float(chord2(np.asarray(p, float), self.point)))

    def update_to_edge(self, v0, v1, dist: MinDistance) -> bool:
        d2 = float(point_edge_dist2(self.point[None],
                                    np.asarray(v0, float)[None],
                                    np.asarray(v1, float)[None])[0, 0])
        return dist.update(d2)

    def update_to_cell(self, cell: Cell, dist: MinDistance) -> bool:
        return dist.update(cell_distance2(cell, self.point))

    def visit_containing_shape_ids(self, shapes, visitor) -> bool:
        return _visit_point(shapes, self.point, visitor, self.point)


class MinDistanceEdgeTarget:
    """S2MinDistanceEdgeTarget: tests the edge midpoint so AB and BA
    visit identically (s2min_distance_targets.cc:95-104)."""

    def __init__(self, a, b):
        self.a = np.asarray(a, float)
        self.b = np.asarray(b, float)

    def get_cap_bound(self) -> Cap:
        return _edge_half_length_cap(self.a, self.b, negate=False)

    def update_to_point(self, p, dist: MinDistance) -> bool:
        d2 = float(point_edge_dist2(np.asarray(p, float)[None],
                                    self.a[None], self.b[None])[0, 0])
        return dist.update(d2)

    def update_to_edge(self, v0, v1, dist: MinDistance) -> bool:
        return dist.update(edge_pair_min_dist2(self.a, self.b, v0, v1))

    def update_to_cell(self, cell: Cell, dist: MinDistance) -> bool:
        return dist.update(cell_edge_distance2(cell, self.a, self.b))

    def visit_containing_shape_ids(self, shapes, visitor) -> bool:
        mid = self.a + self.b
        mid = mid / np.linalg.norm(mid)
        return _visit_point(shapes, mid, visitor, mid)


class MinDistanceCellTarget:
    """S2MinDistanceCellTarget: visits shapes containing the cell
    CENTER (s2min_distance_targets.cc:130-143)."""

    def __init__(self, cell: Cell):
        self.cell = cell

    def get_cap_bound(self) -> Cap:
        return cell_cap_bound(self.cell)

    def update_to_point(self, p, dist: MinDistance) -> bool:
        return dist.update(cell_distance2(self.cell, np.asarray(p, float)))

    def update_to_edge(self, v0, v1, dist: MinDistance) -> bool:
        return dist.update(cell_edge_distance2(self.cell, v0, v1))

    def update_to_cell(self, cell: Cell, dist: MinDistance) -> bool:
        return dist.update(cell_cell_distance2(cell, self.cell))

    def visit_containing_shape_ids(self, shapes, visitor) -> bool:
        c = self.cell.get_center()
        return _visit_point(shapes, c, visitor, c)


class MinDistanceCellUnionTarget:
    """S2MinDistanceCellUnionTarget: distance to the nearest cell of
    the union; visits each cell's center point
    (s2min_distance_targets.cc:146-215)."""

    def __init__(self, cell_ids: list[CID]):
        self.cell_ids = sorted(cell_ids, key=lambda c: c.id)
        self._cells = [Cell(c) for c in self.cell_ids]
        self._use_brute_force = False

    # S2ClosestCellQuery options surface
    def use_brute_force(self) -> bool:
        return self._use_brute_force

    def set_use_brute_force(self, v: bool) -> None:
        self._use_brute_force = v

    def set_max_error(self, _l2: float) -> bool:
        return True  # may return suboptimal results

    def get_cap_bound(self) -> Cap:
        from .region import CellUnionRegion

        return CellUnionRegion(list(self.cell_ids)).get_cap_bound()

    def _update(self, d2s, dist: MinDistance) -> bool:
        if not d2s:
            return False
        return dist.update(min(d2s))

    def update_to_point(self, p, dist: MinDistance) -> bool:
        p = np.asarray(p, float)
        return self._update([cell_distance2(c, p) for c in self._cells], dist)

    def update_to_edge(self, v0, v1, dist: MinDistance) -> bool:
        return self._update(
            [cell_edge_distance2(c, v0, v1) for c in self._cells], dist
        )

    def update_to_cell(self, cell: Cell, dist: MinDistance) -> bool:
        return self._update(
            [cell_cell_distance2(cell, c) for c in self._cells], dist
        )

    def visit_containing_shape_ids(self, shapes, visitor) -> bool:
        for cid in self.cell_ids:
            p = Cell(cid).get_center()
            if not _visit_point(shapes, p, visitor, p):
                return False
        return True


class MinDistanceShapeIndexTarget:
    """S2MinDistanceShapeIndexTarget: distance to the nearest edge (or
    interior, when include_interiors) of a whole shape list
    (s2min_distance_targets.cc:217-315)."""

    def __init__(self, shapes: list[Shape], include_interiors: bool = True):
        self.shapes = shapes
        self._include_interiors = include_interiors
        self._use_brute_force = False

    def include_interiors(self) -> bool:
        return self._include_interiors

    def set_include_interiors(self, v: bool) -> None:
        self._include_interiors = v

    def use_brute_force(self) -> bool:
        return self._use_brute_force

    def set_use_brute_force(self, v: bool) -> None:
        self._use_brute_force = v

    def set_max_error(self, _l2: float) -> bool:
        return True

    def get_cap_bound(self) -> Cap:
        return _shapes_cap_bound(self.shapes, negate=False)

    def update_to_point(self, p, dist: MinDistance) -> bool:
        p = np.asarray(p, float)
        best = _INF
        for sh in self.shapes:
            if len(sh.edges_c):
                best = min(best, float(point_edge_dist2(
                    p[None], sh.edges_c, sh.edges_d).min()))
            if self._include_interiors and sh.polygon is not None:
                if sh.polygon.contains(p[None])[0]:
                    best = 0.0
        return dist.update(best) if best < _INF else False

    def update_to_edge(self, v0, v1, dist: MinDistance) -> bool:
        v0 = np.asarray(v0, float)
        v1 = np.asarray(v1, float)
        best = _INF
        for sh in self.shapes:
            for a, b in zip(sh.edges_c, sh.edges_d):
                best = min(best, edge_pair_min_dist2(a, b, v0, v1))
                if best == 0.0:
                    return dist.update(0.0)
            if self._include_interiors and sh.polygon is not None:
                if sh.polygon.contains(v0[None])[0]:
                    return dist.update(0.0)
        return dist.update(best) if best < _INF else False

    def update_to_cell(self, cell: Cell, dist: MinDistance) -> bool:
        best = _INF
        for sh in self.shapes:
            for a, b in zip(sh.edges_c, sh.edges_d):
                best = min(best, cell_edge_distance2(cell, a, b))
                if best == 0.0:
                    return dist.update(0.0)
            if self._include_interiors and sh.polygon is not None:
                if sh.polygon.contains(_cell_vertices(cell)).any():
                    return dist.update(0.0)
                for loop in sh.polygon.loops:
                    if not loop.is_empty_or_full and any(
                        cell.contains_point(v) for v in loop.vertices
                    ):
                        return dist.update(0.0)
        return dist.update(best) if best < _INF else False

    def visit_containing_shape_ids(self, shapes, visitor) -> bool:
        for p in _target_index_chain_starts(self.shapes):
            if not _visit_point(shapes, p, visitor, p):
                return False
        return True


# ------------------------------------------------------------ max targets
class MaxDistancePointTarget:
    """S2MaxDistancePointTarget (s2max_distance_targets.cc:41-74): caps
    and containment probes use the ANTIPODE."""

    def __init__(self, point):
        self.point = np.asarray(point, float)

    def get_cap_bound(self) -> Cap:
        return Cap(-self.point, 0.0)

    def update_to_point(self, p, dist: MaxDistance) -> bool:
        return dist.update(float(chord2(np.asarray(p, float), self.point)))

    def update_to_edge(self, v0, v1, dist: MaxDistance) -> bool:
        return dist.update(edge_point_max_dist2(self.point, v0, v1))

    def update_to_cell(self, cell: Cell, dist: MaxDistance) -> bool:
        return dist.update(cell_point_max_distance2(cell, self.point))

    def visit_containing_shape_ids(self, shapes, visitor) -> bool:
        return _visit_point(shapes, -self.point, visitor, self.point)


class MaxDistanceEdgeTarget:
    """S2MaxDistanceEdgeTarget (s2max_distance_targets.cc:76-126)."""

    def __init__(self, a, b):
        self.a = np.asarray(a, float)
        self.b = np.asarray(b, float)

    def get_cap_bound(self) -> Cap:
        return _edge_half_length_cap(self.a, self.b, negate=True)

    def update_to_point(self, p, dist: MaxDistance) -> bool:
        return dist.update(edge_point_max_dist2(p, self.a, self.b))

    def update_to_edge(self, v0, v1, dist: MaxDistance) -> bool:
        return dist.update(edge_pair_max_dist2(self.a, self.b, v0, v1))

    def update_to_cell(self, cell: Cell, dist: MaxDistance) -> bool:
        return dist.update(cell_edge_max_distance2(cell, self.a, self.b))

    def visit_containing_shape_ids(self, shapes, visitor) -> bool:
        mid = self.a + self.b
        mid = mid / np.linalg.norm(mid)
        return MaxDistancePointTarget(mid).visit_containing_shape_ids(
            shapes, visitor
        )


class MaxDistanceCellTarget:
    """S2MaxDistanceCellTarget (s2max_distance_targets.cc:128-160)."""

    def __init__(self, cell: Cell):
        self.cell = cell

    def get_cap_bound(self) -> Cap:
        cap = cell_cap_bound(self.cell)
        return Cap(-cap.center, cap.length2)

    def update_to_point(self, p, dist: MaxDistance) -> bool:
        return dist.update(cell_point_max_distance2(self.cell,
                                                    np.asarray(p, float)))

    def update_to_edge(self, v0, v1, dist: MaxDistance) -> bool:
        return dist.update(cell_edge_max_distance2(self.cell, v0, v1))

    def update_to_cell(self, cell: Cell, dist: MaxDistance) -> bool:
        return dist.update(cell_cell_max_distance2(self.cell, cell))

    def visit_containing_shape_ids(self, shapes, visitor) -> bool:
        c = self.cell.get_center()
        return MaxDistancePointTarget(c).visit_containing_shape_ids(
            shapes, visitor
        )


class MaxDistanceShapeIndexTarget:
    """S2MaxDistanceShapeIndexTarget (s2max_distance_targets.cc:162-270):
    the furthest edge of a whole shape list; include_interiors makes a
    polygon containing the probe's ANTIPODE a straight-angle hit."""

    def __init__(self, shapes: list[Shape], include_interiors: bool = True):
        self.shapes = shapes
        self._include_interiors = include_interiors
        self._use_brute_force = False

    def include_interiors(self) -> bool:
        return self._include_interiors

    def set_include_interiors(self, v: bool) -> None:
        self._include_interiors = v

    def use_brute_force(self) -> bool:
        return self._use_brute_force

    def set_use_brute_force(self, v: bool) -> None:
        self._use_brute_force = v

    def set_max_error(self, _l2: float) -> bool:
        return True

    def get_cap_bound(self) -> Cap:
        return _shapes_cap_bound(self.shapes, negate=True)

    def update_to_point(self, p, dist: MaxDistance) -> bool:
        p = np.asarray(p, float)
        best = -1.0
        for sh in self.shapes:
            for a, b in zip(sh.edges_c, sh.edges_d):
                best = max(best, edge_point_max_dist2(p, a, b))
            if self._include_interiors and sh.polygon is not None:
                if sh.polygon.contains((-p)[None])[0]:
                    best = _STRAIGHT
        return dist.update(best) if best >= 0 else False

    def update_to_edge(self, v0, v1, dist: MaxDistance) -> bool:
        best = -1.0
        for sh in self.shapes:
            for a, b in zip(sh.edges_c, sh.edges_d):
                best = max(best, edge_pair_max_dist2(a, b, v0, v1))
            if self._include_interiors and sh.polygon is not None:
                if sh.polygon.contains(
                    -np.asarray(v0, float)[None]
                )[0]:
                    best = _STRAIGHT
        return dist.update(best) if best >= 0 else False

    def update_to_cell(self, cell: Cell, dist: MaxDistance) -> bool:
        best = -1.0
        for sh in self.shapes:
            for a, b in zip(sh.edges_c, sh.edges_d):
                best = max(best, cell_edge_max_distance2(cell, a, b))
            if self._include_interiors and sh.polygon is not None:
                if sh.polygon.contains(-_cell_vertices(cell)).any():
                    best = _STRAIGHT
        return dist.update(best) if best >= 0 else False

    def visit_containing_shape_ids(self, shapes, visitor) -> bool:
        for p in _target_index_chain_starts(self.shapes):
            if not MaxDistancePointTarget(p).visit_containing_shape_ids(
                shapes, visitor
            ):
                return False
        return True
