"""S2ContainsPointQuery with the three vertex models
(s2contains_point_query.h:60-231): OPEN excludes all vertices,
SEMI_OPEN contains vertices per the S2::VertexCrossing convention
(exactly one of the polygons sharing a vertex contains it), CLOSED
contains every boundary vertex.
"""

from __future__ import annotations

import numpy as np

from . import predicates as P
from .closest_edge import Shape
from .shapeutil import LaxPolygon, get_reference_point

OPEN = "open"
SEMI_OPEN = "semi_open"
CLOSED = "closed"


def _shape_loops(shape: Shape) -> list[np.ndarray]:
    if shape.polygon is not None:
        loops = []
        for l in shape.polygon.loops:
            if l.is_empty_or_full:
                # Translate the S2Loop sentinels to the lax convention:
                # full loop → empty chain (LaxPolygon full); the empty
                # loop contributes nothing.
                if l.origin_inside:
                    loops.append(np.zeros((0, 3)))
                continue
            loops.append(l.vertices)
        return loops
    return []


def shape_contains_point(shape: Shape, p: np.ndarray, model: str = SEMI_OPEN) -> bool:
    """ShapeContains (s2contains_point_query.h:167-200): crossing parity
    from a reference point with known containment, with the vertex-model
    special cases applied on degenerate crossings."""
    if shape.dim < 2:
        # Points and polylines are ignored unless the model is CLOSED,
        # in which case p is contained iff it matches a vertex
        # (s2contains_point_query.h:286-296).
        if model != CLOSED:
            return False
        p = np.asarray(p, float)
        return any(
            np.array_equal(v0, p) or np.array_equal(v1, p)
            for v0, v1 in zip(shape.edges_c, shape.edges_d)
        )
    loops = _shape_loops(shape)
    lax = LaxPolygon(loops)
    ref, ref_inside = get_reference_point(lax)
    if ref is None:
        return ref_inside  # empty or full polygon
    p = np.asarray(p, float)
    if np.array_equal(p, ref):
        # the reference point is a shape vertex: model decides
        if model == OPEN:
            return False
        if model == CLOSED:
            return True
        return ref_inside
    inside = ref_inside
    for v0, v1 in lax.edges():
        sign = P.crossing_sign(ref, p, v0, v1)
        if sign < 0:
            continue
        if sign == 0:
            # For OPEN and CLOSED, check whether p is a vertex.
            if model != SEMI_OPEN and (
                np.array_equal(v0, p) or np.array_equal(v1, p)
            ):
                return model == CLOSED
            sign = int(P.vertex_crossing(ref, p, v0, v1))
        inside ^= bool(sign)
    return inside


class ContainsPointQuery:
    """S2ContainsPointQuery over a list of closest_edge.Shape."""

    def __init__(self, shapes: list[Shape], vertex_model: str = SEMI_OPEN):
        self.shapes = shapes
        self.vertex_model = vertex_model

    def contains(self, p: np.ndarray) -> bool:
        """Contains(p): true if ANY indexed shape contains p."""
        return any(
            shape_contains_point(s, p, self.vertex_model) for s in self.shapes
        )

    def shape_contains(self, shape_id: int, p: np.ndarray) -> bool:
        for s in self.shapes:
            if s.shape_id == shape_id:
                return shape_contains_point(s, p, self.vertex_model)
        raise KeyError(shape_id)

    def visit_containing_shapes(self, p: np.ndarray, visitor) -> bool:
        """VisitContainingShapes: stops early when the visitor returns
        False (h:117-130)."""
        for s in self.shapes:
            if shape_contains_point(s, p, self.vertex_model):
                if not visitor(s):
                    return False
        return True

    def get_containing_shape_ids(self, p: np.ndarray) -> list[int]:
        return [
            s.shape_id
            for s in self.shapes
            if shape_contains_point(s, p, self.vertex_model)
        ]

    def visit_incident_edges(self, p: np.ndarray, visitor) -> bool:
        """VisitIncidentEdges (h:132-144): every edge with p as an
        endpoint, as (shape_id, edge_id, v0, v1), in index order."""
        p = np.asarray(p, float)
        for s in self.shapes:
            for eid, (v0, v1) in enumerate(zip(s.edges_c, s.edges_d)):
                if np.array_equal(v0, p) or np.array_equal(v1, p):
                    if not visitor((s.shape_id, eid, v0, v1)):
                        return False
        return True
