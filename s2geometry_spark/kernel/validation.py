"""Geometry validation (S2ValidationQuery / FindValidationError analog,
s2validation_query.h, s2polygon.h:229-238): structural checks on loops
and polygons before they enter the join/covering machinery."""

from __future__ import annotations

import numpy as np

from . import predicates as P
from .contains import Loop, Polygon


def find_loop_validation_error(vertices: np.ndarray) -> str | None:
    """None if valid; else a message.  Checks (s2loop.cc FindValidationError):
    vertex count, unit length, duplicate adjacent vertices, antipodal
    adjacent vertices (degenerate edges), and edge self-intersection."""
    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    if len(v) == 1:
        return None  # empty/full sentinel
    if len(v) < 3:
        return "loop has fewer than 3 vertices"
    norms = (v * v).sum(1)
    if np.abs(norms - 1.0).max() > 5e-14:
        return "vertex not unit length"
    nxt = np.roll(v, -1, axis=0)
    if (v == nxt).all(axis=1).any():
        return "duplicate adjacent vertices"
    if (v == -nxt).all(axis=1).any():
        return "adjacent antipodal vertices (degenerate edge)"
    # self-intersection: any proper crossing between non-adjacent edges
    n = len(v)
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue  # adjacent edges share a vertex
            cs = P.crossing_sign(v[i], nxt[i], v[j], nxt[j])
            if cs > 0:
                return f"edges {i} and {j} cross"
    return None


def find_polygon_validation_error(poly: Polygon) -> str | None:
    """Per-loop checks + pairwise loop boundary crossings (loops of a
    valid polygon may share boundaries but must not properly cross)."""
    for li, loop in enumerate(poly.loops):
        err = find_loop_validation_error(loop.vertices)
        if err is not None:
            return f"loop {li}: {err}"
    from .relations import _proper_crossing

    # loops may share vertices but not edges: if any loop contains edge
    # AB, no loop may contain AB or BA (s2polygon.cc FindValidationError
    # / s2shapeutil::FindDuplicateEdges semantics)
    seen: set[tuple[bytes, bytes]] = set()
    for li, loop in enumerate(poly.loops):
        v = loop.vertices
        if loop.is_empty_or_full or len(v) < 3:
            continue
        for k in range(len(v)):
            a, b = v[k].tobytes(), v[(k + 1) % len(v)].tobytes()
            if (a, b) in seen or (b, a) in seen:
                return f"loop {li}: duplicate edge"
            seen.add((a, b))

    for i in range(len(poly.loops)):
        for j in range(i + 1, len(poly.loops)):
            a = Polygon([poly.loops[i]])
            b = Polygon([poly.loops[j]])
            if _proper_crossing(a, b):
                return f"loops {i} and {j} cross"
    return None
