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


# ---------------------------------------------------------------------------
# S2Polygon loop-depth machinery: InitNested / InitOriented / Invert and the
# depth-aware FindValidationError (s2polygon.cc:255-296, 300-390, 429-520).
# The even-odd Polygon above is depth-free; these helpers carry the explicit
# depth values that S2Polygon validates (depth contiguity, hole orientation
# consistency) before handing topology to the legacy validation query.

POLYGON_INVALID_LOOP_DEPTH = "POLYGON_INVALID_LOOP_DEPTH"


class DepthLoop:
    """One S2Polygon loop with its explicit nesting depth.

    `orig_origin_inside` records the loop's origin containment as GIVEN
    (before any normalization) — InitOriented's consistency check compares
    it against the post-normalization state (s2polygon.cc:498-516)."""

    def __init__(self, vertices: np.ndarray, depth: int = 0):
        self.loop = Loop(vertices)
        self.depth = depth
        self.orig_origin_inside = self.loop.origin_inside

    @property
    def vertices(self) -> np.ndarray:
        return self.loop.vertices

    @property
    def is_hole(self) -> bool:
        return (self.depth & 1) == 1

    def invert(self) -> None:
        """S2Loop::Invert (s2loop.cc:379) in place."""
        from .looprel import invert as _invert

        self.loop = _invert(self.loop)


class NestedPolygon:
    """S2Polygon's loop list in preorder with explicit depths."""

    def __init__(self, loops: list[DepthLoop],
                 inconsistent_orientations: bool = False):
        self.loops = loops
        self.inconsistent_orientations = inconsistent_orientations

    @property
    def is_empty(self) -> bool:
        return not self.loops

    @property
    def is_full(self) -> bool:
        return len(self.loops) == 1 and self.loops[0].loop.is_full

    def last_descendant(self, i: int) -> int:
        """S2Polygon::GetLastDescendant (s2polygon.h): the last loop whose
        depth exceeds loop i's depth in the contiguous preorder block."""
        d = self.loops[i].depth
        j = i + 1
        while j < len(self.loops) and self.loops[j].depth > d:
            j += 1
        return j - 1


def init_nested(vertex_loops: list[np.ndarray]) -> NestedPolygon:
    """S2Polygon::InitNested via InsertLoop/InitLoops
    (s2polygon.cc:300-390): find each loop's most-nested container with
    ContainsNested, re-parent any children it now encloses, then assign
    depths by preorder DFS.  Empty loops are dropped (InitNested does the
    same before indexing)."""
    from .looprel import contains_nested

    dls = [DepthLoop(v) for v in vertex_loops]
    dls = [d for d in dls if not (d.loop.is_empty or len(d.vertices) == 0)]
    children: dict[int | None, list[int]] = {None: []}
    for idx in range(len(dls)):
        children[idx] = []
        parent: int | None = None
        done = False
        while not done:
            kids = children[parent]
            done = True
            for c in kids:
                if contains_nested(dls[c].loop, dls[idx].loop):
                    parent = c
                    done = False
                    break
        kids = children[parent]
        mine = [c for c in kids if contains_nested(dls[idx].loop, dls[c].loop)]
        children[idx] = mine
        children[parent] = [c for c in kids if c not in mine] + [idx]

    ordered: list[DepthLoop] = []

    def dfs(node: int | None, depth: int) -> None:
        for c in children[node]:
            dls[c].depth = depth
            ordered.append(dls[c])
            dfs(c, depth + 1)

    dfs(None, 0)
    return NestedPolygon(ordered)


def invert_nested(poly: NestedPolygon) -> None:
    """S2Polygon::Invert (s2polygon.cc): invert the minimal-curvature
    top-level shell; its former siblings become its descendants (+1
    depth) and its former children become top-level (-1 depth).  Ties
    break deterministically (the reference uses CompareLoops; vertex
    bytes serve the same purpose here)."""
    from .measures import loop_curvature

    if poly.is_empty:
        poly.loops = [DepthLoop(np.array([[0.0, 0.0, -1.0]]))]  # full
        return
    if poly.is_full:
        poly.loops = []
        return
    best = 0
    best_angle = None
    for i in range(1, len(poly.loops)):
        if poly.loops[i].depth == 0:
            if best_angle is None:
                best_angle = loop_curvature(poly.loops[best].vertices)
            angle = loop_curvature(poly.loops[i].vertices)
            if angle < best_angle or (
                angle == best_angle
                and poly.loops[i].vertices.tobytes()
                < poly.loops[best].vertices.tobytes()
            ):
                best = i
                best_angle = angle
    poly.loops[best].invert()
    last_best = poly.last_descendant(best)
    new_loops = [poly.loops[best]]
    for i, dl in enumerate(poly.loops):
        if i < best or i > last_best:
            dl.depth += 1
            new_loops.append(dl)
    for i in range(best + 1, last_best + 1):
        poly.loops[i].depth -= 1
        new_loops.append(poly.loops[i])
    poly.loops = new_loops


def init_oriented(vertex_loops: list[np.ndarray]) -> NestedPolygon:
    """S2Polygon::InitOriented (s2polygon.cc:429-520): loop orientation
    is meaningful (interior on the left).  Normalize loops to be
    nestable (invert negative-curvature loops; near-zero-curvature loops
    are inverted iff they contain the origin), InitNested, then invert
    the whole polygon if the origin-adjacent loop's containment parity
    flipped.  Sets inconsistent_orientations when some original loop was
    inverted XOR it now represents a hole — the
    POLYGON_INCONSISTENT_LOOP_ORIENTATIONS condition."""
    from .measures import curvature_max_error, loop_curvature

    dls = [DepthLoop(v) for v in vertex_loops]
    dls = [d for d in dls if not (d.loop.is_empty or len(d.vertices) == 0)]
    for dl in dls:
        angle = loop_curvature(dl.vertices)
        if abs(angle) > curvature_max_error(dl.vertices):
            if angle < 0:
                dl.invert()
        elif dl.loop.origin_inside:
            dl.invert()

    poly = init_nested([dl.vertices for dl in dls])
    # re-attach the pre-normalization origin states by vertex identity
    by_key = {dl.vertices.tobytes(): dl.orig_origin_inside for dl in dls}
    for dl in poly.loops:
        dl.orig_origin_inside = by_key[dl.vertices.tobytes()]

    if poly.loops:
        origin_loop = poly.loops[0]
        polygon_contains_origin = False
        for dl in poly.loops:
            if dl.loop.origin_inside:
                polygon_contains_origin ^= True
                origin_loop = dl
        if origin_loop.orig_origin_inside != polygon_contains_origin:
            invert_nested(poly)

    for dl in poly.loops:
        was_inverted = dl.orig_origin_inside != dl.loop.origin_inside
        if was_inverted != dl.is_hole:
            poly.inconsistent_orientations = True
    return poly


def polygon_find_validation_error_nested(poly: NestedPolygon) -> str:
    """S2Polygon::FindValidationError (s2polygon.cc:255-296): depth
    values must be non-negative and never skip a level; vertices must be
    unit length; InitOriented's inconsistent-orientation flag is an
    error; everything else is delegated to the legacy validation query
    over the polygon's lax shape.  Returns an error code, or OK."""
    from .valid_query import (
        NOT_UNIT_LENGTH,
        OK,
        POLYGON_INCONSISTENT_LOOP_ORIENTATIONS,
        LegacyValidQuery,
        is_unit_length,
        lax_polygon_vshape,
    )

    last_depth = -1
    for dl in poly.loops:
        if dl.depth < 0 or dl.depth > last_depth + 1:
            return POLYGON_INVALID_LOOP_DEPTH
        last_depth = dl.depth
        for v in dl.vertices:
            if not is_unit_length(v):
                return NOT_UNIT_LENGTH
    if poly.inconsistent_orientations:
        return POLYGON_INCONSISTENT_LOOP_ORIENTATIONS
    # S2Polygon::Shape presents hole loops REVERSED (oriented_vertex,
    # s2polygon.h:207-213 via chain_edge:913-917) so the interior is on
    # the left of every emitted edge regardless of stored winding.
    ok, code = LegacyValidQuery().validate(
        [lax_polygon_vshape([
            dl.vertices[::-1] if dl.is_hole else dl.vertices
            for dl in poly.loops
        ])]
    )
    return OK if ok else code
