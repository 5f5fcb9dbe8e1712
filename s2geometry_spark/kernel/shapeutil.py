"""s2shapeutil reference-point + brute-force containment
(s2shapeutil_get_reference_point.cc, s2shapeutil_contains_brute_force.cc)
over lax polygon shapes (vertex-list loops, degenerate edges allowed,
the empty loop meaning "full").
"""

from __future__ import annotations

import numpy as np

from .predicates import ContainsVertexQuery, signed_edge_or_vertex_crossing
from .predicates import edge_or_vertex_crossing


class LaxPolygon:
    """S2LaxPolygonShape: loops as raw vertex lists; every consecutive
    pair (wrapping) is an edge, so 2-vertex loops give sibling pairs
    and 1-vertex loops give a degenerate edge; a 0-vertex loop denotes
    the full polygon (chain with no edges)."""

    dim = 2

    def __init__(self, loops: list):
        self.loops = [np.asarray(l, float).reshape(-1, 3) for l in loops]

    def edges(self):
        for loop in self.loops:
            n = len(loop)
            for i in range(n):
                yield loop[i], loop[(i + 1) % n]

    def num_edges(self) -> int:
        return sum(len(l) for l in self.loops)

    def num_chains(self) -> int:
        return len(self.loops)

    def chain_lengths(self):
        return [len(l) for l in self.loops]


def _reference_point_at_vertex(shape: LaxPolygon, vtest: np.ndarray):
    """GetReferencePointAtVertex (cc:15-32)."""
    q = ContainsVertexQuery(vtest)
    for v0, v1 in shape.edges():
        if np.array_equal(v0, vtest):
            q.add_edge(v1, 1)
        if np.array_equal(v1, vtest):
            q.add_edge(v0, -1)
    s = q.contains_sign()
    if s == 0:
        return None
    return vtest, s > 0


def get_reference_point(shape: LaxPolygon):
    """GetReferencePoint (cc:34-81) → (point, contained); point is None
    for the empty/full conventions."""
    if shape.num_edges() == 0:
        return None, shape.num_chains() > 0
    first_edge = next(iter(shape.edges()))
    got = _reference_point_at_vertex(shape, first_edge[0])
    if got is not None:
        return got
    edges = [(tuple(a), tuple(b)) for a, b in shape.edges()]
    rev = sorted((b, a) for a, b in edges)
    fwd = sorted(edges)
    for e_f, e_r in zip(fwd, rev):
        if e_f < e_r:
            got = _reference_point_at_vertex(shape, np.array(e_f[0]))
            assert got is not None
            return got
        if e_r < e_f:
            got = _reference_point_at_vertex(shape, np.array(e_r[0]))
            assert got is not None
            return got
    # all vertices balanced: full iff some chain has no edges
    return None, any(n == 0 for n in shape.chain_lengths())


def contains_brute_force(shape, focus: np.ndarray) -> bool:
    """ContainsBruteForce (s2shapeutil_contains_brute_force.cc:15-40):
    xor of edge-or-vertex crossings along ref→focus."""
    if getattr(shape, "dim", 2) < 2:
        return False
    ref_point, contained = get_reference_point(shape)
    if ref_point is None:
        return contained
    if np.array_equal(ref_point, focus):
        return contained
    inside = contained
    for v0, v1 in shape.edges():
        inside ^= edge_or_vertex_crossing(ref_point, focus, v0, v1)
    return inside


# ------------------------------------------------ shape-level measures
def shape_length(chains: list) -> float:
    """S2::GetLength over dimension-1 chains (s2shape_measures.cc),
    radians."""
    from .polyline import get_length

    return sum(get_length(c) for c in chains)


def shape_perimeter(shape: LaxPolygon) -> float:
    """S2::GetPerimeter: sum of closed-loop perimeters (radians)."""
    import numpy as _np

    from .measures import loop_perimeter

    total = 0.0
    for loop in shape.loops:
        if len(loop) >= 2:
            total += loop_perimeter(loop)
    return total


def shape_area(shape: LaxPolygon) -> float:
    """S2::GetArea (s2shape_measures.cc): per-loop SIGNED areas (range
    [-2π, 2π], so holes don't catastrophically cancel), +4π when the
    sum is negative."""
    import math as _math

    from .measures import loop_signed_area_origin

    area = sum(loop_signed_area_origin(l) for l in shape.loops)
    if area < 0.0:
        area += 4 * _math.pi
    return area


def shape_approx_area(shape: LaxPolygon) -> float:
    """S2::GetApproxArea: 2π − curvature per loop."""
    import math as _math

    from .measures import loop_curvature

    area = sum(2 * _math.pi - loop_curvature(l) for l in shape.loops)
    if area <= 4 * _math.pi:
        return area
    return _math.fmod(area, 4 * _math.pi)


def shape_centroid(shape, dim: int) -> np.ndarray:
    """S2::GetCentroid (s2shape_measures.cc): points sum; polylines
    length-weighted; polygons area-weighted (none normalized)."""
    from .measures import loop_centroid
    from .polyline import get_centroid

    if dim == 0:
        return np.sum(np.asarray(shape, float).reshape(-1, 3), axis=0)
    if dim == 1:
        out = np.zeros(3)
        for chain in shape:
            out = out + get_centroid(chain)
        return out
    out = np.zeros(3)
    for loop in shape.loops:
        if len(loop) >= 3:
            out = out + loop_centroid(loop)
    return out


# ------------------------------------------------ index-level measures
# (s2shape_index_measures.h/.cc): aggregates over a whole shape index.
# Shapes are (dim, chains) pairs: dim-0 chains are point arrays, dim-1
# chains polyline vertex arrays, dim-2 chains loop vertex arrays (the
# 0-vertex loop denoting the full polygon).


def index_dimension(shapes: list) -> int:
    """S2::GetDimension: max shape dimension, -1 for an empty index
    (an empty point shape still counts as dimension 0)."""
    dim = -1
    for d, _chains in shapes:
        dim = max(dim, d)
    return dim


def index_num_points(shapes: list) -> int:
    """S2::GetNumPoints: total vertices of dimension-0 shapes."""
    return sum(
        sum(len(np.asarray(c).reshape(-1, 3)) for c in chains)
        for d, chains in shapes
        if d == 0
    )


def index_length(shapes: list) -> float:
    """S2::GetLength: total polyline length (radians)."""
    return sum(shape_length(chains) for d, chains in shapes if d == 1)


def index_perimeter(shapes: list) -> float:
    """S2::GetPerimeter: total polygon boundary length (radians)."""
    return sum(
        shape_perimeter(LaxPolygon(chains))
        for d, chains in shapes
        if d == 2
    )


def index_area(shapes: list) -> float:
    """S2::GetArea: total polygon area (sum over shapes; two full
    polygons measure 8π)."""
    return sum(
        shape_area(LaxPolygon(chains)) for d, chains in shapes if d == 2
    )


def index_approx_area(shapes: list) -> float:
    return sum(
        shape_approx_area(LaxPolygon(chains))
        for d, chains in shapes
        if d == 2
    )


def index_centroid(shapes: list) -> np.ndarray:
    """S2::GetCentroid: centroid of the highest-dimension shapes only
    (not normalized)."""
    dim = index_dimension(shapes)
    out = np.zeros(3)
    for d, chains in shapes:
        if d != dim:
            continue
        if d == 0:
            arrs = [np.asarray(c, float).reshape(-1, 3) for c in chains]
            if arrs:
                out = out + shape_centroid(np.concatenate(arrs), 0)
        elif d == 1:
            out = out + shape_centroid(chains, 1)
        else:
            out = out + shape_centroid(LaxPolygon(chains), 2)
    return out


# ------------------------------------------------ lax shape API surface
# (s2lax_polygon_shape.h, s2lax_polyline_shape.h, s2lax_loop_shape.h):
# chain/edge-id accessors shared by the shape-consuming queries.


def _lax_chain(shape: LaxPolygon, i: int) -> tuple[int, int]:
    """chain(i) → (start, length); the full/empty loop has length 0."""
    start = 0
    for k in range(i):
        start += len(shape.loops[k])
    return (start, len(shape.loops[i]))


def _lax_chain_position(shape: LaxPolygon, e: int) -> tuple[int, int]:
    """chain_position(edge_id) → (chain_id, offset)."""
    for i, loop in enumerate(shape.loops):
        if e < len(loop):
            return (i, e)
        e -= len(loop)
    raise IndexError(e)


def _lax_edge(shape: LaxPolygon, e: int):
    i, j = _lax_chain_position(shape, e)
    loop = shape.loops[i]
    return loop[j], loop[(j + 1) % len(loop)]


LaxPolygon.num_loops = lambda self: len(self.loops)
LaxPolygon.num_vertices = lambda self: sum(len(l) for l in self.loops)
LaxPolygon.num_loop_vertices = lambda self, i: len(self.loops[i])
LaxPolygon.loop_vertex = lambda self, i, j: self.loops[i][j]
LaxPolygon.chain = _lax_chain
LaxPolygon.chain_position = _lax_chain_position
LaxPolygon.edge = _lax_edge
LaxPolygon.chain_edge = lambda self, i, j: (
    self.loops[i][j], self.loops[i][(j + 1) % len(self.loops[i])]
)
LaxPolygon.dimension = lambda self: 2
LaxPolygon.is_empty = lambda self: len(self.loops) == 0
LaxPolygon.is_full = lambda self: (
    len(self.loops) > 0 and self.num_vertices() == 0
)


class LaxPolyline:
    """S2LaxPolylineShape: one chain; n−1 edges; no interior."""

    dim = 1

    def __init__(self, vertices):
        self.vertices = np.asarray(vertices, float).reshape(-1, 3)

    def num_vertices(self) -> int:
        return len(self.vertices)

    def num_edges(self) -> int:
        return max(0, len(self.vertices) - 1)

    def num_chains(self) -> int:
        return 1 if self.num_edges() > 0 else 0

    def chain(self, i: int) -> tuple[int, int]:
        assert i == 0
        return (0, self.num_edges())

    def edge(self, e: int):
        return self.vertices[e], self.vertices[e + 1]

    def chain_edge(self, i: int, j: int):
        return self.edge(j)

    def chain_position(self, e: int) -> tuple[int, int]:
        return (0, e)

    def dimension(self) -> int:
        return 1

    def get_reference_point(self):
        return None, False  # polylines have no interior


class LaxClosedPolyline:
    """S2LaxClosedPolylineShape: a closed loop with NO interior
    (dimension 1)."""

    dim = 1

    def __init__(self, vertices):
        self.vertices = np.asarray(vertices, float).reshape(-1, 3)

    def num_edges(self) -> int:
        return len(self.vertices)

    def edge(self, e: int):
        n = len(self.vertices)
        return self.vertices[e], self.vertices[(e + 1) % n]

    def dimension(self) -> int:
        return 1

    def get_reference_point(self):
        return None, False


def lax_loop_shape(vertices) -> LaxPolygon:
    """S2LaxLoopShape: a single-loop lax polygon."""
    return LaxPolygon([np.asarray(vertices, float).reshape(-1, 3)])


def vertex_id_lax_loop_shape(vertex_ids, vertices) -> LaxPolygon:
    """S2VertexIdLaxLoopShape: loop defined by indexes into a vertex
    array (s2lax_loop_shape.h:90-130)."""
    vertices = np.asarray(vertices, float).reshape(-1, 3)
    return LaxPolygon([vertices[list(vertex_ids)]])


# ------------------------------------------------ counting / edge wrap
# (s2shapeutil_count_edges.h, s2shapeutil_count_vertices.h,
# s2shapeutil_edge_wrap.h) over (dim, chains) index tuples.


def count_edges(shapes: list) -> int:
    """CountEdges: total edges (points count one degenerate edge)."""
    total = 0
    for d, chains in shapes:
        for c in chains:
            n = len(np.asarray(c).reshape(-1, 3))
            if d == 0:
                total += n
            elif d == 1:
                total += max(0, n - 1)
            else:
                total += n
    return total


def count_edges_up_to(shapes: list, max_edges: int) -> int:
    """CountEdgesUpTo: stop as soon as the count reaches max_edges
    (whole shapes are counted at a time)."""
    total = 0
    for shape in shapes:
        total += count_edges([shape])
        if total >= max_edges:
            return total
    return total


def count_vertices(shapes: list) -> int:
    """CountVertices: points 1 each; polyline chains edges+1; polygon
    chains one vertex per edge."""
    total = 0
    for d, chains in shapes:
        for c in chains:
            n = len(np.asarray(c).reshape(-1, 3))
            if d == 0:
                total += n
            elif d == 1:
                total += n
            else:
                total += n
    return total


def _chain_of_edge(d: int, chains: list, edge_id: int):
    """(chain_index, offset, chain_length_in_edges, closed?)"""
    for ci, c in enumerate(chains):
        v = np.asarray(c).reshape(-1, 3)
        if d == 0:
            n_edges = len(v)
        elif d == 1:
            n_edges = max(0, len(v) - 1)
        else:
            n_edges = len(v)
        if edge_id < n_edges:
            if d == 0:
                closed = False
                n_edges = 1
                edge_id = 0
            elif d == 1:
                closed = len(v) >= 2 and np.array_equal(v[0], v[-1])
            else:
                closed = True
            return ci, edge_id, n_edges, closed
        edge_id -= n_edges
    raise IndexError(edge_id)


def prev_edge_wrap(d: int, chains: list, edge_id: int) -> int:
    """PrevEdgeWrap: previous edge in the chain, wrapping for polygons
    and closed polylines; -1 at an open start (or for points)."""
    ci, off, n, closed = _chain_of_edge(d, chains, edge_id)
    if d == 0:
        return -1
    if off > 0:
        return edge_id - 1
    return edge_id + n - 1 if closed and n > 1 else -1


def next_edge_wrap(d: int, chains: list, edge_id: int) -> int:
    ci, off, n, closed = _chain_of_edge(d, chains, edge_id)
    if d == 0:
        return -1
    if off + 1 < n:
        return edge_id + 1
    return edge_id - n + 1 if closed and n > 1 else -1


# ------------------------------------------------ shape conversions
# (s2shapeutil_conversion.cc)


def shape_to_points(chains: list) -> np.ndarray:
    """ShapeToS2Points: the v0 of every (degenerate) edge."""
    arrs = [np.asarray(c, float).reshape(-1, 3) for c in chains]
    return np.concatenate(arrs) if arrs else np.empty((0, 3))


def shape_to_polyline(chains: list) -> np.ndarray:
    """ShapeToS2Polyline: the single chain's vertices."""
    assert len(chains) == 1
    return np.asarray(chains[0], float).reshape(-1, 3)


def shape_to_polygon(chains: list):
    """ShapeToS2Polygon (s2shapeutil_conversion.cc:51-72): loops keep
    their lax vertex order verbatim (InitOriented semantics); a
    CW-wound hole's even-odd region is its ENCLOSED area (crossing
    parity is direction-free, only the origin state flips), and the
    GetReferencePoint complement vote repairs whole-complement inputs.
    The full polygon maps to the full kernel Polygon."""
    import math

    from .contains import Loop, Polygon, lax_polygon_reading
    from .measures import loop_signed_area

    shape = LaxPolygon(chains)
    if shape.is_full():
        return Polygon([Loop(np.array([[0.0, 0.0, -1.0]]))])
    loops = []
    for c in chains:
        v = np.asarray(c, float).reshape(-1, 3)
        loop = Loop(v)
        if len(v) >= 3:
            sa = loop_signed_area(v)
            if sa < 0 and abs(abs(sa) - 2 * math.pi) > 1e-9:
                loop.origin_inside = Loop(v[::-1].copy()).origin_inside
        loops.append(loop)
    return lax_polygon_reading(Polygon(loops))
