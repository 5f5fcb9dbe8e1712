"""S2BooleanOperation's CrossingProcessor edge walk, re-derived.

Faithful port of the reference's mixed-dimension boolean-operation core
(s2boolean_operation.cc:1040-2300): the two-pass boundary walk that
clips the boundary of each region to the interior of the other while
tracking every degenerate-geometry interaction — point shells/holes,
sibling-pair shells/holes, degenerate polylines, vertex matches — under
all PolygonModel x PolylineModel x polyline_loops_have_boundaries
combinations.  This is the evaluation path for exactly-shared-vertex
configurations (the s2boolean_operation_test.cc DegeneracyCoverageTest
matrix); general-position interior crossings stay with
kernel/booleans.py and the distributed arrangement, which own edge
splitting and snapping.

Scope: operands whose edges meet only at bitwise-shared vertices.  An
interior crossing raises NotImplementedError (callers route those
through kernel.booleans / operators.arrangement).

Structure mirrored from the reference:

  - index crossings (AddIndexCrossing / InitIndexCrossings,
    s2boolean_operation.cc:2176-2248): every edge pair sharing a vertex,
    with S2::VertexCrossing computed for non-degenerate pairs;
  - CrossingProcessor (cc:1096-1990): StartBoundary/StartShape/
    StartChain state machine, ProcessEdge0/1/2, PolylineEdgeContains-
    Vertex, IsPolylineVertexInside, IsPolylineEdgeInside, and the
    ProcessEdge2 degeneracy ladder (create_degen / keep_degen_a /
    is_degenerate_hole_);
  - boundary-pair driver (BuildOpType, cc:2288-2316): the inversion
    table union=~(~A&~B), difference=A&~B, symmetric difference =
    (A-B) | (B-A);
  - IsFullPolygonResult (cc:2333-2470): the empty-vs-full decision for
    degenerate-only polygon outputs, via face masks + exact areas
    (snap radius 0 here, so the area bounds are exact).

Outputs are raw builder edges per dimension plus the full-background
flag; graph normalization (DegenerateEdges::DISCARD_EXCESS +
SiblingPairs::DISCARD_EXCESS, s2builder_graph.cc EdgeProcessor::Run)
is provided for comparison protocols like the reference test's
IndexMatchingLayer.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from dataclasses import dataclass, field

import numpy as np

from .predicates import vertex_crossing, crossing_sign
from .shapeutil import LaxPolygon, contains_brute_force, shape_area

OPEN = "OPEN"
SEMI_OPEN = "SEMI_OPEN"
CLOSED = "CLOSED"

UNION = "union"
INTERSECTION = "intersection"
DIFFERENCE = "difference"
SYMMETRIC_DIFFERENCE = "symmetric_difference"


# ---------------------------------------------------------------------------
# shapes (S2PointVectorShape / S2LaxPolylineShape / S2LaxPolygonShape)


class PointsShape:
    """S2PointVectorShape: one length-1 chain per point, each edge
    degenerate (v, v)."""

    dim = 0

    def __init__(self, points):
        self.points = [np.asarray(p, float) for p in points]

    def chains(self):
        # (chain_id, start_edge, limit_edge, [edges])
        for i, p in enumerate(self.points):
            yield i, i, i + 1, [(p, p)]


class PolylineShape:
    """S2LaxPolylineShape: a single chain of n-1 edges (n >= 2); the
    degenerate polyline [v, v] has one degenerate edge."""

    dim = 1

    def __init__(self, vertices):
        self.vertices = [np.asarray(v, float) for v in vertices]
        assert len(self.vertices) >= 2

    def chains(self):
        v = self.vertices
        edges = [(v[i], v[i + 1]) for i in range(len(v) - 1)]
        yield 0, 0, len(edges), edges


class PolygonShape(LaxPolygon):
    """S2LaxPolygonShape with sequential edge ids across loops (one
    chain per loop; the empty loop is the full polygon: no edges)."""

    dim = 2

    def chains(self):
        start = 0
        for ci, loop in enumerate(self.loops):
            n = len(loop)
            edges = [(loop[i], loop[(i + 1) % n]) for i in range(n)]
            yield ci, start, start + n, edges
            start += n


# ---------------------------------------------------------------------------
# index-level helpers


def _iter_edges(index):
    """Yields (shape_id, edge_id, v0, v1, dim, chain_start, chain_limit,
    chain_id)."""
    for sid, shape in enumerate(index):
        for cid, start, limit, edges in shape.chains():
            for k, (v0, v1) in enumerate(edges):
                yield sid, start + k, v0, v1, shape.dim, start, limit, cid


def _contains_semiopen(index, p) -> bool:
    """S2ContainsPointQuery (semi-open) over the polygonal (dim-2)
    shapes of the index: XOR of per-shape brute-force containment."""
    inside = False
    for shape in index:
        if shape.dim == 2:
            inside ^= contains_brute_force(shape, np.asarray(p, float))
    return inside


def _has_interior(index) -> bool:
    return any(s.dim == 2 for s in index)


def _index_area(index) -> float:
    return sum(shape_area(s) for s in index if s.dim == 2)


def _face_mask(index) -> int:
    """GetFaceMask analogue (cc:2318-2328).  The reference reads the
    faces carrying shape-index cells; here: faces holding any vertex,
    plus faces whose center the region contains (so full-background
    shapes cover all six, as their index does)."""
    from .coords import get_face

    mask = 0
    for sid, eid, v0, v1, dim, *_ in _iter_edges(index):
        for v in (v0, v1):
            mask |= 1 << int(get_face(v[0], v[1], v[2]))
    centers = [
        (1.0, 0.0, 0.0),
        (0.0, 1.0, 0.0),
        (0.0, 0.0, 1.0),
        (-1.0, 0.0, 0.0),
        (0.0, -1.0, 0.0),
        (0.0, 0.0, -1.0),
    ]
    for f, c in enumerate(centers):
        if _contains_semiopen(index, np.array(c)):
            mask |= 1 << f
    return mask


def _vkey(v) -> bytes:
    return np.asarray(v, float).tobytes()


def _regions_identical(a, b) -> bool:
    """AreRegionsIdentical: same shapes, dimensions, chains, and
    bitwise-equal vertices in order."""
    if len(a) != len(b):
        return False
    for sa, sb in zip(a, b):
        if sa.dim != sb.dim:
            return False
        ca = list(sa.chains())
        cb = list(sb.chains())
        if len(ca) != len(cb):
            return False
        for (_, _, _, ea), (_, _, _, eb) in zip(ca, cb):
            if len(ea) != len(eb):
                return False
            for (a0, a1), (b0, b1) in zip(ea, eb):
                if _vkey(a0) != _vkey(b0) or _vkey(a1) != _vkey(b1):
                    return False
    return True


# ---------------------------------------------------------------------------
# crossings


@dataclass
class _Crossing:
    b_id: tuple  # (shape_id, edge_id)
    b_v0: np.ndarray
    b_v1: np.ndarray
    b_dim: int
    b_chain_id: int
    b_chain_start: int
    b_chain_limit: int
    is_vertex_crossing: bool


def _index_crossings(a_index, b_index):
    """All (a_edge, b_edge) pairs sharing a bitwise-equal vertex
    (AddIndexCrossing, cc:2180-2205).  Interior crossings are out of
    scope for this walk and raise."""
    b_edges = list(_iter_edges(b_index))
    # bucket B edges by vertex key for the shared-vertex scan
    by_vertex = defaultdict(list)
    for rec in b_edges:
        by_vertex[_vkey(rec[2])].append(rec)
        if _vkey(rec[3]) != _vkey(rec[2]):
            by_vertex[_vkey(rec[3])].append(rec)
    out = defaultdict(list)  # a_id -> [_Crossing]
    for sid, eid, a0, a1, adim, *_ in _iter_edges(a_index):
        seen = set()
        cands = by_vertex.get(_vkey(a0), [])
        if _vkey(a1) != _vkey(a0):
            cands = cands + by_vertex.get(_vkey(a1), [])
        for bsid, beid, b0, b1, bdim, bstart, blimit, bcid in cands:
            if (bsid, beid) in seen:
                continue
            seen.add((bsid, beid))
            is_vc = False
            a_deg = _vkey(a0) == _vkey(a1)
            b_deg = _vkey(b0) == _vkey(b1)
            if not a_deg and not b_deg:
                is_vc = bool(vertex_crossing(a0, a1, b0, b1))
            out[(sid, eid)].append(
                _Crossing((bsid, beid), b0, b1, bdim, bcid, bstart,
                          blimit, is_vc)
            )
        # interior crossings are not supported by this walk
        if adim >= 1 and _vkey(a0) != _vkey(a1):
            for bsid, beid, b0, b1, bdim, *_ in b_edges:
                if bdim == 0 or _vkey(b0) == _vkey(b1):
                    continue
                if (
                    _vkey(a0) in (_vkey(b0), _vkey(b1))
                    or _vkey(a1) in (_vkey(b0), _vkey(b1))
                ):
                    continue
                if crossing_sign(a0, a1, b0, b1) > 0:
                    raise NotImplementedError(
                        "interior crossing: use kernel.booleans / the "
                        "distributed arrangement for general position"
                    )
    return out


# ---------------------------------------------------------------------------
# the processor


@dataclass
class _EdgeCrossingResult:
    """EdgeCrossingResult (cc:1504-1543)."""

    matches_polyline: bool = False
    a0_matches_polyline: bool = False
    a1_matches_polyline: bool = False
    a0_matches_polygon: bool = False
    a1_matches_polygon: bool = False
    polygon_match_id: tuple | None = None
    sibling_match_id: tuple | None = None
    a0_loop_match_id: tuple | None = None
    a0_crossings: int = 0
    a1_crossings: int = 0
    interior_crossings: int = 0

    def matches_polygon(self) -> bool:
        return self.polygon_match_id is not None

    def matches_sibling(self) -> bool:
        return self.sibling_match_id is not None

    def loop_matches_a0(self) -> bool:
        return self.a0_loop_match_id is not None


@dataclass
class _Output:
    """Collected builder edges: (v0, v1) per dimension."""

    edges: list = field(default_factory=list)  # (v0, v1, dim)

    def add(self, v0, v1, dim):
        self.edges.append((np.asarray(v0, float), np.asarray(v1, float),
                           dim))


class _CrossingProcessor:
    """CrossingProcessor (cc:1096-1990), builder replaced by a plain
    edge collector; kSetReverseA is applied directly when emitting
    dimension-2 edges of an inverted region."""

    def __init__(self, polygon_model, polyline_model,
                 polyline_loops_have_boundaries, out: _Output):
        self.polygon_model = polygon_model
        self.polyline_model = polyline_model
        self.polyline_loops_have_boundaries = polyline_loops_have_boundaries
        self.out = out
        self.is_degenerate_hole = {}
        self.inside = False

    # -- StartBoundary / StartShape / StartChain ------------------------
    def start_boundary(self, a_region_id, invert_a, invert_b,
                       invert_result):
        self.a_region_id = a_region_id
        self.invert_a = invert_a
        self.invert_b = invert_b
        self.invert_result = invert_result
        self.is_union = invert_b and invert_result
        self.reverse_a = invert_a != invert_result

    def start_shape(self, shape):
        self.a_shape = shape
        self.a_dimension = shape.dim

    def start_chain(self, chain_id, chain_start, chain_limit,
                    chain_edges, inside):
        self.chain_id = chain_id
        self.chain_start = chain_start
        self.chain_limit = chain_limit
        self.chain_edges = chain_edges
        self.inside = inside
        self.v0_emitted_max_edge_id = chain_start - 1
        self.chain_v0_emitted = False

    # -- emit helpers ---------------------------------------------------
    def _add_edge(self, a0, a1, dim, interior_crossings):
        assert interior_crossings == 0
        if dim == 2 and self.reverse_a:
            self.out.add(a1, a0, dim)
        else:
            self.out.add(a0, a1, dim)

    def _add_point_edge(self, p, dim):
        self.out.add(p, p, dim)

    # -- predicates -----------------------------------------------------
    def _is_v0_isolated(self, a_id):
        return not self.inside and self.v0_emitted_max_edge_id < a_id[1]

    def _is_chain_last_vertex_isolated(self, a_id):
        return (
            a_id[1] == self.chain_limit - 1
            and not self.chain_v0_emitted
            and self.v0_emitted_max_edge_id <= a_id[1]
        )

    def _polyline_contains_v0(self, edge_id, chain_start):
        return self.polyline_model != OPEN or edge_id > chain_start

    def _is_degenerate(self, a_id):
        return a_id in self.is_degenerate_hole

    def _polyline_edge_contains_vertex(self, v, cr: _Crossing, dim):
        """PolylineEdgeContainsVertex (cc:1959-1995)."""
        assert cr.b_dim == 1
        if self.polyline_model == CLOSED:
            return True
        b_edge_id = cr.b_id[1]
        vk = _vkey(v)
        b_deg = _vkey(cr.b_v0) == _vkey(cr.b_v1)
        # last vertex: contained only if the polyline is degenerate and
        # v is modeled as a degenerate polyline (dimension 1)
        if (
            b_edge_id == cr.b_chain_limit - 1
            and vk == _vkey(cr.b_v1)
            and (dim == 0 or b_edge_id > 0 or not b_deg)
        ):
            return False
        if self._polyline_contains_v0(b_edge_id, cr.b_chain_start):
            return True
        if vk != _vkey(cr.b_v0):
            return True
        if self.polyline_loops_have_boundaries:
            return False
        # the polyline forms a loop: its shared first/last vertex is
        # contained when loops have no boundaries
        return vk == _vkey(self.b_chain_last_v1(cr))

    @staticmethod
    def b_chain_last_v1(cr: _Crossing):
        # Only consulted when b_edge is the first edge of a polyline
        # chain; the chain's last v1 equals its first v0 iff the
        # polyline is a loop.  We cannot reach the B shape here, so the
        # caller records it on the crossing via b_loop_v1.
        return cr.b_loop_v1

    # -- crossing summaries --------------------------------------------
    def _process_point_crossings(self, a0, crossings):
        matches_point = matches_polyline = matches_polygon = False
        for cr in crossings:
            if cr.b_dim == 0:
                matches_point = True
            elif cr.b_dim == 1:
                if self._polyline_edge_contains_vertex(a0, cr, 0):
                    matches_polyline = True
            else:
                matches_polygon = True
        return matches_point, matches_polyline, matches_polygon

    def _process_edge_crossings(self, a_id, a0, a1, crossings):
        """ProcessEdgeCrossings (cc:1882-1948), vertex-sharing pairs
        only (interior crossings rejected upstream)."""
        r = _EdgeCrossingResult()
        a0k, a1k = _vkey(a0), _vkey(a1)
        for cr in crossings:
            if cr.b_dim == 0:
                continue
            b0k, b1k = _vkey(cr.b_v0), _vkey(cr.b_v1)
            if cr.b_dim == 1:
                if self.a_dimension == 2:
                    continue
                if (a0k == b0k and a1k == b1k) or (
                    a0k == b1k and a1k == b0k
                ):
                    r.matches_polyline = True
                if (a0k == b0k or a0k == b1k) and (
                    self._polyline_edge_contains_vertex(a0, cr, 1)
                ):
                    r.a0_matches_polyline = True
                if (a1k == b0k or a1k == b1k) and (
                    self._polyline_edge_contains_vertex(a1, cr, 1)
                ):
                    r.a1_matches_polyline = True
            else:
                if a0k == a1k or b0k == b1k:
                    # no edge crossings: at least one edge is degenerate
                    if a0k == b0k and a0k == b1k:
                        r.a0_loop_match_id = cr.b_id
                elif a0k == b0k and a1k == b1k:
                    r.a0_crossings += 1
                    r.polygon_match_id = cr.b_id
                elif a0k == b1k and a1k == b0k:
                    r.a0_crossings += 1
                    r.sibling_match_id = cr.b_id
                elif cr.is_vertex_crossing:
                    if a0k == b0k or a0k == b1k:
                        r.a0_crossings += 1
                    else:
                        r.a1_crossings += 1
                if a0k == b0k or a0k == b1k:
                    r.a0_matches_polygon = True
                if a1k == b0k or a1k == b1k:
                    r.a1_matches_polygon = True
        return r

    # -- ProcessEdge0/1/2 ----------------------------------------------
    def process_edge(self, a_id, a0, a1, crossings):
        if self.a_dimension == 0:
            self._process_edge0(a_id, a0, a1, crossings)
        elif self.a_dimension == 1:
            self._process_edge1(a_id, a0, a1, crossings)
        else:
            self._process_edge2(a_id, a0, a1, crossings)

    def _process_edge0(self, a_id, a0, a1, crossings):
        """ProcessEdge0 (cc:1449-1474)."""
        if self.invert_a != self.invert_result:
            return
        m_point, m_polyline, m_polygon = self._process_point_crossings(
            a0, crossings
        )
        contained = self.inside ^ self.invert_b
        if m_polygon and self.polygon_model != SEMI_OPEN:
            contained = self.polygon_model == CLOSED
        if m_polyline:
            contained = True
        if m_point and not self.is_union:
            contained = True
        if contained == self.invert_b:
            return
        self._add_point_edge(a0, 0)

    def _is_polyline_vertex_inside(self, matches_polyline,
                                   matches_polygon):
        """IsPolylineVertexInside (cc:1616-1633)."""
        contained = self.inside ^ self.invert_b
        if matches_polyline and not self.is_union:
            contained = True
        elif matches_polygon and self.polygon_model != SEMI_OPEN:
            contained = self.polygon_model == CLOSED
        return contained ^ self.invert_b

    def _is_polyline_edge_inside(self, r, is_degenerate):
        """IsPolylineEdgeInside (cc:1636-1675)."""
        contained = self.inside ^ self.invert_b
        if r.matches_polyline and not self.is_union:
            contained = True
        elif is_degenerate:
            if self.polygon_model != SEMI_OPEN and r.a0_matches_polygon:
                contained = self.polygon_model == CLOSED
            if r.a0_matches_polyline and not self.is_union:
                contained = True
        elif r.matches_polygon():
            if not (self.polygon_model == SEMI_OPEN
                    and r.matches_sibling()):
                contained = self.polygon_model != OPEN
        elif r.matches_sibling():
            contained = self.polygon_model == CLOSED
        return contained ^ self.invert_b

    def _process_edge1(self, a_id, a0, a1, crossings):
        """ProcessEdge1 (cc:1546-1613)."""
        if self.invert_a != self.invert_result:
            return
        r = self._process_edge_crossings(a_id, a0, a1, crossings)
        a0_inside = self._is_polyline_vertex_inside(
            r.a0_matches_polyline, r.a0_matches_polygon
        )
        is_degenerate = _vkey(a0) == _vkey(a1)
        self.inside ^= bool(r.a0_crossings & 1)
        if self.inside != self._is_polyline_edge_inside(r, is_degenerate):
            self.inside = not self.inside
            r.a1_crossings += 1

        chain_first_v0 = self.chain_edges[0][0]
        chain_last_v1 = self.chain_edges[-1][1]
        if (
            not self.polyline_loops_have_boundaries
            and a_id[1] == self.chain_start
            and _vkey(a0) == _vkey(chain_last_v1)
        ):
            self.chain_v0_emitted = self.inside
        elif (
            self._is_v0_isolated(a_id)
            and not is_degenerate
            and self._polyline_contains_v0(a_id[1], self.chain_start)
            and a0_inside
        ):
            self._add_point_edge(a0, 1)

        if self.inside or r.interior_crossings > 0:
            self._add_edge(a0, a1, 1, r.interior_crossings)
        if self.inside:
            self.v0_emitted_max_edge_id = a_id[1] + 1

        self.inside ^= bool(r.a1_crossings & 1)
        if (
            not is_degenerate
            and self._is_chain_last_vertex_isolated(a_id)
            and (
                self.polyline_model == CLOSED
                or (
                    not self.polyline_loops_have_boundaries
                    and _vkey(a1) == _vkey(chain_first_v0)
                )
            )
            and self._is_polyline_vertex_inside(
                r.a1_matches_polyline, r.a1_matches_polygon
            )
        ):
            self._add_point_edge(a1, 1)

    def _process_edge2(self, a_id, a0, a1, crossings):
        """ProcessEdge2 (cc:1678-1876)."""
        emit_shared = self.a_region_id == 1
        create_degen = (
            self.polygon_model == CLOSED
            and not self.invert_a
            and not self.invert_b
        ) or (
            self.polygon_model == OPEN and self.invert_a and self.invert_b
        )
        keep_degen_a = self.polygon_model == OPEN and self.invert_b
        keep_degen_b = self.polygon_model == OPEN and self.invert_a

        r = self._process_edge_crossings(a_id, a0, a1, crossings)
        assert not r.matches_polyline
        if self.invert_a != self.invert_b:
            r.polygon_match_id, r.sibling_match_id = (
                r.sibling_match_id,
                r.polygon_match_id,
            )
        is_point = _vkey(a0) == _vkey(a1)
        if not emit_shared:
            if r.loop_matches_a0():
                self.is_degenerate_hole[r.a0_loop_match_id] = self.inside
                if is_point:
                    return
            if self.polygon_model != SEMI_OPEN:
                if is_point and r.a0_matches_polygon:
                    return
        self.inside ^= bool(r.a0_crossings & 1)
        if not emit_shared:
            if r.matches_polygon() or r.matches_sibling():
                if r.matches_polygon() and r.matches_sibling():
                    self.is_degenerate_hole[r.polygon_match_id] = (
                        self.inside
                    )
                    self.is_degenerate_hole[r.sibling_match_id] = (
                        self.inside
                    )
                assert r.interior_crossings == 0
                self.inside ^= bool(r.a1_crossings & 1)
                return

        is_b_hole = (
            r.matches_polygon() and r.matches_sibling() and self.inside
        )
        semi_open_inside = self.inside
        if is_point:
            if r.loop_matches_a0():
                self.inside = (
                    create_degen
                    or keep_degen_a
                    or (
                        self.inside
                        == self.is_degenerate_hole[r.a0_loop_match_id]
                    )
                )
            elif r.a0_matches_polygon:
                if self.polygon_model != SEMI_OPEN:
                    self.inside = create_degen or keep_degen_a
        elif r.matches_polygon():
            if self._is_degenerate(a_id):
                self.inside = (
                    create_degen
                    or keep_degen_a
                    or (
                        (not r.matches_sibling() or self.inside)
                        == self.is_degenerate_hole[a_id]
                    )
                )
            else:
                if (
                    not r.matches_sibling()
                    or create_degen
                    or keep_degen_b
                ):
                    self.inside = True
        elif r.matches_sibling():
            if self._is_degenerate(a_id):
                self.inside = (
                    create_degen or keep_degen_a
                ) and not self.is_degenerate_hole[a_id]
            else:
                self.inside = create_degen
        if self.inside != semi_open_inside:
            r.a1_crossings += 1

        if (
            emit_shared
            and r.a0_matches_polygon
            and not self.inside
            and (
                create_degen
                or (keep_degen_b and r.loop_matches_a0())
            )
        ):
            self._add_point_edge(a0, 2)

        # The reference adds the sibling unconditionally and lets
        # GraphEdgeClipper drop crossing-free edges whose clipper state
        # is outside (cc:403-411: `if (inside) AddEdge(...)`); with no
        # interior crossings that reduces to gating on inside_ here.
        if (
            r.matches_sibling()
            and (create_degen or keep_degen_b)
            and not self._is_degenerate(a_id)
            and not is_b_hole
            and self.inside
        ):
            self._add_edge(a1, a0, 2, 0)

        if self.inside or r.interior_crossings > 0:
            self._add_edge(a0, a1, 2, r.interior_crossings)
        self.inside ^= bool(r.a1_crossings & 1)


# ---------------------------------------------------------------------------
# the boundary-pair driver


def _add_boundary(a_region_id, a_index, b_index, invert_a, invert_b,
                  invert_result, cp: _CrossingProcessor, crossings):
    """AddBoundary (cc:2026-2076) without the output-sensitive skipping
    (every edge is processed; skipping is a pure optimization)."""
    cp.start_boundary(a_region_id, invert_a, invert_b, invert_result)
    b_has_interior = _has_interior(b_index)
    for sid, shape in enumerate(a_index):
        cp.start_shape(shape)
        for cid, start, limit, edges in shape.chains():
            if not edges:
                continue  # the full loop: chain with no edges
            first_v0 = edges[0][0]
            inside = (
                b_has_interior and _contains_semiopen(b_index, first_v0)
            ) != invert_b
            cp.start_chain(cid, start, limit, edges, inside)
            for k, (v0, v1) in enumerate(edges):
                a_id = (sid, start + k)
                crs = crossings.get(a_id, [])
                # PolylineEdgeContainsVertex may need to know whether
                # the B chain is a loop (its last v1); attach it.
                for cr in crs:
                    if cr.b_dim == 1 and not hasattr(cr, "b_loop_v1"):
                        b_shape = b_index[cr.b_id[0]]
                        for bc in b_shape.chains():
                            if bc[1] <= cr.b_id[1] < bc[2]:
                                cr.b_loop_v1 = bc[3][-1][1]
                                break
                cp.process_edge(a_id, v0, v1, crs)


def _is_full_polygon_result(a_index, b_index, op) -> bool:
    """IsFullPolygonResult (cc:2333-2470) with exact areas (snap
    radius 0)."""
    all_faces = 0x3F
    a_mask = _face_mask(a_index)
    b_mask = _face_mask(b_index)
    a_area = _index_area(a_index)
    b_area = _index_area(b_index)
    four_pi = 4 * math.pi
    if op == UNION:
        if (a_mask | b_mask) != all_faces:
            return False
        min_area = max(a_area, b_area)
        max_area = min(four_pi, a_area + b_area)
        return min_area > four_pi - max_area
    if op == INTERSECTION:
        if (a_mask & b_mask) != all_faces:
            return False
        min_area = max(0.0, a_area + b_area - four_pi)
        max_area = min(a_area, b_area)
        return min_area > four_pi - max_area
    if op == DIFFERENCE:
        if a_mask != all_faces:
            return False
        min_area = max(0.0, a_area - b_area)
        max_area = min(a_area, four_pi - b_area)
        return min_area > four_pi - max_area
    # symmetric difference
    if (a_mask | b_mask) != all_faces:
        return False
    min_area = abs(a_area - b_area)
    max_area = four_pi - abs(four_pi - (a_area + b_area))
    # exact arithmetic: no snap-induced ambiguity band needed unless
    # both bounds coincide at 2*pi, in which case the reference
    # consults additional heuristics; keep its tie behavior (empty)
    return min_area > four_pi - max_area


@dataclass
class LaxBooleanResult:
    """Raw output edges per dimension + the degenerate-polygon
    background decision (None when the dim-2 output has non-degenerate
    edges, so the loops themselves define the region)."""

    points: list = field(default_factory=list)        # vertices (dim 0)
    line_edges: list = field(default_factory=list)    # (v0, v1)
    polygon_edges: list = field(default_factory=list)  # (v0, v1)
    polygon_full: bool | None = None

    @property
    def is_empty(self) -> bool:
        return (
            not self.points
            and not self.line_edges
            and not self.polygon_edges
            and not self.polygon_full
        )


def lax_boolean_op(a_index, b_index, op,
                   polygon_model=SEMI_OPEN,
                   polyline_model=CLOSED,
                   polyline_loops_have_boundaries=True
                   ) -> LaxBooleanResult:
    """S2BooleanOperation over lax shape lists whose edges meet only at
    shared vertices (BuildOpType, cc:2288-2316)."""
    out = _Output()
    cp = _CrossingProcessor(polygon_model, polyline_model,
                            polyline_loops_have_boundaries, out)

    def pair(invert_a, invert_b, invert_result):
        crossings_ab = _index_crossings(a_index, b_index)
        crossings_ba = _index_crossings(b_index, a_index)
        _add_boundary(0, a_index, b_index, invert_a, invert_b,
                      invert_result, cp, crossings_ab)
        _add_boundary(1, b_index, a_index, invert_b, invert_a,
                      invert_result, cp, crossings_ba)

    identical = _regions_identical(a_index, b_index)
    if op == UNION:
        pair(True, True, True)
    elif op == INTERSECTION:
        pair(False, False, False)
    elif op == DIFFERENCE:
        if not identical:
            pair(False, True, False)
    elif op == SYMMETRIC_DIFFERENCE:
        if not identical:
            pair(False, True, False)
            pair(True, False, False)
    else:
        raise ValueError(f"unknown op {op!r}")

    res = LaxBooleanResult()
    has_nondegen2 = False
    for v0, v1, dim in out.edges:
        if dim == 0:
            res.points.append(v0)
        elif dim == 1:
            res.line_edges.append((v0, v1))
        else:
            res.polygon_edges.append((v0, v1))
            if _vkey(v0) != _vkey(v1):
                has_nondegen2 = True
    if not has_nondegen2:
        # degenerate-only (or empty) polygon output: decide the
        # background exactly as the reference's layer callback does
        if op in (DIFFERENCE, SYMMETRIC_DIFFERENCE) and identical:
            res.polygon_full = False
        else:
            res.polygon_full = _is_full_polygon_result(a_index, b_index,
                                                       op)
    return res


def lax_boolean_is_empty(a_index, b_index, op, **kw) -> bool:
    """S2BooleanOperation::IsEmpty."""
    return lax_boolean_op(a_index, b_index, op, **kw).is_empty


def lax_contains(a_index, b_index, op_options=None, **kw) -> bool:
    """S2BooleanOperation::Contains(a, b): b \\ a is empty under the
    same options (s2boolean_operation.h)."""
    return lax_boolean_is_empty(b_index, a_index, DIFFERENCE, **kw)


# ---------------------------------------------------------------------------
# graph normalization for comparisons (EdgeProcessor::Run semantics)


def normalize_dim2(edge_keys):
    """Applies DegenerateEdges::DISCARD_EXCESS + SiblingPairs::
    DISCARD_EXCESS (+ DuplicateEdges::KEEP, directed) to a multiset of
    directed dim-2 edge keys (hashable (v0key, v1key) pairs), per
    s2builder_graph.cc EdgeProcessor::Run:

      - degenerate edges incident to any non-degenerate edge at the
        same vertex are discarded; surviving duplicates merge to one;
      - each directed edge keeps max(1, n_out - n_in) copies when
        n_out >= n_in, else none (balanced pairs keep one per side).
    """
    c = Counter(edge_keys)
    incident = set()
    for (k0, k1), n in c.items():
        if k0 != k1:
            incident.add(k0)
            incident.add(k1)
    out = Counter()
    for (k0, k1), n in c.items():
        if k0 == k1:
            if k0 not in incident:
                out[(k0, k1)] = 1
        else:
            n_in = c.get((k1, k0), 0)
            if n > n_in or (n == n_in and n > 0):
                out[(k0, k1)] = max(1, n - n_in)
    return out
