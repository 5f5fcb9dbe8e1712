"""S2ValidQuery / S2LegacyValidQuery (s2validation_query.h): validate
the geometry of a shape index against the S2BooleanOperation
compatibility rules (S2ValidQuery) or the stricter S2Polygon/S2Polyline
legacy rules (S2LegacyValidQuery).

The reference fuses its checks into one pass over index cells; at
kernel scale we run the same checks globally, in the reference's
Validate() order: per-shape checks (dimension, chain closure,
coordinates, degeneracy, antipodal, continuity, chain orientation),
then the cross-shape cell checks (duplicate edges, interior crossings,
point containment), then the finish checks (chains crossing at a
vertex, chain-in-polygon containment).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

import numpy as np

from . import predicates as P
from .contains_point import OPEN, SEMI_OPEN
from .shapeutil import LaxPolygon, get_reference_point

DBL_EPSILON = 2.220446049250313e-16

# S2Error codes exercised by the validation queries
OK = "OK"
INVALID_DIMENSION = "INVALID_DIMENSION"
INVALID_VERTEX = "INVALID_VERTEX"
NOT_UNIT_LENGTH = "NOT_UNIT_LENGTH"
NOT_CONTINUOUS = "NOT_CONTINUOUS"
DUPLICATE_VERTICES = "DUPLICATE_VERTICES"
ANTIPODAL_VERTICES = "ANTIPODAL_VERTICES"
LOOP_NOT_ENOUGH_VERTICES = "LOOP_NOT_ENOUGH_VERTICES"
POLYGON_EMPTY_LOOP = "POLYGON_EMPTY_LOOP"
POLYGON_INCONSISTENT_LOOP_ORIENTATIONS = (
    "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS"
)
OVERLAPPING_GEOMETRY = "OVERLAPPING_GEOMETRY"


def is_unit_length(p: np.ndarray) -> bool:
    """S2::IsUnitLength (s2pointutil.h)."""
    return abs(float(p @ p) - 1) <= 5 * DBL_EPSILON


@dataclass
class VEdge:
    v0: np.ndarray
    v1: np.ndarray
    edge_id: int
    chain_id: int
    offset: int


@dataclass
class VShape:
    """Validation input shape: explicit per-chain edge lists so that
    malformed shapes (open chains, bad dimensions) are expressible like
    the reference's custom test S2Shapes."""

    dim: int
    chains: list = field(default_factory=list)  # list[list[(v0, v1)]]

    def edges(self) -> list[VEdge]:
        out = []
        eid = 0
        for cid, chain in enumerate(self.chains):
            for off, (v0, v1) in enumerate(chain):
                out.append(
                    VEdge(np.asarray(v0, float), np.asarray(v1, float),
                          eid, cid, off)
                )
                eid += 1
        return out

    def loops(self) -> list[np.ndarray]:
        """Chain vertex lists (v0 of each edge), for containment."""
        return [
            np.asarray([e[0] for e in chain], float).reshape(-1, 3)
            for chain in self.chains
        ]


def point_vshape(points) -> VShape:
    """S2PointVectorShape: one single-point chain per point."""
    return VShape(0, [[(p, p)] for p in np.asarray(points, float).reshape(-1, 3)])


def polyline_vshape(vertices) -> VShape:
    v = np.asarray(vertices, float).reshape(-1, 3)
    return VShape(1, [[(v[i], v[i + 1]) for i in range(len(v) - 1)]])


def lax_polygon_vshape(loops) -> VShape:
    chains = []
    for lp in loops:
        lp = np.asarray(lp, float).reshape(-1, 3)
        n = len(lp)
        chains.append([(lp[i], lp[(i + 1) % n]) for i in range(n)])
    return VShape(2, chains)


def _vkey(v) -> tuple:
    return (float(v[0]), float(v[1]), float(v[2]))


def _lax_contains(loops: list[np.ndarray], p: np.ndarray, model: str) -> bool:
    """Containment in a lax polygon with a vertex model (the core of
    S2ContainsPointQuery::ShapeContains, s2contains_point_query.h)."""
    lax = LaxPolygon(loops)
    ref, ref_inside = get_reference_point(lax)
    if ref is None:
        return ref_inside
    p = np.asarray(p, float)
    if np.array_equal(p, ref):
        if model == OPEN:
            return False
        return ref_inside
    inside = ref_inside
    for v0, v1 in lax.edges():
        sign = P.crossing_sign(ref, p, v0, v1)
        if sign < 0:
            continue
        if sign == 0:
            if model != SEMI_OPEN and (
                np.array_equal(v0, p) or np.array_equal(v1, p)
            ):
                return model == "closed"
            sign = int(P.vertex_crossing(ref, p, v0, v1))
        inside ^= bool(sign)
    return inside


def sort_edges_ccw(origin: np.ndarray, first: tuple, edges: list) -> list:
    """SortEdgesCcw (s2validation_query.h:659-706): CCW total order of
    edges incident on `origin`, anchored at `first`; reverse duplicates
    adjacent with the origin-as-v0 one leading."""
    origin = np.asarray(origin, float)
    f0, f1 = np.asarray(first[0], float), np.asarray(first[1], float)
    first_vertex = f1 if np.array_equal(f0, origin) else f0

    def endpoint(e):
        return e[1] if np.array_equal(np.asarray(e[0], float), origin) else e[0]

    def eq(e, f):
        return np.array_equal(np.asarray(e[0], float), np.asarray(f[0], float)) and np.array_equal(
            np.asarray(e[1], float), np.asarray(f[1], float)
        )

    def cmp(a, b):
        if eq(a, b):
            return 0
        if eq(a, (b[1], b[0])):  # reverse duplicates: origin-as-v0 first
            return -1 if np.array_equal(np.asarray(a[0], float), origin) else 1
        if eq(a, (f0, f1)):
            return -1
        if eq(b, (f0, f1)):
            return 1
        apnt = np.asarray(endpoint(a), float)
        bpnt = np.asarray(endpoint(b), float)
        return -1 if P.ordered_ccw(first_vertex, apnt, bpnt, origin) else 1

    return sorted(edges, key=functools.cmp_to_key(cmp))


class ValidQuery:
    """S2ValidQuery (s2validation_query.h:213-556)."""

    def __init__(self):
        self.allow_degenerate_edges = True
        self.allow_duplicate_polyline_edges = True
        self.allow_reverse_duplicates = True
        self.allow_polyline_interior_crossings = True

    # -------------------------------------------------- driver
    def validate(self, shapes: list[VShape]) -> tuple[bool, str]:
        """→ (ok, error_code)."""
        err = self._start(shapes)
        if err:
            return False, err
        for shape_id, shape in enumerate(shapes):
            err = self._check_shape(shape, shape_id, shapes)
            if err:
                return False, err
        err = self._start_cell_checks(shapes)
        if err:
            return False, err
        err = self._check_point_containment(shapes)
        if err:
            return False, err
        err = self._finish(shapes)
        if err:
            return False, err
        return True, OK

    def _start(self, shapes) -> str | None:
        return None

    # ---------------------------------------------- per-shape checks
    def _check_shape(self, shape: VShape, shape_id: int, shapes) -> str | None:
        dim = shape.dim
        if dim < 0 or dim > 2:
            return INVALID_DIMENSION

        chains_to_check = []
        for cid, chain in enumerate(shape.chains):
            # polygon chains must close (h:612-627)
            if dim == 2 and len(chain) > 0:
                if not np.array_equal(
                    np.asarray(chain[-1][1], float),
                    np.asarray(chain[0][0], float),
                ):
                    return LOOP_NOT_ENOUGH_VERTICES
            prev = None
            for v0, v1 in chain:
                v0 = np.asarray(v0, float)
                v1 = np.asarray(v1, float)
                if not (np.isfinite(v0).all() and np.isfinite(v1).all()):
                    return INVALID_VERTEX
                if not (is_unit_length(v0) and is_unit_length(v1)):
                    return NOT_UNIT_LENGTH
                if (
                    dim > 0
                    and not self.allow_degenerate_edges
                    and np.array_equal(v0, v1)
                ):
                    return DUPLICATE_VERTICES
                if np.array_equal(v0, -v1):
                    return ANTIPODAL_VERTICES
                if dim > 0 and prev is not None and not np.array_equal(prev, v0):
                    return NOT_CONTINUOUS
                prev = v1
            if dim != 2 or len(chain) == 0:
                continue
            # need two distinct points before orientation is checkable
            first = np.asarray(chain[0][0], float)
            if any(
                not np.array_equal(np.asarray(e[0], float), first)
                for e in chain
            ):
                chains_to_check.append(cid)

        for cid in chains_to_check:
            err = self._check_chain_orientation(shape, cid)
            if err:
                return err
        return None

    def _check_chain_orientation(self, shape: VShape, chain_id: int) -> str | None:
        """CheckChainOrientation (h:995-1067): interior must be on the
        LEFT of the chain.  Walk the chain vertices until one gives a
        decidable ContainsVertexQuery sign, then require that the
        winding number from a reference point agrees with it."""
        loops = shape.loops()
        lax = LaxPolygon(loops)
        ref, ref_inside = get_reference_point(lax)
        if ref is None:
            return None
        all_edges = shape.edges()
        for v0, _v1 in shape.chains[chain_id]:
            vertex = np.asarray(v0, float)
            if np.array_equal(vertex, ref):
                continue
            q = P.ContainsVertexQuery(vertex)
            winding = int(ref_inside)
            for e in all_edges:
                winding += P.signed_edge_or_vertex_crossing(
                    ref, vertex, e.v0, e.v1
                )
                if np.array_equal(e.v0, vertex):
                    q.add_edge(e.v1, +1)
                elif np.array_equal(e.v1, vertex):
                    q.add_edge(e.v0, -1)
            duplicates = q.duplicate_edges()
            sign = 0
            if not duplicates:
                sign = q.contains_sign()
                if sign == 0:
                    # all incident edges were reverse duplicates; try
                    # another vertex
                    continue
            if duplicates or winding != (0 if sign < 0 else 1):
                return POLYGON_INCONSISTENT_LOOP_ORIENTATIONS
            return None
        return None

    # ---------------------------------------------- cross-shape checks
    def _start_cell_checks(self, shapes) -> str | None:
        # duplicate (and optionally reverse-duplicate) polygon edges
        # (h:720-750)
        dim0 = 2 if self.allow_duplicate_polyline_edges else 1
        dup_edges = []
        for shape in shapes:
            if dim0 <= shape.dim <= 2:
                dup_edges.extend(shape.edges())
        n = len(dup_edges)
        for i in range(n):
            ei = dup_edges[i]
            for j in range(i + 1, n):
                ej = dup_edges[j]
                dup = np.array_equal(ei.v0, ej.v0) and np.array_equal(
                    ei.v1, ej.v1
                )
                if not self.allow_reverse_duplicates:
                    dup = dup or (
                        np.array_equal(ei.v0, ej.v1)
                        and np.array_equal(ei.v1, ej.v0)
                    )
                if dup:
                    return OVERLAPPING_GEOMETRY

        # interior crossings (h:753-796): any proper crossing involving
        # a polygon edge (plus polyline-polyline pairs when disallowed)
        tagged = []  # (dim, VEdge)
        for shape in shapes:
            if shape.dim in (1, 2):
                tagged.extend((shape.dim, e) for e in shape.edges())
        m = len(tagged)
        for i in range(m):
            di, ei = tagged[i]
            for j in range(i + 1, m):
                dj, ej = tagged[j]
                if (
                    self.allow_polyline_interior_crossings
                    and di == 1
                    and dj == 1
                ):
                    continue
                if P.crossing_sign(ei.v0, ei.v1, ej.v0, ej.v1) > 0:
                    return OVERLAPPING_GEOMETRY
        return None

    def _check_point_containment(self, shapes) -> str | None:
        """CheckEdge dim-0 path (h:1069-1087): points may not be inside
        any polygon."""
        poly_loops = [
            (sid, s.loops())
            for sid, s in enumerate(shapes)
            if s.dim == 2
        ]
        for sid, shape in enumerate(shapes):
            if shape.dim != 0:
                continue
            for e in shape.edges():
                for oid, loops in poly_loops:
                    if oid == sid:
                        continue
                    if _lax_contains(loops, e.v0, SEMI_OPEN):
                        return OVERLAPPING_GEOMETRY
        return None

    def _finish(self, shapes) -> str | None:
        # chains crossing at a vertex (CheckVertexCrossings,
        # h:1090-1175)
        for sid, shape in enumerate(shapes):
            if shape.dim != 2:
                continue
            err = self._check_vertex_crossings(shape)
            if err:
                return err

        # polygon interiors disjoint: one vertex per chain checked for
        # containment under the OPEN model (h:1177-1227)
        poly_loops = [
            (sid, s.loops()) for sid, s in enumerate(shapes) if s.dim == 2
        ]
        for sid, shape in enumerate(shapes):
            if shape.dim == 0:
                continue
            for chain in shape.chains:
                if not chain:
                    continue
                vertex = np.asarray(chain[0][0], float)
                for _oid, loops in poly_loops:
                    if _lax_contains(loops, vertex, OPEN):
                        return OVERLAPPING_GEOMETRY
        return None

    def _check_vertex_crossings(self, shape: VShape) -> str | None:
        edges = shape.edges()
        # previous edge in the same chain, wrapping (PrevEdgeWrap)
        chain_edges: dict[int, list[VEdge]] = {}
        for e in edges:
            chain_edges.setdefault(e.chain_id, []).append(e)
        prev_id = {}
        for cid, ce in chain_edges.items():
            for e in ce:
                prev_id[e.edge_id] = ce[(e.offset - 1) % len(ce)].edge_id

        incident: dict[tuple, list[VEdge]] = {}
        for e in edges:
            incident.setdefault(_vkey(e.v0), []).append(e)
            if not np.array_equal(e.v0, e.v1):
                incident.setdefault(_vkey(e.v1), []).append(e)

        for key, inc in incident.items():
            if len(inc) <= 2:
                continue
            vertex = np.asarray(key, float)
            items = []  # (edge tuple, edge_id, chain, prev, sign)
            for e in inc:
                sign = -1 if np.array_equal(e.v0, vertex) else +1
                items.append(((e.v0, e.v1), e.edge_id, e.chain_id,
                              prev_id[e.edge_id], sign))
            order = sort_edges_ccw(
                vertex, items[0][0], [it[0] for it in items]
            )

            def find_item(edge_t):
                for it in items:
                    if np.array_equal(
                        np.asarray(it[0][0], float),
                        np.asarray(edge_t[0], float),
                    ) and np.array_equal(
                        np.asarray(it[0][1], float),
                        np.asarray(edge_t[1], float),
                    ):
                        return it
                raise AssertionError

            ordered = [find_item(e) for e in order]
            m = len(ordered)
            for i in range(m):
                curr = ordered[i]
                if curr[4] > 0:
                    continue  # skip to next outgoing edge
                sums: dict[int, int] = {}
                found = False
                for j in range(1, m):
                    edge = ordered[(i + j) % m]
                    if curr[2] == edge[2] and curr[3] == edge[1]:
                        if any(v != 0 for v in sums.values()):
                            return OVERLAPPING_GEOMETRY
                        found = True
                        break
                    sums[edge[2]] = sums.get(edge[2], 0) + edge[4]
                if not found:
                    return INVALID_VERTEX
        return None


class LegacyValidQuery(ValidQuery):
    """S2LegacyValidQuery (s2validation_query.h:1232-1340)."""

    def __init__(self):
        super().__init__()
        self.allow_degenerate_edges = False
        self.allow_reverse_duplicates = False

    def _start(self, shapes) -> str | None:
        dim = -1
        for shape in shapes:
            if dim < 0:
                dim = shape.dim
            if dim != shape.dim:
                return INVALID_DIMENSION
        return None

    def _check_shape(self, shape, shape_id, shapes) -> str | None:
        if shape.dim == 2:
            has_empty = False
            for chain in shape.chains:
                if len(chain) == 0:
                    has_empty = True
                elif len(chain) < 3:
                    return LOOP_NOT_ENOUGH_VERTICES
            if has_empty and len(shape.chains) > 1:
                return POLYGON_EMPTY_LOOP
        return super()._check_shape(shape, shape_id, shapes)

    def _start_cell_checks(self, shapes) -> str | None:
        # duplicate vertices within one chain (h:1297-1323)
        for shape in shapes:
            for chain in shape.chains:
                seen = set()
                for v0, _v1 in chain:
                    k = _vkey(np.asarray(v0, float))
                    if k in seen:
                        return DUPLICATE_VERTICES
                    seen.add(k)
        return super()._start_cell_checks(shapes)
