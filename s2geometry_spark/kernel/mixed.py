"""Mixed-dimension S2BooleanOperation: points x polylines x polygons
with boundary models (s2boolean_operation.h:100-183).

Re-derivation of the reference's dimension and boundary-model semantics:

  - PolygonModel OPEN / SEMI_OPEN / CLOSED controls whether a polygon
    contains its vertices / edges / reversed edges
    (s2boolean_operation.h:132-153).
  - PolylineModel OPEN / SEMI_OPEN / CLOSED controls which of a
    polyline's vertices are points of the polyline
    (s2boolean_operation.h:110-130); polyline_loops_have_boundaries
    gives closed polyline loops a merged, always-contained endpoint
    (s2boolean_operation.h options, s2boolean_operation_test.cc
    PointOpenPolylineLoopBoundariesFalse).
  - Dimension rules (s2boolean_operation.h:158-183): UNION - the
    higher-dimensional shape wins; INTERSECTION - the lower-dimensional
    shape wins; DIFFERENCE - subtracting a lower-dimensional shape has
    no effect.

The output mirrors the reference's layer protocol: the portion of EACH
input feature that belongs to the result is emitted independently, so
coincident features produce duplicate output rows exactly as
s2boolean_operation_test.cc expects ("the output consists of the
portion of each input polyline that intersects the opposite region").
Isolated polyline vertices are emitted as degenerate edges (v, v), and
only when no incident kept sub-edge already carries them
(s2boolean_operation_test.cc "vertex is not emitted because an
incident edge is").

General-position caveat shared with kernel/booleans._split_edges:
coincident boundaries must be exactly shared (bitwise equal edges);
*partially* overlapping collinear edges require the snap-composed path
(booleans.boolean_op_snapped).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import predicates as P
from .booleans import (
    _edges_of,
    _intersection_point,
    boolean_op_with_degeneracies,
    difference,
    intersection,
    symmetric_difference,
    union,
)
from .contains import Loop, Polygon, parse_points

OPEN = "OPEN"
SEMI_OPEN = "SEMI_OPEN"
CLOSED = "CLOSED"

OP_TYPES = ("union", "intersection", "difference", "symmetric_difference")


@dataclass
class MixedOptions:
    """S2BooleanOperation::Options subset (s2boolean_operation.h:295-330,
    defaults s2boolean_operation.h:450-451)."""

    polygon_model: str = SEMI_OPEN
    polyline_model: str = CLOSED
    polyline_loops_have_boundaries: bool = True
    # split_all_crossing_polyline_edges (s2boolean_operation.h:360-376):
    # also add a vertex at every polyline self-/same-operand crossing,
    # not just at crossings between the two operands
    split_all_crossing_polyline_edges: bool = False


@dataclass
class MixedGeometry:
    """One operand: dimension-0 points, dimension-1 polylines,
    dimension-2 polygon (s2textformat 'points # polylines # polygon')."""

    points: np.ndarray = field(
        default_factory=lambda: np.empty((0, 3), np.float64)
    )
    polylines: list = field(default_factory=list)
    polygon: Polygon = field(default_factory=lambda: Polygon([]))
    # degenerate polygon features carried alongside (CLOSED-model
    # outputs of boolean_op_with_degeneracies)
    deg_edges: list = field(default_factory=list)
    deg_points: list = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return (
            len(self.points) == 0
            and not self.polylines
            and not self.polygon.loops
            and not self.deg_edges
            and not self.deg_points
        )


def parse_mixed(s: str) -> MixedGeometry:
    """s2textformat index string 'p1 | p2 # line1 | line2 # loop1; loop2'
    (s2text_format.h MakeIndex)."""
    parts = s.split("#")
    while len(parts) < 3:
        parts.append("")
    pts_s, lines_s, poly_s = parts[0], parts[1], parts[2]
    pts = []
    for tok in pts_s.split("|"):
        tok = tok.strip()
        if tok:
            pts.append(parse_points(tok)[0])
    points = (
        np.asarray(pts) if pts else np.empty((0, 3), np.float64)
    )
    lines = []
    for tok in lines_s.split("|"):
        tok = tok.strip()
        if tok:
            lines.append(parse_points(tok))
    loops = []
    deg_points = []
    for tok in poly_s.split(";"):
        tok = tok.strip()
        if not tok:
            continue
        v = parse_points(tok)
        if len(v) == 1:
            # single-vertex loop = degenerate point shell (the Polygon
            # class would canonicalize it to the empty loop); carried in
            # deg_points like the CLOSED-model boolean outputs
            deg_points.append((v[0], "shell"))
        else:
            loops.append(Loop(v))
    from .contains import lax_polygon_reading

    # MakeIndexOrDie's polygon part is a LAX polygon: loop orientation is
    # meaningful (interior on the left), so CW-wound holes need the
    # complement vote (see parse_lax_polygon) before the even-odd Polygon
    # reading is used — s2boolean_operation_test.cc OverlappingDoughnuts
    # is the canonical CW-hole fixture.
    return MixedGeometry(
        points, lines, lax_polygon_reading(Polygon(loops)),
        deg_points=deg_points,
    )


# ---------------------------------------------------------------------------
# point-set membership


def _vkey(v) -> tuple:
    return (float(v[0]), float(v[1]), float(v[2]))


def _on_edge_interior(p, c, d) -> bool:
    """p strictly interior to edge CD (on the same great circle, between
    the endpoints; edges < pi).  Endpoint-equal returns False - endpoint
    membership is the vertex-occurrence rule's job."""
    if np.array_equal(p, c) or np.array_equal(p, d):
        return False
    if np.array_equal(c, d):
        return False
    if int(P.sign(c[None], d[None], p[None])[0]) != 0:
        return False
    cd = float(c @ d)
    return float(p @ c) > cd and float(p @ d) > cd


def _normalize_polyline(v: np.ndarray):
    """Drop degenerate (consecutive-duplicate) edges the way the
    reference's graph layer does: 'AA has one edge but AAA has no edges'
    (s2boolean_operation_test.cc:184-186).  Returns (vertices, is_deg)
    or (None, False) for an edge-free polyline."""
    v = np.asarray(v, np.float64).reshape(-1, 3)
    if len(v) < 2:
        return None, False
    out = [v[0]]
    for p in v[1:]:
        if not np.array_equal(p, out[-1]):
            out.append(p)
    if len(out) == 1:
        if len(v) == 2:
            return np.stack([v[0], v[0]]), True  # degenerate edge AA
        return None, False  # AAA and longer: no edges at all
    return np.stack(out), False


def _occurrence_is_point(
    line: np.ndarray, is_deg: bool, k: int, model: str, lhb: bool
) -> bool:
    """Whether vertex occurrence k of the (normalized) polyline is a
    point of the polyline (s2boolean_operation.h:110-130).  For loops
    with polyline_loops_have_boundaries()==false the two endpoint
    occurrences merge into occurrence 0 (always contained); occurrence
    n-1 then does not exist."""
    n = len(line)
    if is_deg:
        return model == CLOSED and k == 0
    is_loop = bool(np.array_equal(line[0], line[-1]))
    if 0 < k < n - 1:
        return True
    if is_loop and not lhb:
        return k == 0  # merged endpoint, contained under every model
    if model == OPEN:
        return False
    if model == SEMI_OPEN:
        return k == 0
    return True  # CLOSED


def polyline_contains_point(
    polylines: list, p: np.ndarray, model: str, lhb: bool
) -> bool:
    """Set membership of point p in a polyline collection: p equals a
    vertex occurrence that is a point of its polyline, or p lies in an
    edge interior (edge interiors are model-independent)."""
    for raw in polylines:
        line, is_deg = _normalize_polyline(raw)
        if line is None:
            continue
        for k in range(len(line)):
            if np.array_equal(line[k], p) and _occurrence_is_point(
                line, is_deg, k, model, lhb
            ):
                return True
        if not is_deg:
            for i in range(len(line) - 1):
                if _on_edge_interior(p, line[i], line[i + 1]):
                    return True
    return False


def _polygon_boundary_contains(poly: Polygon, p: np.ndarray) -> bool:
    for loop in poly.loops:
        v = loop.vertices
        for i in range(len(v)):
            if np.array_equal(v[i], p):
                return True
        if len(v) >= 2:
            for i in range(len(v)):
                if _on_edge_interior(p, v[i], v[(i + 1) % len(v)]):
                    return True
    return False


def polygon_contains_point(poly: Polygon, p: np.ndarray, model: str) -> bool:
    """Point containment per PolygonModel (s2boolean_operation.h:132-153):
    SEMI_OPEN is the engine's native crossing-parity semantics
    (s2contains_point_query.h:37-54); OPEN subtracts the boundary,
    CLOSED adds it."""
    if not poly.loops:
        return False
    if model == SEMI_OPEN:
        return bool(poly.contains(p[None])[0])
    on_b = _polygon_boundary_contains(poly, p)
    if model == OPEN:
        return (not on_b) and bool(poly.contains(p[None])[0])
    return on_b or bool(poly.contains(p[None])[0])


def _point_in_geometry(
    p: np.ndarray,
    g: MixedGeometry,
    opt: MixedOptions,
    include_points: bool,
) -> bool:
    if include_points and len(g.points) and (
        (g.points == p[None]).all(-1).any()
    ):
        return True
    if polyline_contains_point(
        g.polylines, p, opt.polyline_model, opt.polyline_loops_have_boundaries
    ):
        return True
    return polygon_contains_point(g.polygon, p, opt.polygon_model)


# ---------------------------------------------------------------------------
# polyline clipping


def _polygon_edge_dirs(poly: Polygon) -> dict:
    """Directed polygon boundary edges -> +1 (as given); their siblings
    -> -1.  Degenerate 1-vertex loops contribute no edges."""
    dirs: dict = {}
    for loop in poly.loops:
        v = loop.vertices
        n = len(v)
        if n < 2:
            continue
        rng = range(n) if n > 2 else range(1)  # 2-vertex loop: one pair
        for i in rng:
            c, d = v[i], v[(i + 1) % n]
            if np.array_equal(c, d):
                continue
            dirs.setdefault((_vkey(c), _vkey(d)), 1)
            dirs.setdefault((_vkey(d), _vkey(c)), -1)
    if len([l for l in poly.loops if len(l.vertices) == 2]) and not dirs:
        pass
    # 2-vertex loops are sibling pairs: both directions are "as given"
    for loop in poly.loops:
        v = loop.vertices
        if len(v) == 2 and not np.array_equal(v[0], v[1]):
            dirs[(_vkey(v[0]), _vkey(v[1]))] = 1
            dirs[(_vkey(v[1]), _vkey(v[0]))] = 1
    return dirs


def _line_edge_set(polylines: list) -> set:
    """Undirected bitwise edge keys of a polyline collection, including
    degenerate AA edges."""
    keys = set()
    for raw in polylines:
        line, is_deg = _normalize_polyline(raw)
        if line is None:
            continue
        if is_deg:
            k = _vkey(line[0])
            keys.add((k, k))
            continue
        for i in range(len(line) - 1):
            a, b = _vkey(line[i]), _vkey(line[i + 1])
            keys.add((a, b))
            keys.add((b, a))
    return keys


def _coincident_edge_in_polygon(
    a_key: tuple, b_key: tuple, poly_dirs: dict, model: str
) -> bool:
    """A polyline edge exactly coinciding with a polygon boundary edge:
    contained per PolygonModel (same direction: SEMI_OPEN + CLOSED;
    reversed: CLOSED only; s2boolean_operation.h:139-153)."""
    d = poly_dirs.get((a_key, b_key))
    if d is None:
        return False
    if model == OPEN:
        return False
    if model == CLOSED:
        return True
    return d > 0  # SEMI_OPEN: forward edges only


def _cut_points(a, b, other_edges, tag: str) -> list:
    """Interior crossing points of edge AB with a directed edge list,
    as (point, tag) rows (tag records what was crossed: 'poly' boundary
    or 'line' edge)."""
    cuts = []
    for c, d in other_edges:
        if np.array_equal(c, d):
            continue
        if P.crossing_sign(a, b, c, d) > 0:
            cuts.append((_intersection_point(a, b, c, d), tag))
    return cuts


def _clip_polyline(
    raw_line: np.ndarray,
    other: MixedGeometry,
    opt: MixedOptions,
    mode: str,
    self_lines: list | None = None,
) -> list:
    """The portion of one polyline that belongs to the result.

    mode:
      'intersect'      - keep sub-edges inside `other` (polygon region
                         per polygon_model, or coincident with an
                         `other` polyline edge - either direction,
                         model-independent); isolated vertices where the
                         point is in `other` and no kept sub-edge is
                         incident.
      'subtract'       - complement of 'intersect' for edges; isolated
                         vertices where the point is NOT in `other`.
      'union_subtract' - UNION semantics: only the polygon region of
                         `other` removes material (the higher dimension
                         wins; coincident polylines both survive);
                         chains still split at polyline crossings so
                         crossing vertices appear in the output.
    Returns a list of (n,3) chains (degenerate (2,3) chains for isolated
    vertices and degenerate edges).
    """
    line, is_deg = _normalize_polyline(raw_line)
    if line is None:
        return []
    model = opt.polyline_model
    lhb = opt.polyline_loops_have_boundaries
    poly_dirs = _polygon_edge_dirs(other.polygon)
    poly_edges = _edges_of(other.polygon)
    line_keys = _line_edge_set(other.polylines)
    other_line_edges = []
    for raw in other.polylines:
        ol, od = _normalize_polyline(raw)
        if ol is None or od:
            continue
        for i in range(len(ol) - 1):
            other_line_edges.append((ol[i], ol[i + 1]))
    self_line_edges = []
    if opt.split_all_crossing_polyline_edges and self_lines is not None:
        # split_all_crossing_polyline_edges: same-operand (incl. self-)
        # crossings also become vertices; tagged 'self' so the
        # crossing-POINT emission below (operand overlap only) skips them
        for raw in self_lines:
            ol, od = _normalize_polyline(raw)
            if ol is None or od:
                continue
            for i in range(len(ol) - 1):
                self_line_edges.append((ol[i], ol[i + 1]))

    keep_inside = mode == "intersect"
    edge_uses_lines = mode in ("intersect", "subtract")
    vertex_uses_lines = mode in ("intersect", "subtract")
    vertex_wants_in = mode == "intersect"

    def point_in_other(p) -> bool:
        if vertex_uses_lines and polyline_contains_point(
            other.polylines, p, model, lhb
        ):
            return True
        return polygon_contains_point(other.polygon, p, opt.polygon_model)

    if is_deg:
        p = line[0]
        if mode == "union_subtract":
            keep = not polygon_contains_point(
                other.polygon, p, opt.polygon_model
            )
        else:
            keep = point_in_other(p) == keep_inside
        return [np.stack([p, p])] if keep else []

    n = len(line)
    is_loop = bool(np.array_equal(line[0], line[-1]))
    merged = is_loop and not lhb

    # --- split every edge, classify every sub-edge -------------------------
    # per input edge i: list of (sub_a, sub_b, kept)
    edge_subs: list = []
    for i in range(n - 1):
        a, b = line[i], line[i + 1]
        akey, bkey = _vkey(a), _vkey(b)
        on_line = edge_uses_lines and (akey, bkey) in line_keys
        in_poly_coincident = _coincident_edge_in_polygon(
            akey, bkey, poly_dirs, opt.polygon_model
        )
        if (akey, bkey) in poly_dirs:
            # exactly-coincident with the polygon boundary: membership is
            # the model rule, no splitting
            member = in_poly_coincident or on_line
            kept = member == keep_inside if mode != "union_subtract" else (
                not in_poly_coincident
            )
            edge_subs.append([(a, b, kept, None)])
            continue
        cuts = _cut_points(a, b, poly_edges, "poly") + _cut_points(
            a, b, other_line_edges, "line"
        )
        if self_line_edges:
            cuts += _cut_points(a, b, self_line_edges, "self")
        if len(cuts) > 1:
            t = b - a * float(a @ b)
            t = t / np.linalg.norm(t)
            cuts.sort(
                key=lambda x: np.arctan2(float(x[0] @ t), float(x[0] @ a))
            )
            # crossings with BOTH edges of a degenerate sibling pair
            # (e.g. the MeridianSplitting sliver) land on the same
            # point: one vertex, not two
            deduped = [cuts[0]]
            for cpt in cuts[1:]:
                if not np.array_equal(cpt[0], deduped[-1][0]):
                    deduped.append(cpt)
            cuts = deduped
        chain = [(a, None)] + cuts + [(b, None)]
        subs = []
        for j in range(len(chain) - 1):
            c, d = chain[j][0], chain[j + 1][0]
            m = c + d
            m = m / np.linalg.norm(m)
            in_poly = bool(other.polygon.contains(m[None])[0])
            on_l = on_line  # full-edge coincidence only (general position)
            if mode == "union_subtract":
                kept = not in_poly
            else:
                member = in_poly or on_l
                kept = member == keep_inside
            # tag of the vertex ENDING this sub-edge ('line'/'poly' for
            # cut vertices, None for the input endpoint)
            subs.append((c, d, kept, chain[j + 1][1]))
        edge_subs.append(subs)

    # --- assemble kept chains ---------------------------------------------
    chains: list = []
    current: list = []
    for subs in edge_subs:
        for c, d, kept, _tag in subs:
            if not kept:
                if len(current) > 1:
                    chains.append(np.stack(current))
                current = []
                continue
            if current and np.array_equal(current[-1], c):
                current.append(d)
            else:
                if len(current) > 1:
                    chains.append(np.stack(current))
                current = [c, d]
    if len(current) > 1:
        chains.append(np.stack(current))

    # --- isolated vertices -------------------------------------------------
    # occurrence k's incident kept sub-edges: last sub of edge k-1 and
    # first sub of edge k (merged loop endpoint: last sub of edge n-2
    # and first sub of edge 0).
    def incident_kept(k: int) -> bool:
        ins, outs = [], []
        if merged and k == 0:
            ins.append(edge_subs[n - 2][-1])
            outs.append(edge_subs[0][0])
        else:
            if k > 0:
                ins.append(edge_subs[k - 1][-1])
            if k < n - 1:
                outs.append(edge_subs[k][0])
        return any(s[2] for s in ins + outs)

    occurrences = range(n - 1) if merged else range(n)
    for k in occurrences:
        if not _occurrence_is_point(line, is_deg, k, model, lhb):
            continue
        if incident_kept(k):
            continue
        p = line[k]
        if mode == "intersect":
            emit = point_in_other(p)
        else:
            emit = not point_in_other(p)
        if emit:
            chains.append(np.stack([p, p]))

    # --- crossing-point vertices (intersect mode only) ---------------------
    # an interior crossing with an `other` polyline edge is a point of
    # both operands; when neither incident sub-edge is kept it surfaces
    # as an isolated degenerate edge (PolylineEdgePolylineEdgeCrossing).
    if mode == "intersect" and other_line_edges:
        for subs in edge_subs:
            for j in range(len(subs) - 1):
                c_kept = subs[j][2]
                d_kept = subs[j + 1][2]
                v = subs[j][1]  # shared cut vertex
                if not c_kept and not d_kept and subs[j][3] == "line":
                    # only line-line cuts qualify (polygon-boundary cuts
                    # separate kept/dropped regions by construction)
                    chains.append(np.stack([v, v]))
    return chains


def directed_boundary_loops(poly: Polygon) -> list:
    """Orient each loop of an all-CCW even-odd polygon by nesting depth,
    the reference's directed-boundary convention (interior on the left:
    shells CCW, holes CW — s2polygon.h loop depth semantics).  Returns
    the vertex arrays, holes reversed."""
    from .measures import loop_signed_area

    if not poly.loops:
        return []
    reps = []
    ccw = []
    for loop in poly.loops:
        v = loop.vertices
        if len(v) < 3 or len({tuple(p) for p in v}) < 3:
            # fully-degenerate residue rings (e.g. sibling-pair slivers
            # from a degenerate-operand difference) carry no interior
            reps.append(None)
            ccw.append(True)
            continue
        is_ccw = loop_signed_area(v) >= 0
        ccw.append(bool(is_ccw))
        k = next(i for i in range(len(v))
                 if not np.array_equal(v[i], v[(i + 1) % len(v)]))
        c, d = v[k], v[(k + 1) % len(v)]
        m = c + d
        m = m / np.linalg.norm(m)
        t = d - c
        t = t - m * float(m @ t)
        t = t / np.linalg.norm(t)
        side = np.cross(m, t) if is_ccw else -np.cross(m, t)
        rep = m + 1e-9 * side  # just inside the loop's enclosed region
        reps.append(rep / np.linalg.norm(rep))
    out = []
    for i, loop in enumerate(poly.loops):
        v = loop.vertices
        if reps[i] is None:
            out.append(v)
            continue
        # depth counts enclosing loops by their ENCLOSED region: a
        # CW-written loop's S2 region is the complement of what it
        # encloses, so XOR with its orientation
        depth = sum(
            1
            for j, other in enumerate(poly.loops)
            if j != i
            and len(other.vertices) >= 3
            and bool(other.contains(reps[i][None])[0]) == ccw[j]
        )
        want_ccw = depth % 2 == 0
        out.append(v if ccw[i] == want_ccw else v[::-1].copy())
    return out


# ---------------------------------------------------------------------------
# the operation


def _polygon_part(a: Polygon, b: Polygon, op: str, model: str):
    """Dimension-2 output (+ CLOSED-model degenerate features)."""
    if not a.loops and not b.loops:
        return Polygon([]), [], []
    if not a.loops:
        if op in ("union", "symmetric_difference"):
            return b, [], []
        return Polygon([]), [], []
    if not b.loops:
        if op == "intersection":
            return Polygon([]), [], []
        return a, [], []
    if model == CLOSED:
        return boolean_op_with_degeneracies(a, b, op)
    fns = {
        "union": union,
        "intersection": intersection,
        "difference": difference,
        "symmetric_difference": symmetric_difference,
    }
    return fns[op](a, b), [], []


def _split_output_polygon(
    poly: Polygon, a: MixedGeometry, b: MixedGeometry
) -> Polygon:
    """Insert cross-operand polyline x polygon-boundary crossing points
    as vertices of the output polygon.

    The reference's CrossingProcessor records an intersection vertex at
    every crossing between an operand-A edge and an operand-B edge
    regardless of dimension, so a polyline that crosses the other
    operand's polygon boundary leaves a vertex in the POLYGON output too
    (s2boolean_operation_test.cc PolylineCrossingRectangleTwice: the
    rectangle gains vertices 1:0, 0:-1, -1:0, 0:1).  Same-operand
    crossings are never split (only A x B pairs are processed).
    """
    pairs = []
    for lines, other_poly in ((a.polylines, b.polygon),
                              (b.polylines, a.polygon)):
        if not lines or not other_poly.loops:
            continue
        poly_edges = _edges_of(other_poly)
        for raw in lines:
            line = np.asarray(raw, np.float64).reshape(-1, 3)
            for i in range(len(line) - 1):
                c, d = line[i], line[i + 1]
                if np.array_equal(c, d):
                    continue
                for p, q in poly_edges:
                    if P.crossing_sign(c, d, p, q) > 0:
                        pairs.append((p, q, _intersection_point(c, d, p, q)))
    if not pairs or not poly.loops:
        return poly

    def _arcpos(p, t, y):
        return float(np.arctan2(y @ t, y @ p))

    new_loops = []
    changed = False
    for loop in poly.loops:
        v = loop.vertices
        if len(v) < 3:
            new_loops.append(loop)
            continue
        out = []
        for i in range(len(v)):
            u, w = v[i], v[(i + 1) % len(v)]
            out.append(u)
            cuts = []
            for p, q, x in pairs:
                n = np.cross(p, q)
                nn = np.linalg.norm(n)
                if nn == 0.0:
                    continue
                n = n / nn
                # output edge (u,w) must be a sub-segment of input edge
                # (p,q): both endpoints on its great circle and inside
                # the arc (output edges are never split across inputs)
                if abs(float(n @ u)) > 1e-12 or abs(float(n @ w)) > 1e-12:
                    continue
                t = np.cross(n, p)
                send = _arcpos(p, t, q)
                su, sw, sx = (_arcpos(p, t, y) for y in (u, w, x))
                eps = 1e-15
                if not (-eps <= su <= send + eps and -eps <= sw <= send + eps):
                    continue
                lo, hi = (su, sw) if su < sw else (sw, su)
                if lo + 1e-14 < sx < hi - 1e-14:
                    cuts.append((abs(sx - su), x))
            cuts.sort(key=lambda r: r[0])
            kept = []
            for _, x in cuts:
                if not kept or not np.array_equal(kept[-1], x):
                    kept.append(x)
            out.extend(kept)
            changed = changed or bool(kept)
        new_loops.append(Loop(np.asarray(out, np.float64)))
    return Polygon(new_loops) if changed else poly


def mixed_boolean_op(
    a: MixedGeometry,
    b: MixedGeometry,
    op: str,
    opt: MixedOptions | None = None,
) -> MixedGeometry:
    """S2BooleanOperation over mixed-dimension operands
    (s2boolean_operation.h:158-183 dimension rules; all four OpTypes)."""
    if opt is None:
        opt = MixedOptions()
    if op not in OP_TYPES:
        raise ValueError(f"unknown op {op!r}")

    # whole-operand passthrough preserves degeneracies bit-exactly
    # (s2boolean_operation_test.cc DegeneratePolylines/DegeneratePolygons)
    if b.is_empty:
        if op == "intersection":
            return MixedGeometry()
        return a
    if a.is_empty:
        if op in ("union", "symmetric_difference"):
            return b
        return MixedGeometry()

    out_points: list = []
    out_lines: list = []

    def add_points(src: MixedGeometry, other: MixedGeometry, want_in: bool,
                   include_points: bool):
        for p in src.points:
            got = _point_in_geometry(p, other, opt, include_points)
            if got == want_in:
                out_points.append(p)

    if op == "union":
        # higher dimension wins: points survive unless a polyline or the
        # polygon of the other operand covers them; polylines lose only
        # to the other polygon
        add_points(a, b, want_in=False, include_points=False)
        add_points(b, a, want_in=False, include_points=False)
        for line in a.polylines:
            out_lines.extend(_clip_polyline(line, b, opt, "union_subtract",
                                            self_lines=a.polylines))
        for line in b.polylines:
            out_lines.extend(_clip_polyline(line, a, opt, "union_subtract",
                                            self_lines=b.polylines))
    elif op == "intersection":
        add_points(a, b, want_in=True, include_points=True)
        add_points(b, a, want_in=True, include_points=True)
        for line in a.polylines:
            out_lines.extend(_clip_polyline(line, b, opt, "intersect",
                                            self_lines=a.polylines))
        for line in b.polylines:
            out_lines.extend(_clip_polyline(line, a, opt, "intersect",
                                            self_lines=b.polylines))
    elif op == "difference":
        add_points(a, b, want_in=False, include_points=True)
        for line in a.polylines:
            out_lines.extend(_clip_polyline(line, b, opt, "subtract",
                                            self_lines=a.polylines))
    else:  # symmetric_difference
        add_points(a, b, want_in=False, include_points=True)
        add_points(b, a, want_in=False, include_points=True)
        for line in a.polylines:
            out_lines.extend(_clip_polyline(line, b, opt, "subtract",
                                            self_lines=a.polylines))
        for line in b.polylines:
            out_lines.extend(_clip_polyline(line, a, opt, "subtract",
                                            self_lines=b.polylines))

    poly, deg_e, deg_p = _polygon_part(
        a.polygon, b.polygon, op, opt.polygon_model
    )
    poly = _split_output_polygon(poly, a, b)
    pts = (
        np.asarray(out_points)
        if out_points
        else np.empty((0, 3), np.float64)
    )
    return MixedGeometry(pts, out_lines, poly, deg_e, deg_p)
