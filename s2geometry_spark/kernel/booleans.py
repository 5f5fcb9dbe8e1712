"""Polygon boolean operations (intersection / union / difference) for
boundaries in general position — the S2BooleanOperation core semantics
(s2boolean_operation.h:37-90) without snap rounding.

Overlay algorithm:
 1. find all proper edge crossings between the two boundaries (robust
    CrossingSign) and their intersection points (normalized
    (a×b)×(c×d), sign-corrected into both edges — the double-precision
    head of S2::GetIntersection, s2edge_crossings.h:220);
 2. split each edge at its crossings (ordered along the edge);
 3. classify each sub-edge by whether its midpoint is inside the other
    polygon (the exact crossing-parity PIP);
 4. keep, per op:      intersection: a∧in(b)  +  b∧in(a)
                        union:        a∧¬in(b) +  b∧¬in(a)
                        difference:   a∧¬in(b) +  reversed(b∧in(a))
 5. walk the directed sub-edge graph to assemble output loops (at a
    transversal crossing exactly one kept edge leaves each kept entry).

Shared boundaries are supported: exactly-shared edges resolve by
orientation rules, shared vertices by max-CCW-turn face tracing.
*Partially* overlapping collinear edges go through `boolean_op_snapped`,
which composes the S2Builder snap machinery (one joint site set + the
exact Voronoi edge phase) in front of the overlay — the reference's own
architecture (s2boolean_operation.h snap_function) — turning collinear
overlaps into exactly-shared sub-chains.
"""

from __future__ import annotations

import math

import numpy as np

from . import predicates as P
from .contains import Loop, Polygon


def _edges_of(poly: Polygon):
    """Directed boundary edges with the POLYGON interior on the left:
    odd-depth loops (holes) are traversed reversed (even_odd_signs).
    Classification by midpoint PIP is direction-independent, but the
    crossing-vertex assembly's max-CCW-turn face tracing and the kept
    directions assume interior-on-left — holes crossing the other
    operand (the interlocking-doughnut case of s2polygon_test.cc
    Operations) mis-assemble without this."""
    loops_v = [l.vertices for l in poly.loops if len(l.vertices) >= 3]
    if not loops_v:
        return []
    from .measures import even_odd_signs

    signs = even_odd_signs(loops_v) if len(loops_v) > 1 else [1]
    out = []
    for sgn, v in zip(signs, loops_v):
        w = v if sgn > 0 else v[::-1]
        for i in range(len(w)):
            out.append((w[i], w[(i + 1) % len(w)]))
    return out


_DBL_ERR = 0.5 * 2.220446049250313e-16  # rounding_epsilon<double>
_SQRT3 = 1.7320508075688772
_INTERSECTION_ERROR = 8 * _DBL_ERR  # kIntersectionError (s2edge_crossings.cc:74)
_DBL_MIN = 2.2250738585072014e-308


def _get_projection(x, a_norm, a_norm_len: float, a0, a1):
    """x·a_norm with a computed error bound (GetProjection,
    s2edge_crossings.cc:517-555).  Using the vector from x to the CLOSER
    edge endpoint instead of x itself shrinks the dot-product error by a
    huge factor; the endpoint tie-break is order-invariant."""
    x0 = x - a0
    x1 = x - a1
    x0_d2 = float(x0 @ x0)
    x1_d2 = float(x1 @ x1)
    if x0_d2 < x1_d2 or (x0_d2 == x1_d2 and tuple(x0) < tuple(x1)):
        dist = math.sqrt(x0_d2)
        result = float(x0 @ a_norm)
    else:
        dist = math.sqrt(x1_d2)
        result = float(x1 @ a_norm)
    error = (
        ((3.5 + 2 * _SQRT3) * a_norm_len + 32 * _SQRT3 * _DBL_ERR) * dist
        + 1.5 * abs(result)
    ) * _DBL_ERR
    return result, error


def _intersection_stable_sorted(a0, a1, b0, b1):
    """GetIntersectionStableSorted for T=double
    (s2edge_crossings.cc:556-624): interpolate along the SHORTER edge
    (b0,b1) to the fractional distance where it crosses the plane of the
    longer edge, with a rigorous error bound; returns None when the
    bound exceeds kIntersectionError (→ exact tier)."""
    a_norm = np.cross(a0 - a1, a0 + a1)
    a_norm_len = float(np.linalg.norm(a_norm))
    b_len = float(np.linalg.norm(b1 - b0))
    b0_dist, b0_error = _get_projection(b0, a_norm, a_norm_len, a0, a1)
    b1_dist, b1_error = _get_projection(b1, a_norm, a_norm_len, a0, a1)
    # ensure (b0_dist - b1_dist) >= 0 so we return the point, not its
    # antipode
    if b0_dist < b1_dist:
        b0_dist, b1_dist = -b0_dist, -b1_dist
    dist_sum = b0_dist - b1_dist
    error_sum = b0_error + b1_error
    if dist_sum <= error_sum:
        return None  # error unbounded
    x = b0_dist * b1 - b1_dist * b0
    error = (
        b_len * abs(b0_dist * b1_error - b1_dist * b0_error)
        / (dist_sum - error_sum)
        + 2 * _DBL_ERR * dist_sum
    )
    x_len2 = float(x @ x)
    if x_len2 < _DBL_MIN:
        return None  # would lose precision in the normalization
    x_len = math.sqrt(x_len2)
    if error > (_INTERSECTION_ERROR - _DBL_ERR) * x_len:
        return None
    return x / x_len


def _compare_edges(a0, a1, b0, b1) -> bool:
    """Total order on edges invariant under reversal (CompareEdges,
    s2edge_crossings.h:57-64)."""
    ta0, ta1 = sorted([tuple(a0), tuple(a1)])
    tb0, tb1 = sorted([tuple(b0), tuple(b1)])
    return (ta0, ta1) < (tb0, tb1)


def _intersection_stable(a, b, c, d):
    """GetIntersectionStable (s2edge_crossings.cc:627-644): sort so the
    LONGER edge supplies the plane normal (less normal error) and the
    shorter one is interpolated (less interpolation error); the tie-break
    keeps the result invariant under operand swap/reversal."""
    # Norm2 in the reference's addition order (x² + y²) + z² — numpy's
    # small-vector dot may use FMA, which breaks the exact equal-length
    # ties the CompareEdges tie-break exists for.
    va, vb = b - a, d - c
    a_len2 = (va[0] * va[0] + va[1] * va[1]) + va[2] * va[2]
    b_len2 = (vb[0] * vb[0] + vb[1] * vb[1]) + vb[2] * vb[2]
    if a_len2 < b_len2 or (a_len2 == b_len2 and _compare_edges(a, b, c, d)):
        return _intersection_stable_sorted(c, d, a, b)
    return _intersection_stable_sorted(a, b, c, d)


def _intersection_point(a, b, c, d) -> np.ndarray:
    """Edge AB × edge CD crossing point (requires a proper crossing) —
    GetIntersection tiers (s2edge_crossings.cc:664-698): the
    double-precision STABLE path (plane projection + interpolation with a
    computed error bound — the Simple tier is double-unusable, its
    kMinResultLen ≥ 0.5 gate always fails for T=double, cc:482-486, so it
    is not ported), falling back to EXACT rational arithmetic (Fraction —
    doubles are dyadic rationals, so the cross products are exact like
    ExactFloat) when the bound exceeds kIntersectionError.  Rounded once
    to double and normalized; guaranteed within ~kIntersectionError of
    the true intersection."""
    x = _intersection_stable(a, b, c, d)
    if x is not None:
        if float(x @ (a + b + c + d)) < 0:
            x = -x
        return x
    return _intersection_exact(a, b, c, d)


def _intersection_exact(a0, a1, b0, b1) -> np.ndarray:
    """internal::GetIntersectionExact (s2edge_crossings.cc:666-709):
    exact rational cross products rounded once to double (Fraction plays
    the role of ExactFloat — doubles are dyadic rationals), oriented by
    Sign(a0, a1, b1).  When the two edges are EXACTLY collinear (still
    "crossing" under simulation of simplicity), returns the
    lexicographically smallest endpoint that lies in the interior of the
    other edge, exactly as the reference's heuristic."""
    from fractions import Fraction

    from . import predicates as P
    from .clipping import normalizable_from_exact, symbolic_cross_prod

    def fr(v):
        return tuple(Fraction(float(t)) for t in v)

    def fcross(p, q):
        return (
            p[1] * q[2] - p[2] * q[1],
            p[2] * q[0] - p[0] * q[2],
            p[0] * q[1] - p[1] * q[0],
        )

    fa0, fa1, fb0, fb1 = fr(a0), fr(a1), fr(b0), fr(b1)
    a_norm_xf = fcross(fa0, fa1)
    b_norm_xf = fcross(fb0, fb1)
    x_xf = fcross(a_norm_xf, b_norm_xf)
    if any(t != 0 for t in x_xf):
        x = normalizable_from_exact(x_xf)
        x = x / np.linalg.norm(x)
        s = int(P.sign(a0[None], a1[None], b1[None])[0])
        return s * x

    # The two edges are exactly collinear: of the four endpoints exactly
    # two lie in the interior of the other edge; return the smaller.
    a_norm = normalizable_from_exact(a_norm_xf)
    if not a_norm.any():
        a_norm = symbolic_cross_prod(np.asarray(a0, float), np.asarray(a1, float))
    else:
        a_norm = a_norm / np.linalg.norm(a_norm)
    b_norm = normalizable_from_exact(b_norm_xf)
    if not b_norm.any():
        b_norm = symbolic_cross_prod(np.asarray(b0, float), np.asarray(b1, float))
    else:
        b_norm = b_norm / np.linalg.norm(b_norm)

    best = None
    for cand, lo, hi, norm in (
        (a0, b0, b1, b_norm),
        (a1, b0, b1, b_norm),
        (b0, a0, a1, a_norm),
        (b1, a0, a1, a_norm),
    ):
        if P.ordered_ccw(
            np.asarray(lo, float), np.asarray(cand, float),
            np.asarray(hi, float), norm,
        ) and (best is None or tuple(cand) < tuple(best)):
            best = np.asarray(cand, float).copy()
    if best is None:
        raise ValueError("degenerate crossing (identical great circles)")
    return best


def _slerp_mid(a, b) -> np.ndarray:
    m = a + b
    n = np.linalg.norm(m)
    if n == 0:
        raise ValueError("antipodal edge midpoint")
    return m / n


def _split_edges(edges, other_edges, with_parent: bool = False):
    """For each directed edge, its crossing points ordered along the edge
    → list of sub-edges (a', b') (or (a', b', parent_idx) rows when
    `with_parent`).  Shared vertices and exactly-shared edges produce no
    cut (crossing_sign == 0); *partially* overlapping collinear edges are
    not supported (snap-rounding territory)."""
    subs = []
    for ei, (a, b) in enumerate(edges):
        cuts = []
        for c, d in other_edges:
            cs = P.crossing_sign(a, b, c, d)
            if cs > 0:
                cuts.append(_intersection_point(a, b, c, d))
        if cuts:
            # order cuts along AB by the angle from A in the (a, t̂) frame —
            # atan2 is monotone over the whole (0, π) edge span
            t = b - a * float(a @ b)
            t = t / np.linalg.norm(t)
            cuts.sort(key=lambda x: np.arctan2(float(x @ t), float(x @ a)))
            chain = [a] + cuts + [b]
        else:
            chain = [a, b]
        for i in range(len(chain) - 1):
            if with_parent:
                subs.append((chain[i], chain[i + 1], ei))
            else:
                subs.append((chain[i], chain[i + 1]))
    return subs


def _classify(subs, other: Polygon) -> np.ndarray:
    mids = np.array([_slerp_mid(a, b) for a, b in subs])
    return other.contains(mids)


def _tangent_toward(v: np.ndarray, w: np.ndarray) -> np.ndarray:
    t = w - v * float(v @ w)
    n = np.linalg.norm(t)
    return t / n if n > 0 else t


def _assemble_loops(directed_edges) -> list[np.ndarray]:
    """Walk directed edges into closed loops; vertices keyed bitwise.

    At a junction (shared vertex with several unused outgoing edges) the
    next edge is the one with the MAXIMUM counterclockwise angle from the
    reversed incoming direction — the interior-on-left face-tracing rule,
    which keeps touching rings separate instead of jumping between them.
    """
    by_start: dict[tuple, list[int]] = {}
    for i, (a, _b) in enumerate(directed_edges):
        by_start.setdefault(tuple(a), []).append(i)
    used = [False] * len(directed_edges)
    loops = []
    for i in range(len(directed_edges)):
        if used[i]:
            continue
        verts = []
        j = i
        while not used[j]:
            used[j] = True
            a, b = directed_edges[j]
            verts.append(a)
            nxts = [k for k in by_start.get(tuple(b), []) if not used[k]]
            if not nxts:
                if tuple(b) != tuple(directed_edges[i][0]):
                    raise ValueError("open chain in overlay (degenerate input)")
                break
            if len(nxts) == 1:
                j = nxts[0]
            else:
                v = b
                r = _tangent_toward(v, a)  # back toward where we came from
                e2 = np.cross(v, r)
                best, best_ang = None, -1.0
                for k in nxts:
                    cdir = _tangent_toward(v, directed_edges[k][1])
                    ang = math.atan2(float(cdir @ e2), float(cdir @ r)) % (
                        2 * math.pi
                    )
                    if ang > best_ang:
                        best, best_ang = k, ang
                j = best
        if len(verts) >= 3:
            loops.append(np.array(verts))
    return loops


def _side_contains(poly: Polygon, c, d, m, left: bool) -> bool:
    """EXACT lim_{ε→0⁺} poly.contains(m + ε·(left or right)) for a
    directed edge (c, d) that appears bit-exactly on one of `poly`'s
    rings.  No epsilon probes: a Loop's contains() region is BY
    CONSTRUCTION the region to the left of its directed edges (the
    origin_inside calibration via AngleContainsVertex encodes the
    reference's interior-on-left convention, s2loop.h), so rings that
    carry the edge answer structurally — same direction ⇒ the left side
    is interior, reversed ⇒ the right side is — and the remaining rings
    answer by the robust midpoint PIP (the midpoint lies exactly on no
    other ring in general position)."""
    key, rkey = (tuple(c), tuple(d)), (tuple(d), tuple(c))
    inside = False
    for loop in poly.loops:
        v = loop.vertices
        n = len(v)
        ring_edges = {(tuple(v[i]), tuple(v[(i + 1) % n])) for i in range(n)}
        if key in ring_edges:
            inside ^= left
        elif rkey in ring_edges:
            inside ^= not left
        else:
            inside ^= bool(loop.contains(m[None])[0])
    return inside




def _normalize_kept_edges(kept: list) -> list:
    """Sliver cleanup for SNAPPED inputs (the regime of the
    s2polygon_test.cc Bug regressions): merge kept-edge endpoints within
    4·kIntersectionError (the builder's crossing-site slop), drop the
    collapsed edges, dedupe exact directed duplicates, cancel kept
    sibling pairs (zero-area slivers), and prune dangling edges
    iteratively (a valid region boundary has balanced in/out degrees at
    every vertex).  Mirrors the winding operation's merge branch."""
    from collections import Counter

    merge2 = (4 * 8 * _DBL_ERR) ** 2
    remap: dict = {}

    def canon(t: tuple) -> tuple:
        while t in remap:
            t = remap[t]
        return t

    for c, d in kept:
        dd = c - d
        if float(dd @ dd) < merge2:
            kc, kd = canon(tuple(c)), canon(tuple(d))
            if kc != kd:
                lo, hi = (kc, kd) if kc < kd else (kd, kc)
                remap[hi] = lo
    out = []
    seen = set()
    for c, d in kept:
        kc, kd = canon(tuple(c)), canon(tuple(d))
        if kc == kd or (kc, kd) in seen:
            continue
        seen.add((kc, kd))
        out.append((np.asarray(kc), np.asarray(kd)))
    # cancel kept sibling pairs
    out = [
        (c, d)
        for c, d in out
        if (tuple(d), tuple(c)) not in seen
    ]
    # a dangling edge means the per-sub-edge classification was
    # inconsistent (one edge of a chain dropped) — signal the caller to
    # fall back to the winding-based resolution instead of silently
    # losing the chain
    outs = Counter(tuple(c) for c, d in out)
    ins = Counter(tuple(d) for c, d in out)
    for c, d in out:
        if ins.get(tuple(c), 0) == 0 or outs.get(tuple(d), 0) == 0:
            raise ValueError("inconsistent sliver classification")
    return out

def _overlay(a: Polygon, b: Polygon, keep_a_inside: bool, keep_b_inside: bool,
             reverse_b: bool, xor: bool = False, robust: bool = False) -> Polygon:
    raw_a = _edges_of(a)
    raw_b = _edges_of(b)
    # Exactly-shared boundary segments can't be classified by midpoint PIP
    # (the midpoint lies ON the other boundary).  Classify both SIDES of
    # the edge exactly (_side_contains — structural orientation, no
    # epsilon): the edge is on the result's boundary iff the op value
    # differs across it; keep it oriented result-left.
    if xor:
        op = lambda ia, ib: ia != ib  # symmetric difference
    elif reverse_b:
        op = lambda ia, ib: ia and not ib  # difference
    elif keep_a_inside:
        op = lambda ia, ib: ia and ib  # intersection
    else:
        op = lambda ia, ib: ia or ib  # union
    b_dir = {(tuple(c), tuple(d)) for c, d in raw_b}
    shared_kept = []
    a_rest, b_rest = [], []
    for c, d in raw_a:
        key, rkey = (tuple(c), tuple(d)), (tuple(d), tuple(c))
        if key in b_dir or rkey in b_dir:
            m = _slerp_mid(c, d)
            r_left = op(
                _side_contains(a, c, d, m, True), _side_contains(b, c, d, m, True)
            )
            r_right = op(
                _side_contains(a, c, d, m, False), _side_contains(b, c, d, m, False)
            )
            if r_left != r_right:
                shared_kept.append((c, d) if r_left else (d, c))
        else:
            a_rest.append((c, d))
    a_dir = {(tuple(c), tuple(d)) for c, d in raw_a}
    for c, d in raw_b:
        key, rkey = (tuple(c), tuple(d)), (tuple(d), tuple(c))
        if key not in a_dir and rkey not in a_dir:
            b_rest.append((c, d))

    ea = _split_edges(a_rest, b_rest)
    eb = _split_edges(b_rest, a_rest)
    a_in_b = _classify(ea, b)
    b_in_a = _classify(eb, a)
    if xor:
        # crossing any A edge flips ia, so with op = XOR every non-shared
        # A sub-edge is on the result boundary; a sub-edge inside B has
        # the result on its RIGHT (left: ia^ib = 1^1 = 0) → reverse it,
        # and symmetrically for B edges inside A
        kept = [
            e if not inside else (e[1], e[0]) for e, inside in zip(ea, a_in_b)
        ]
        kept += shared_kept
        b_kept = [
            e if not inside else (e[1], e[0]) for e, inside in zip(eb, b_in_a)
        ]
    else:
        kept = [e for e, inside in zip(ea, a_in_b) if inside == keep_a_inside]
        kept += shared_kept
        b_kept = [e for e, inside in zip(eb, b_in_a) if inside == keep_b_inside]
        if reverse_b:
            b_kept = [(d, c) for c, d in b_kept]
    all_kept = kept + b_kept
    if robust:
        all_kept = _normalize_kept_edges(all_kept)
    loops = _assemble_loops(all_kept)
    # Even-odd parity (Polygon.contains XORs per-loop crossing parities
    # seeded by each loop's origin_inside) needs every loop in its
    # "smaller than a hemisphere" orientation; reversed hole rings from
    # the difference path come out CW — flip them.  (Valid for result
    # components < 2π, i.e. all non-full outputs of these fixtures.)
    from .measures import loop_signed_area

    out = []
    for v in loops:
        if loop_signed_area(v) < 0:
            v = v[::-1].copy()
        out.append(Loop(v))
    return Polygon(out)


def intersection(a: Polygon, b: Polygon) -> Polygon:
    if a.is_empty or b.is_empty:
        return Polygon([])
    if a.is_full:
        return b
    if b.is_full:
        return a
    return _overlay(a, b, keep_a_inside=True, keep_b_inside=True, reverse_b=False)


def union(a: Polygon, b: Polygon) -> Polygon:
    if a.is_full or b.is_full:
        return Polygon([Loop(np.array([[0.0, 0.0, -1.0]]))])
    if a.is_empty:
        return b
    if b.is_empty:
        return a
    return _overlay(a, b, keep_a_inside=False, keep_b_inside=False, reverse_b=False)


def difference(a: Polygon, b: Polygon) -> Polygon:
    if a.is_empty or b.is_full:
        return Polygon([])
    if b.is_empty:
        return a
    return _overlay(a, b, keep_a_inside=False, keep_b_inside=True, reverse_b=True)


def symmetric_difference(a: Polygon, b: Polygon) -> Polygon:
    """S2BooleanOperation SYMMETRIC_DIFFERENCE as a DIRECT overlay op
    (OpType::SYMMETRIC_DIFFERENCE, s2boolean_operation.h:214) — not the
    (a∪b)−(a∩b) composition: with op = XOR every non-shared sub-edge of
    either operand is on the result boundary (oriented result-left), and
    exactly-shared segments classify structurally via _side_contains like
    the other ops.  A full operand yields the other operand's even-odd
    COMPLEMENT (append a full loop: Polygon.contains XORs loop parities,
    so the extra full loop flips every query)."""
    if a.is_empty:
        return b
    if b.is_empty:
        return a
    if a.is_full and b.is_full:
        return Polygon([])
    full_marker = Loop(np.array([[0.0, 0.0, -1.0]]))
    if a.is_full:
        return Polygon(list(b.loops) + [full_marker])
    if b.is_full:
        return Polygon(list(a.loops) + [full_marker])
    return _overlay(
        a, b, keep_a_inside=False, keep_b_inside=False, reverse_b=False, xor=True
    )


def snap_polygons_joint(polys: list, snap) -> list:
    """Snap several polygons through ONE S2Builder site set with the
    exact Voronoi EDGE phase (kernel/builder.py snap_edge_chain): every
    boundary edge of every polygon snaps to the ordered chain of joint
    sites its Voronoi walk visits.  Because the site set is shared,
    partially-overlapping collinear boundary chains land on IDENTICAL
    site sub-chains — i.e. exactly-shared edges, which the overlay's
    shared-boundary rules resolve structurally."""
    from .builder import choose_sites, snap_edge_chain

    all_v = [
        l.vertices for p in polys for l in p.loops if len(l.vertices)
    ]
    if not all_v:
        return [Polygon([]) for _ in polys]
    sites, _vmap = choose_sites(np.concatenate(all_v), snap)
    out = []
    for p in polys:
        loops = []
        for loop in p.loops:
            v = loop.vertices
            chain: list[np.ndarray] = []
            for i in range(len(v)):
                for si in snap_edge_chain(
                    v[i], v[(i + 1) % len(v)], sites, snap.snap_radius
                ):
                    s = sites[si]
                    if chain and np.all(chain[-1] == s):
                        continue
                    chain.append(s)
            if len(chain) > 1 and np.all(chain[0] == chain[-1]):
                chain.pop()
            chain = _cancel_spurs(chain)
            if len(chain) >= 3:
                loops.append(Loop(np.asarray(chain)))
        out.append(Polygon(_cancel_sibling_rings(loops)))
    return out


def snap_result_keep_degeneracies(poly: Polygon, snap):
    """Snap a boolean-op RESULT through the builder site set, KEEPING
    edges that become degenerate — the reference's output-layer rule
    ("when snapping causes an output edge to become degenerate, it is
    still emitted, since otherwise loops that contract to a single
    point would be lost", s2boolean_operation_test.cc:1034-1053).

    Returns (rings, points): rings are closed vertex arrays that may be
    pure sibling-pair degenerate lines; points are loops that collapsed
    to a single site (degenerate point shells)."""
    from .builder import choose_sites, snap_edge_chain

    all_v = [l.vertices for l in poly.loops if len(l.vertices)]
    if not all_v:
        return [], []
    sites, _vmap = choose_sites(np.concatenate(all_v), snap)
    rings: list[np.ndarray] = []
    points: list[np.ndarray] = []
    for loop in poly.loops:
        v = loop.vertices
        chain: list[np.ndarray] = []
        for i in range(len(v)):
            for si in snap_edge_chain(
                v[i], v[(i + 1) % len(v)], sites, snap.snap_radius
            ):
                s = sites[si]
                if chain and np.all(chain[-1] == s):
                    continue
                chain.append(s)
        if len(chain) > 1 and np.all(chain[0] == chain[-1]):
            chain.pop()
        if not chain:
            continue
        if len(chain) == 1:
            points.append(chain[0])
        else:
            rings.append(np.asarray(chain))
    return rings, points


def _ring_key(v: np.ndarray) -> tuple:
    """Rotation-canonical key of a closed vertex ring."""
    rows = [tuple(p) for p in v]
    k = rows.index(min(rows))
    return tuple(rows[k:] + rows[:k])


def _cancel_sibling_rings(loops: list) -> list:
    """Drop pairs of loops that snapped onto the SAME site ring with
    opposite orientations — every edge of one is the sibling of an edge
    of the other, so the pair is pure sibling pairs and the builder's
    polygon-layer DISCARD removes both (a thin shell/hole band whose
    interior collapsed under snapping, s2boolean_operation_test.cc
    FullAndEmptyResults k6FaceAlmostEmpty1)."""
    keys = [_ring_key(l.vertices) for l in loops]
    rev_keys = [_ring_key(l.vertices[::-1]) for l in loops]
    dead = set()
    for i in range(len(loops)):
        if i in dead:
            continue
        for j in range(i + 1, len(loops)):
            if j in dead:
                continue
            if keys[i] == rev_keys[j]:
                dead.add(i)
                dead.add(j)
                break
    return [l for k, l in enumerate(loops) if k not in dead]


def _cancel_spurs(chain: list) -> list:
    """Remove out-and-back spurs from a closed snapped walk (the
    builder's sibling-pair DISCARD for polygon layers,
    s2builder_graph SiblingPairs::DISCARD): while some vertex's two
    neighbors coincide, drop that vertex (and the duplicate neighbor).
    A loop whose interior collapsed under snapping reduces to fewer
    than 3 vertices and is dropped by the caller."""
    changed = True
    while changed and len(chain) >= 3:
        changed = False
        n = len(chain)
        for i in range(n):
            if np.all(chain[(i - 1) % n] == chain[(i + 1) % n]):
                hi = max((i + 1) % n, i)
                lo = min((i + 1) % n, i)
                del chain[hi]
                del chain[lo]
                changed = True
                break
    return chain


def _op_contains_point(a: Polygon, b: Polygon, op: str, p: np.ndarray) -> bool:
    ina = bool(a.contains(p[None])[0])
    inb = bool(b.contains(p[None])[0])
    return {
        "union": ina or inb,
        "intersection": ina and inb,
        "difference": ina and not inb,
        "symmetric_difference": ina ^ inb,
    }[op]


def _uniform_result_is_full(a: Polygon, b: Polygon, op: str) -> bool:
    """IsFullPolygonResult (s2boolean_operation.cc): when every boundary
    edge of the result vanished (exact cancellation or snapped away),
    the result is uniform — decide empty vs full by evaluating the op's
    point containment on the ORIGINAL operands at a probe chosen far
    from every input edge."""
    from .distance import point_edge_dist2

    C, D = [], []
    for poly in (a, b):
        for u, v in _edges_of(poly):
            C.append(u)
            D.append(v)
    candidates = np.array([
        [0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0],
        [-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, -1.0, 0.0],
    ])
    extra = np.array([[1.0, 1.0, 1.0], [-1.0, 1.0, -1.0], [1.0, -1.0, 1.0]])
    candidates = np.concatenate(
        [candidates, extra / np.linalg.norm(extra, axis=1, keepdims=True)]
    )
    if not C:
        probe = candidates[0]
    else:
        d2 = point_edge_dist2(candidates, np.stack(C), np.stack(D)).min(1)
        probe = candidates[int(np.argmax(d2))]
    return _op_contains_point(a, b, op, probe)


def boolean_op_snapped(a: Polygon, b: Polygon, op: str, snap=None) -> Polygon:
    """See _boolean_op_snapped_impl; this wrapper adds the reference's
    IsFullPolygonResult disambiguation: an edge-free result from the
    snapped machinery is uniform, and the probe on the original operands
    decides empty vs full (s2boolean_operation_test.cc
    FullAndEmptyResults — complementary hemispheres, almost-full
    operands collapsing under snap)."""
    result = _boolean_op_snapped_impl(a, b, op, snap)
    if result.is_empty and not (a.is_empty or b.is_empty
                                or a.is_full or b.is_full):
        if _uniform_result_is_full(a, b, op):
            return Polygon([Loop(np.array([[0.0, 0.0, -1.0]]))])
    return result


def _boolean_op_snapped_impl(a: Polygon, b: Polygon, op: str,
                             snap=None) -> Polygon:
    """S2BooleanOperation with a snap function composed IN FRONT of the
    overlay — the reference's own architecture
    (s2boolean_operation.h: `options.set_snap_function(snap_function)`;
    snap rounding via S2Builder, s2builder.cc).  This lifts the
    general-position restriction for PARTIALLY overlapping collinear
    edges: both operands snap through one joint site set
    (snap_polygons_joint), which turns collinear overlaps into
    exactly-shared sub-chains that `_overlay` already supports.

    Default snap function: IdentitySnapFunction(kIntersectionMergeRadius)
    — the reference's own S2BooleanOperation default (2·kIntersectionError,
    s2edge_crossings.h kIntersectionMergeRadius): keeps every input
    vertex as a site, splits edges at sites lying on them, and preserves
    slivers whose features exceed the merge radius (the
    s2polygon_test.cc Bug1-12 regression regime — a larger radius
    collapses their sub-1e-12 edges and empties the result)."""
    from .builder import IdentitySnapFunction

    if snap is None:
        snap = IdentitySnapFunction(2 * _INTERSECTION_ERROR)
    fns = {"intersection": intersection, "union": union,
           "difference": difference,
           "symmetric_difference": symmetric_difference}
    # empty/full short-circuits BEFORE snapping: the sentinel
    # single-vertex loops of the empty/full polygons carry no edges for
    # the builder and must not pass through the snap (snapping used to
    # drop the full sentinel, turning full-operand ops empty —
    # s2boolean_operation_test.cc FullAndEmptyResults).
    if a.is_empty or b.is_empty or a.is_full or b.is_full:
        res = fns[op](a, b)
        if res.is_empty or res.is_full:
            return res
        # the surviving operand still passes through the snap, like the
        # reference's output layer (a large snap radius may collapse it
        # entirely — s2polygon_test.cc InitToSnappedWithSnapLevel's
        # ApproxContains at coarse levels)
        return snap_polygons_joint([res], snap)[0]
    sa, sb = snap_polygons_joint([a, b], snap)
    if sa.is_empty or sb.is_empty or sa.is_full or sb.is_full:
        return fns[op](sa, sb)
    # First try the sliver-robust overlay (exact shared-edge handling,
    # endpoint merging, duplicate/sibling cleanup); when its per-sub-edge
    # classification turns out inconsistent (a dangling chain), fall back
    # to the winding-based resolution below.
    try:
        if op == "intersection":
            res = _overlay(sa, sb, True, True, False, robust=True)
        elif op == "union":
            res = _overlay(sa, sb, False, False, False, robust=True)
        elif op == "difference":
            res = _overlay(sa, sb, False, True, True, robust=True)
        else:
            res = _overlay(sa, sb, False, False, False, xor=True,
                           robust=True)
        return _resnap_new_vertices(res, sa, sb, snap)
    except ValueError:
        pass
    # Resolve via the WINDING machinery — the reference's own
    # architecture (S2BooleanOperation is built on winding numbers,
    # s2boolean_operation.cc): orient each operand's loops so its
    # interior has winding 1 (shells CCW, holes CW per even_odd_signs),
    # reverse the subtrahend for DIFFERENCE, then apply the op's winding
    # rule.  The winding op's crossing-vertex merging and sliver cleanup
    # make this robust for the near-degenerate snapped inputs the
    # overlay's per-sub-edge classification cannot handle
    # (s2polygon_test.cc Bug1-12).
    from .contains import Loop as _Loop
    from .measures import even_odd_signs
    from .winding import WindingRule, winding_operation

    def oriented(poly: Polygon, reverse: bool) -> list:
        loops = [l.vertices for l in poly.loops]
        signs = even_odd_signs(loops)
        out = []
        for sgn, v in zip(signs, loops):
            w = v if sgn > 0 else v[::-1].copy()
            if reverse:
                w = w[::-1].copy()
            out.append(w)
        return out

    reverse_b = op == "difference"
    traces = oriented(sa, False) + oriented(sb, reverse_b)
    centroid = np.concatenate(
        [l.vertices for l in sa.loops] + [l.vertices for l in sb.loops]
    ).sum(0)
    n = np.linalg.norm(centroid)
    ref = -(centroid / n) if n > 1e-30 else np.array([0.0, 0.0, 1.0])
    ref_winding = int(bool(sa.contains(ref[None])[0]))
    wb = int(bool(sb.contains(ref[None])[0]))
    ref_winding += -wb if reverse_b else wb
    rule = {
        "union": WindingRule.POSITIVE,
        "intersection": lambda w: w >= 2,
        "difference": WindingRule.POSITIVE,
        "symmetric_difference": WindingRule.ODD,
    }[op]
    loops, full = winding_operation(traces, ref, ref_winding, rule)
    from .measures import loop_signed_area

    if full and not loops:
        return Polygon([_Loop(np.array([[0.0, 0.0, -1.0]]))])
    out = []
    for v in loops:
        if loop_signed_area(v) < 0:
            v = v[::-1].copy()
        out.append(_Loop(v))
    return _resnap_new_vertices(Polygon(out), sa, sb, snap)


def _resnap_new_vertices(result: Polygon, sa: Polygon, sb: Polygon,
                         snap) -> Polygon:
    """Output-side snap rounding: vertices CREATED by the overlay (edge
    intersection points) are not operand vertices and must round to the
    snap function's grid like any other builder input
    (s2polygon_test.cc IntersectionSnapFunction: the 1:6.67 intersection
    rounds to 1:7 under IntLatLngSnapFunction(0)).  A structural no-op
    whenever snapping does not MOVE any new vertex — the identity snap
    function never moves points, keeping the small-radius regression
    fixtures bit-identical."""
    from .builder import snap_edge_chain

    if not result.loops or any(l.is_empty_or_full for l in result.loops):
        return result
    op_v = [l.vertices for p in (sa, sb) for l in p.loops
            if len(l.vertices) >= 3]
    if not op_v:
        return result
    sites = np.unique(np.concatenate(op_v), axis=0)
    site_keys = {tuple(s) for s in sites}
    res_v = np.concatenate([l.vertices for l in result.loops])
    new_v = [v for v in res_v if tuple(v) not in site_keys]
    if not new_v:
        return result
    new_v = np.asarray(new_v)
    snapped = snap.snap(new_v)
    moved = ~(snapped == new_v).all(axis=1)
    if not moved.any():
        return result
    aug = list(sites)
    for v, sv in zip(new_v, snapped):
        # builder rule: a new vertex merges into an existing site within
        # the snap radius, else its snapped position becomes a new site
        d = float(np.arccos(np.clip(sites @ v, -1.0, 1.0)).min())
        if d > snap.snap_radius:
            aug.append(sv)
    aug = np.unique(np.asarray(aug), axis=0)
    loops = []
    for loop in result.loops:
        v = loop.vertices
        chain: list[np.ndarray] = []
        for i in range(len(v)):
            for si in snap_edge_chain(
                v[i], v[(i + 1) % len(v)], aug, snap.snap_radius
            ):
                s = aug[si]
                if chain and np.all(chain[-1] == s):
                    continue
                chain.append(s)
        if len(chain) > 1 and np.all(chain[0] == chain[-1]):
            chain.pop()
        chain = _cancel_spurs(chain)
        if len(chain) >= 3:
            loops.append(Loop(np.asarray(chain)))
    return Polygon(_cancel_sibling_rings(loops))


def cellunion_to_polygon(cells) -> Polygon:
    """S2Polygon::InitToCellUnionBorder analog: the region of a normalized
    cell union as an even-odd polygon.  Cells of a normalized union have
    disjoint interiors, so the XOR of their 4-vertex cell loops IS the
    union region (shared boundary segments cancel in crossing parity) —
    no explicit border merging needed for containment semantics."""
    from .cell import Cell

    loops = []
    for cid in cells:
        cell = Cell(cid)
        loops.append(Loop(np.stack([cell.get_vertex(k) for k in range(4)])))
    return Polygon(loops)


def buffer_polygon(
    poly: Polygon, radius_rad: float, circle_segments: float = 16.0
) -> Polygon:
    """General polygon buffer — delegates to the exact offset-trace +
    winding-operation path (buffer_polygon_winding, the reference's
    S2BufferOperation architecture).  buffer_polygon_covering keeps the
    conservative cell-algebra approximation for callers that want a
    covering-granularity superset instead."""
    return buffer_polygon_winding(poly, radius_rad, circle_segments)


def buffer_polygon_covering(
    poly: Polygon, radius_rad: float, max_cells: int = 64
) -> Polygon:
    """S2BufferOperation approximation (s2shape_index_buffered_region.h:61):
    cover the polygon, expand the covering by the radius on the cell
    algebra, and return the expanded region as an even-odd polygon.  The
    result is conservative (⊇ exact buffer) within one covering-cell
    granularity."""
    from .cellunion import expand_radius, normalize
    from .coverer import RegionCoverer
    from .region import ShapeRegion

    cov = RegionCoverer(max_cells=max_cells).get_covering(
        ShapeRegion(polygon=poly)
    )
    grown = expand_radius(normalize(cov), radius_rad)
    return cellunion_to_polygon(grown)


def clip_polyline_to_polygon(
    vertices: np.ndarray, poly: Polygon, keep_inside: bool = True
) -> list[np.ndarray]:
    """Polyline operand for boolean ops (s2boolean_operation.h:37-90,
    polyline × polygon INTERSECTION / DIFFERENCE, general position):
    split each polyline edge at polygon-boundary crossings, keep the
    sub-edges whose midpoints are inside (resp. outside), and reassemble
    maximal chains in input order.  Sub-edges lying exactly on the
    boundary are snap-rounding territory (same caveat as _split_edges).
    """
    pv = np.asarray(vertices, float).reshape(-1, 3)
    if len(pv) < 2:
        return []
    pedges = _edges_of(poly)
    chains: list[list[np.ndarray]] = []
    current: list[np.ndarray] = []
    for i in range(len(pv) - 1):
        subs = _split_edges([(pv[i], pv[i + 1])], pedges)
        kept = _classify(subs, poly)
        for (a, b), inside in zip(subs, kept):
            if bool(inside) != keep_inside:
                if current:
                    chains.append(current)
                    current = []
                continue
            if current and np.all(current[-1] == a):
                current.append(b)
            else:
                if current:
                    chains.append(current)
                current = [a, b]
    if current:
        chains.append(current)
    return [np.asarray(c) for c in chains]


def polyline_intersection(vertices: np.ndarray, poly: Polygon) -> list[np.ndarray]:
    """S2BooleanOperation INTERSECTION with a polyline A operand."""
    return clip_polyline_to_polygon(vertices, poly, keep_inside=True)


def polyline_difference(vertices: np.ndarray, poly: Polygon) -> list[np.ndarray]:
    """S2BooleanOperation DIFFERENCE (polyline minus polygon)."""
    return clip_polyline_to_polygon(vertices, poly, keep_inside=False)


def buffer_convex_loop(
    vertices: np.ndarray, radius_rad: float, circle_segments: float = 16.0
) -> np.ndarray:
    """Exact polygonized buffer of a CONVEX CCW loop (the offset-curve
    subset of S2BufferOperation, s2buffer_operation.cc): each edge shifts
    outward along the great circle offset (the offset curve of a
    great-circle edge at distance r is a small-circle arc, polygonized
    here), and consecutive edges are joined by a circular arc around the
    shared vertex.  The polygonization density follows the reference's
    circle_segments option (max angular step π/circle_segments,
    s2buffer_operation.h:109-135); the result is within
    (1-cos(θ))/(1+cos(θ))·r of the exact buffer boundary.

    REQUIRES: the loop is convex with interior on the left (CCW),
    radius > 0, and buffered region smaller than a hemisphere.
    """
    v = np.asarray(vertices, float).reshape(-1, 3)
    n_v = len(v)
    step = math.pi / circle_segments
    out: list[np.ndarray] = []

    def rotate_about(p: np.ndarray, axis: np.ndarray, angle: float) -> np.ndarray:
        axis = axis / np.linalg.norm(axis)
        c, s = math.cos(angle), math.sin(angle)
        return (
            p * c + np.cross(axis, p) * s + axis * float(axis @ p) * (1 - c)
        )

    for i in range(n_v):
        a = v[i]
        b = v[(i + 1) % n_v]
        # outward normal of edge (interior on left ⇒ outward = (a×b)
        # negated... for CCW small loop, interior is left of a→b and the
        # normal n = a×b points INTO the interior side? p·(a×b) > 0 for
        # interior ⇒ outward direction at the edge midpoint is -normalize(a×b)
        n = np.cross(a, b)
        n = n / np.linalg.norm(n)
        out_dir = -n
        # offset endpoints: move each endpoint along the great circle
        # toward out_dir by r: p' = p·cos r + t̂·sin r (t̂ = out_dir since
        # the edge pole n is orthogonal to both endpoints)
        ta = out_dir - a * float(a @ out_dir)
        ta = ta / np.linalg.norm(ta)
        tb = out_dir - b * float(b @ out_dir)
        tb = tb / np.linalg.norm(tb)
        a_off = a * math.cos(radius_rad) + ta * math.sin(radius_rad)
        b_off = b * math.cos(radius_rad) + tb * math.sin(radius_rad)
        # the offset curve from a_off to b_off is the small circle at
        # distance r from the edge's great circle: rotating a_off about
        # the pole n by the edge angle sweeps it onto b_off
        edge_angle = math.acos(max(-1.0, min(1.0, float(a @ b))))
        k = max(1, int(math.ceil(edge_angle / step)))
        for s_i in range(k):
            out.append(rotate_about(a_off, n, edge_angle * s_i / k))
        out.append(b_off)
        # vertex arc at b: from b_off (end of this edge's offset) to the
        # start of the next edge's offset, rotating about b
        c = v[(i + 2) % n_v]
        n2 = np.cross(b, c)
        n2 = n2 / np.linalg.norm(n2)
        out2_dir = -n2
        tb2 = out2_dir - b * float(b @ out2_dir)
        tb2 = tb2 / np.linalg.norm(tb2)
        b_off_next = b * math.cos(radius_rad) + tb2 * math.sin(radius_rad)
        # exterior turn angle at b (convex ⇒ in (0, π)); sweep about b
        cosang = max(-1.0, min(1.0, float(tb @ tb2)))
        turn = math.acos(cosang)
        k = max(1, int(math.ceil(turn / step)))
        for s_i in range(1, k):
            out.append(rotate_about(b_off, b, turn * s_i / k))
    arr = np.asarray(out).reshape(-1, 3)
    # drop near-duplicate consecutive vertices
    keep = [0]
    for i in range(1, len(arr)):
        if ((arr[i] - arr[keep[-1]]) ** 2).sum() > 1e-24:
            keep.append(i)
    if ((arr[keep[-1]] - arr[keep[0]]) ** 2).sum() <= 1e-24 and len(keep) > 1:
        keep.pop()
    return arr[keep]


def buffer_convex_polygon(
    poly: Polygon, radius_rad: float, circle_segments: float = 16.0
) -> Polygon:
    """Exact polygonized buffer of a single-loop convex polygon
    (S2BufferOperation subset; general polygons use
    buffer_polygon_winding)."""
    if len(poly.loops) != 1:
        raise ValueError("buffer_convex_polygon requires a single convex loop")
    from .contains import Loop

    ring = buffer_convex_loop(
        poly.loops[0].vertices, radius_rad, circle_segments
    )
    return Polygon([Loop(ring)])


def _vdot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1] + a[:, 2] * b[:, 2]


def _vcross(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.stack(
        [
            a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
            a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
            a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0],
        ],
        -1,
    )


def _vnorm(a: np.ndarray) -> np.ndarray:
    return np.sqrt(_vdot(a, a))


def _rot_about(p: np.ndarray, axis: np.ndarray, ang: np.ndarray) -> np.ndarray:
    """Rodrigues rotation of p[i] about axis[i] by every angle in
    ang[i, :] → (n, K, 3).  Elementwise arithmetic only (no BLAS
    reductions), so results are independent of how rows are batched."""
    an = axis / _vnorm(axis)[:, None]
    c = np.cos(ang)
    s = np.sin(ang)
    ad = _vdot(an, p)
    cr = _vcross(an, p)
    return (
        p[:, None, :] * c[..., None]
        + cr[:, None, :] * s[..., None]
        + an[:, None, :] * (ad[:, None] * (1 - c))[..., None]
    )


def _offset_trace_samples(
    A: np.ndarray,
    B: np.ndarray,
    C2: np.ndarray,
    radius_rad: float,
    circle_segments: float,
):
    """Vectorized offset-trace samples for edge rows (a_i → b_i) with
    following vertex c_i: per row, the edge-arc samples, b_off, and the
    signed vertex-arc samples — the same point stream `_offset_trace`
    emits, in the same order.  Returns (pts (M,3) row-major, row_id (M,),
    nxt_first (N,3) — the NEXT edge's first point offset(b, -n2), for
    row-boundary dedup, counts (N,)).

    Every operation is elementwise (explicit component dot/cross/norm,
    np trig), so a row's samples are bit-identical whether computed here
    for a whole loop (single-node kernel) or for an arbitrary executor
    batch (distributed trace) — the parity the distributed buffer
    fixtures gate on."""
    step = math.pi / circle_segments
    N = len(A)
    n = _vcross(A, B)
    n = n / _vnorm(n)[:, None]
    out_dir = -n  # interior on left ⇒ exterior = right = -pole
    cr_, sr_ = math.cos(radius_rad), math.sin(radius_rad)

    def off(p, d):
        t = d - p * _vdot(p, d)[:, None]
        t = t / _vnorm(t)[:, None]
        return p * cr_ + t * sr_

    a_off = off(A, out_dir)
    b_off = off(B, out_dir)
    ea = np.arccos(np.clip(_vdot(A, B), -1.0, 1.0))
    k1 = np.maximum(1, np.ceil(ea / step)).astype(np.int64)
    # signed vertex arc at b toward the next edge's offset start
    n2 = _vcross(B, C2)
    n2 = n2 / _vnorm(n2)[:, None]
    mn2 = -n2
    tb = out_dir - B * _vdot(B, out_dir)[:, None]
    tb = tb / _vnorm(tb)[:, None]
    tb2 = mn2 - B * _vdot(B, mn2)[:, None]
    tb2 = tb2 / _vnorm(tb2)[:, None]
    turn = np.arccos(np.clip(_vdot(tb, tb2), -1.0, 1.0))
    # reflex vertex: sweep backwards (racetrack lobe)
    turn = np.where(_vdot(_vcross(tb, tb2), B) < 0, -turn, turn)
    k2 = np.maximum(1, np.ceil(np.abs(turn) / step)).astype(np.int64)

    counts = k1 + k2  # k1 edge samples + b_off + (k2-1) vertex samples
    offs = np.zeros(N + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    pts = np.empty((int(offs[-1]), 3), np.float64)
    row_id = np.repeat(np.arange(N, dtype=np.int64), counts)
    for K in np.unique(k1):
        r = np.nonzero(k1 == K)[0]
        ang = ea[r, None] * np.arange(K)[None, :] / K  # (ea*s_i)/K order
        pos = offs[r, None] + np.arange(K)[None, :]
        pts[pos.ravel()] = _rot_about(a_off[r], n[r], ang).reshape(-1, 3)
    pts[offs[:N] + k1] = b_off
    for K in np.unique(k2):
        if K < 2:
            continue
        r = np.nonzero(k2 == K)[0]
        ang = turn[r, None] * np.arange(1, K)[None, :] / K
        pos = offs[r, None] + k1[r, None] + np.arange(1, K)[None, :]
        pts[pos.ravel()] = _rot_about(b_off[r], B[r], ang).reshape(-1, 3)
    return pts, row_id, off(B, mn2), counts


def _dedup_keep_mask(
    arr: np.ndarray, row_id: np.ndarray | None = None, tol: float = 1e-24
) -> np.ndarray:
    """keep[] mask with the kernel's prev-KEPT dedup semantics: a point
    within tol chord² of the last kept point (in its row) is dropped.
    Vectorized fast path when duplicates are isolated; exact scalar walk
    per affected row otherwise (chained duplicates are degenerate
    inputs)."""
    n = len(arr)
    keep = np.ones(n, bool)
    if n <= 1:
        return keep
    same = (
        np.ones(n - 1, bool)
        if row_id is None
        else row_id[1:] == row_id[:-1]
    )
    d = same & (((arr[1:] - arr[:-1]) ** 2).sum(1) <= tol)
    cand = np.nonzero(d)[0] + 1
    if len(cand) == 0:
        return keep
    # fast path valid iff every drop's successor is (a) not itself a
    # candidate and (b) still > tol from the drop's PREDECESSOR — then
    # "prev point" and "prev kept" coincide everywhere
    ok = len(cand) < 2 or bool(np.all(np.diff(cand) > 1))
    if ok:
        nxt = cand + 1
        valid = nxt < n if row_id is None else (
            (nxt < n) & (row_id[np.minimum(nxt, n - 1)] == row_id[cand])
        )
        if valid.any():
            d2 = ((arr[nxt[valid]] - arr[cand[valid] - 1]) ** 2).sum(1)
            ok = bool(np.all(d2 > tol))
    if ok:
        keep[cand] = False
        return keep
    # scalar fallback, restricted to rows containing a candidate
    # (keep[] is still all-True here — nothing was dropped yet)
    if row_id is None:
        starts, ends = [0], [n]
    else:
        rows = set(row_id[cand].tolist())
        bounds = np.nonzero(row_id[1:] != row_id[:-1])[0] + 1
        starts_all = np.concatenate([[0], bounds])
        ends_all = np.concatenate([bounds, [n]])
        sel = [i for i, s in enumerate(starts_all) if int(row_id[s]) in rows]
        starts = [int(starts_all[i]) for i in sel]
        ends = [int(ends_all[i]) for i in sel]
    for s, e in zip(starts, ends):
        last = s
        for i in range(s + 1, e):
            if ((arr[i] - arr[last]) ** 2).sum() <= tol:
                keep[i] = False
            else:
                last = i
    return keep


def _offset_trace(
    vertices: np.ndarray, radius_rad: float, circle_segments: float = 16.0
) -> np.ndarray:
    """Offset curve of a closed boundary traced with the region interior
    on the LEFT, at distance r on the right (exterior) side — the
    raw path S2BufferOperation feeds to S2WindingOperation
    (s2buffer_operation.cc): per-edge small-circle offset arcs joined by
    SIGNED vertex arcs (convex/left turns sweep a join arc; reflex/right
    turns sweep backwards, producing the self-crossing racetrack lobe
    the winding rule later cancels).  Sample generation is the shared
    vectorized `_offset_trace_samples` (also the distributed trace's
    generator, operators/arrangement.py — bit-identical by construction)."""
    v = np.asarray(vertices, float).reshape(-1, 3)
    A = v
    B = np.roll(v, -1, axis=0)
    C2 = np.roll(v, -2, axis=0)
    arr, _rid, _nxt, _cnt = _offset_trace_samples(
        A, B, C2, radius_rad, circle_segments
    )
    keep = np.nonzero(_dedup_keep_mask(arr))[0]
    if (
        len(keep) > 1
        and ((arr[keep[-1]] - arr[keep[0]]) ** 2).sum() <= 1e-24
    ):
        keep = keep[:-1]
    return arr[keep]


def buffer_polygon_winding(
    poly: Polygon, radius_rad: float, circle_segments: float = 16.0
) -> Polygon:
    """GENERAL polygon buffer — the reference's S2BufferOperation
    architecture (s2buffer_operation.cc): trace the offset curve of
    every boundary loop (shells traced CCW, holes traced CW so the
    region interior stays on the left; holes therefore shrink), then
    resolve all self-intersections with the winding operation (rule
    POSITIVE, reference point far from the region with winding 0 —
    exactly how the reference composes buffering on top of
    S2WindingOperation).

    REQUIRES: radius > 0 and the buffered region within one hemisphere
    around the input (the far reference point must stay outside)."""
    from .contains import Loop
    from .measures import even_odd_signs
    from .winding import WindingRule, winding_operation

    if not poly.loops:
        return Polygon([])
    signs = even_odd_signs([l.vertices for l in poly.loops])
    traces = []
    for sgn, loop in zip(signs, poly.loops):
        v = loop.vertices if sgn > 0 else loop.vertices[::-1].copy()
        traces.append(_offset_trace(v, radius_rad, circle_segments))
    centroid = np.concatenate([l.vertices for l in poly.loops]).sum(0)
    centroid = centroid / np.linalg.norm(centroid)
    ref = -centroid  # antipode: winding 0 there
    loops, full = winding_operation(traces, ref, 0, WindingRule.POSITIVE)
    # all-CCW even-odd convention (same flip as _overlay): hole
    # boundaries come out of the winding walk wound CW
    from .measures import loop_signed_area

    out = []
    for v in loops:
        if loop_signed_area(v) < 0:
            v = v[::-1].copy()
        out.append(Loop(v))
    return Polygon(out)


def boolean_op_with_degeneracies(
    a: Polygon, b: Polygon, op: str, eps: float = 1e-11
) -> tuple[Polygon, list, list]:
    """Any S2BooleanOperation OpType with CLOSED-model degenerate
    outputs (s2boolean_operation.h:60-90, 137-183; PolygonModel::CLOSED
    is the only model where touching polygons intersect) —
    → (polygon part, degenerate edges, degenerate points), where each
    degenerate edge is (c, d, kind) and each point (v, kind), kind in
    {"shell", "hole"}:

    - a shared boundary feature that belongs to the op's CLOSED result
      (intersection/union: closure(a) op closure(b) contains shared
      boundary) but whose entire neighborhood is OUTSIDE the result is a
      degenerate SHELL — e.g. two polygons touching along an edge emit
      that edge as a sibling pair under INTERSECTION
      (s2boolean_operation_test.cc PolygonEdgeClosedPolygonEdgeOverlap:
      "0:4, 2:4"), a corner touch emits the vertex
      (PolygonVertexClosedPolygonVertex: "0:0");
    - a shared feature NOT in the closed result (difference/symmetric
      difference exclude boundary shared by both closures) whose entire
      neighborhood is INSIDE the result is a degenerate HOLE — e.g. the
      symmetric difference of two polygons sharing an edge is the union
      with a degenerate sibling-pair hole along the old shared edge."""
    fns = {"intersection": intersection, "union": union,
           "difference": difference,
           "symmetric_difference": symmetric_difference}
    member = _BOOL_MEMBERS[op]
    poly = fns[op](a, b)
    # shared boundary features are in the closed result for the ops that
    # keep boundary held by BOTH closures, out of it for those that
    # cancel it
    in_closed = op in ("intersection", "union")

    raw_a = _edges_of(a)
    raw_b = _edges_of(b)
    # features on the OUTPUT boundary are regular, never degenerate
    # (e.g. the shared touch vertex of a CLOSED union lies on the union's
    # own loops — the reference emits it as a loop vertex, not a point)
    out_edges = set()
    out_verts = set()
    for c, d in _edges_of(poly):
        out_edges.add((tuple(c), tuple(d)))
        out_edges.add((tuple(d), tuple(c)))
        out_verts.add(tuple(c))
    b_dir = {(tuple(c), tuple(d)) for c, d in raw_b}
    deg_edges = []
    shared_keys = set()
    for c, d in raw_a:
        key, rkey = (tuple(c), tuple(d)), (tuple(d), tuple(c))
        if key in b_dir or rkey in b_dir:
            shared_keys.add(key)
            shared_keys.add(rkey)
            if key in out_edges:
                continue
            m = _slerp_mid(c, d)
            t = d - c
            t = t - m * float(m @ t)
            t = t / np.linalg.norm(t)
            left = np.cross(m, t)
            probes = np.stack(
                [
                    (m + eps * left) / np.linalg.norm(m + eps * left),
                    (m - eps * left) / np.linalg.norm(m - eps * left),
                ]
            )
            inside = member(a.contains(probes), b.contains(probes))
            if in_closed and not inside.any():
                deg_edges.append((c, d, "shell"))
            elif not in_closed and inside.all():
                deg_edges.append((c, d, "hole"))

    verts_a = {tuple(v) for loop in a.loops for v in loop.vertices}
    verts_b = {tuple(v) for loop in b.loops for v in loop.vertices}
    deg_points = []
    for tv in sorted(verts_a & verts_b):
        v = np.array(tv)
        # skip vertices on a shared edge (they belong to the edge output)
        if any(tv == k[0] or tv == k[1] for k in shared_keys):
            continue
        if tv in out_verts:
            continue
        # neighborhood ring probe around the shared vertex
        t1 = P.ortho(v)
        t2 = np.cross(v, t1)
        ring = []
        for k in range(8):
            d = math.cos(k * math.pi / 4) * t1 + math.sin(k * math.pi / 4) * t2
            p = v + eps * d
            ring.append(p / np.linalg.norm(p))
        ring = np.asarray(ring)
        inside = member(a.contains(ring), b.contains(ring))
        if in_closed and not inside.any():
            deg_points.append((v, "shell"))
        elif not in_closed and inside.all():
            deg_points.append((v, "hole"))
    return poly, deg_edges, deg_points


_BOOL_MEMBERS = {
    "intersection": lambda ia, ib: ia & ib,
    "union": lambda ia, ib: ia | ib,
    "difference": lambda ia, ib: ia & ~ib,
    "symmetric_difference": lambda ia, ib: ia ^ ib,
}


def intersection_with_degeneracies(
    a: Polygon, b: Polygon, eps: float = 1e-11
) -> tuple[Polygon, list[tuple[np.ndarray, np.ndarray]], list[np.ndarray]]:
    """Back-compat wrapper: INTERSECTION degeneracies without kinds
    (every intersection degeneracy is a shell)."""
    poly, de, dp = boolean_op_with_degeneracies(a, b, "intersection", eps)
    return poly, [(c, d) for c, d, _k in de], [v for v, _k in dp]


def polygon_region_area(p: Polygon) -> float:
    """S2Polygon::GetArea: even-odd region area (holes subtract); the
    full polygon is 4*pi and the empty polygon 0."""
    from .measures import even_odd_area

    if p.is_full:
        return 4.0 * math.pi
    loops = [l.vertices for l in p.loops if not l.is_empty_or_full]
    if not loops:
        return 0.0
    return even_odd_area(loops)


def get_overlap_fractions(a: Polygon, b: Polygon) -> tuple[float, float]:
    """S2Polygon::GetOverlapFractions (s2polygon.cc:600-610): the
    fraction of each polygon's area covered by their intersection,
    clamped to 1 (and defined as 1 for an empty polygon).  Uses the
    snapped op like InitToIntersection (default kIntersectionMergeRadius)
    so partially-collinear shared boundaries are legal inputs."""
    inter_area = polygon_region_area(boolean_op_snapped(a, b, "intersection"))
    a_area = polygon_region_area(a)
    b_area = polygon_region_area(b)
    return (
        1.0 if inter_area >= a_area else inter_area / a_area,
        1.0 if inter_area >= b_area else inter_area / b_area,
    )


def approx_contains(a: Polygon, b: Polygon, tolerance_rad: float) -> bool:
    """S2Polygon::ApproxContains (s2polygon.cc:676-680): true when
    (b \\ a) snapped with IdentitySnapFunction(tolerance) is empty."""
    from .builder import IdentitySnapFunction

    return boolean_op_snapped(
        b, a, "difference", IdentitySnapFunction(tolerance_rad)
    ).is_empty


def approx_disjoint(a: Polygon, b: Polygon, tolerance_rad: float) -> bool:
    """S2Polygon::ApproxDisjoint (s2polygon.cc:682-686): true when
    (b ∩ a) snapped with IdentitySnapFunction(tolerance) is empty."""
    from .builder import IdentitySnapFunction

    return boolean_op_snapped(
        b, a, "intersection", IdentitySnapFunction(tolerance_rad)
    ).is_empty


def cell_union_border_polygon(ids) -> Polygon:
    """S2Polygon::InitToCellUnionBorder (s2polygon.cc:1353-1380): the
    union of the cells' quads with shared edges merged by snapping
    within half of kMinWidth at the leaf level (two cell edges can never
    come closer than kMinWidth, so this merges shared edges without
    merging distinct ones)."""
    from .builder import IdentitySnapFunction
    from .cell import Cell
    from .contains import Loop
    from .metrics import MIN_WIDTH

    snap = IdentitySnapFunction(0.5 * MIN_WIDTH.get_value(30))
    result = Polygon([])
    for cid in ids:
        cell = Cell(cid)
        quad = Polygon(
            [Loop(np.stack([cell.get_vertex(k) for k in range(4)]))]
        )
        result = boolean_op_snapped(result, quad, "union", snap)
    return result


def init_to_snapped(polygon: Polygon, snap_level: int = 30) -> Polygon:
    """S2Polygon::InitToSnapped (s2polygon.cc:1048-1056): the full
    builder snap — vertex phase + the exact Voronoi EDGE phase, so edges
    passing within the snap radius of a site are split onto it (the
    vertex-only snap reproduces the historical InitToSnappedIsValid_B
    self-crossing)."""
    from .builder import S2CellIdSnapFunction

    return snap_polygons_joint([polygon], S2CellIdSnapFunction(snap_level))[0]
