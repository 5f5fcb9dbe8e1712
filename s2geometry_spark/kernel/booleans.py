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

Degenerate inputs (shared vertices/edges, tangencies) require the snap
machinery and raise ValueError — matching the documented scope
(SURVEY.md §2.6 stretch).
"""

from __future__ import annotations

import numpy as np

from . import predicates as P
from .contains import Loop, Polygon


def _edges_of(poly: Polygon):
    out = []
    for li, loop in enumerate(poly.loops):
        v = loop.vertices
        if len(v) >= 3:
            for i in range(len(v)):
                out.append((v[i], v[(i + 1) % len(v)]))
    return out


def _intersection_point(a, b, c, d) -> np.ndarray:
    """Edge AB × edge CD crossing point (requires a proper crossing)."""
    n1 = np.cross(a, b)
    n2 = np.cross(c, d)
    x = np.cross(n1, n2)
    n = np.linalg.norm(x)
    if n == 0:
        raise ValueError("degenerate crossing (parallel great circles)")
    x = x / n
    # orient towards the midpoints of both edges
    if float(x @ (a + b + c + d)) < 0:
        x = -x
    return x


def _slerp_mid(a, b) -> np.ndarray:
    m = a + b
    n = np.linalg.norm(m)
    if n == 0:
        raise ValueError("antipodal edge midpoint")
    return m / n


def _split_edges(edges, other_edges):
    """For each directed edge, its crossing points ordered along the edge
    → list of sub-edges (a', b')."""
    subs = []
    for a, b in edges:
        cuts = []
        for c, d in other_edges:
            cs = P.crossing_sign(a, b, c, d)
            if cs == 0:
                raise ValueError(
                    "shared vertex between boundaries: general-position "
                    "overlay does not apply (needs snap rounding)"
                )
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
            subs.append((chain[i], chain[i + 1]))
    return subs


def _classify(subs, other: Polygon) -> np.ndarray:
    mids = np.array([_slerp_mid(a, b) for a, b in subs])
    return other.contains(mids)


def _assemble_loops(directed_edges) -> list[np.ndarray]:
    """Walk directed edges into closed loops; vertices keyed bitwise."""
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
                # loop must close back to the start vertex
                if tuple(b) != tuple(directed_edges[i][0]):
                    raise ValueError("open chain in overlay (degenerate input)")
                break
            j = nxts[0]
        if len(verts) >= 3:
            loops.append(np.array(verts))
    return loops


def _overlay(a: Polygon, b: Polygon, keep_a_inside: bool, keep_b_inside: bool,
             reverse_b: bool) -> Polygon:
    ea = _split_edges(_edges_of(a), _edges_of(b))
    eb = _split_edges(_edges_of(b), _edges_of(a))
    a_in_b = _classify(ea, b)
    b_in_a = _classify(eb, a)
    kept = [e for e, inside in zip(ea, a_in_b) if inside == keep_a_inside]
    b_kept = [e for e, inside in zip(eb, b_in_a) if inside == keep_b_inside]
    if reverse_b:
        b_kept = [(d, c) for c, d in b_kept]
    loops = _assemble_loops(kept + b_kept)
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
