"""S2WindingOperation (general position) — winding-number boolean ops.

Given possibly self-intersecting directed loops, a reference point with
known winding number, and a winding rule, computes the boundary of the
region where the rule holds (s2winding_operation.h:37-90: POSITIVE =
N-way union, NEGATIVE, NON_ZERO, ODD = N-way symmetric difference).

Re-derivation (the reference routes through S2Builder graphs):
 1. split every edge at its proper crossings with every other edge
    (the bow-tie self-crossing case included);
 2. for each sub-edge, compute the winding number just left and just
    right of an interior point m EXACTLY: w_base counts robust signed
    crossings of the geodesic ref→m against every NON-incident edge
    (exact-Sign tower, kernel/predicates.py — the reference evaluates
    the same crossings with s2pred::Sign, s2predicates.cc:46-296), and
    each INCIDENT edge (the sub-edge's parent and any bit-equal copy)
    contributes analytically: the limit path ref→m± crosses it iff ref
    lies strictly on the far side of its great circle (exact
    sign(c,d,ref)), with the usual leftward/rightward increment.  No
    epsilon displacement anywhere, so inputs with vertices within 1e-14
    of an edge classify identically to the reference;
 3. keep sub-edges where rule(w_left) ≠ rule(w_right), oriented with
    the rule-true side on the left;
 4. assemble the directed boundary loops (max-CCW face tracing).

Path assumption (documented): the geodesic ref→m crosses each incident
ARC only at the limit point m itself — true whenever ref is within the
same hemisphere as the arrangement, as in all fixtures; a degenerate
vertex crossing on the path raises and retries with a different
interior parameter t.

Degenerate boundaries (include_degeneracies, s2winding_operation.h:
96-124): point shells (single-vertex loops) and sibling edge pairs
(edge + bit-exact reverse, including 2-vertex loops) do not bound any
interior, so they are cancelled out of the arrangement; when the option
is enabled they are re-emitted per the reference's rules — under ODD
those with odd multiplicity, under every other rule those contained by
regions of winding number zero.  Snap rounding: `winding_operation_
snapped` (below) runs the full builder snap with the reference-point
winding transported via GetSnappedWindingDelta (winding_delta.py), so
near-degenerate input no longer needs manual pre-snapping.
"""

from __future__ import annotations

import math

import numpy as np

from . import predicates as P
from .booleans import _assemble_loops, _split_edges


class WindingRule:
    POSITIVE = staticmethod(lambda w: w > 0)
    NEGATIVE = staticmethod(lambda w: w < 0)
    NON_ZERO = staticmethod(lambda w: w != 0)
    ODD = staticmethod(lambda w: (w & 1) == 1)


def winding_number(
    p: np.ndarray, edges, ref: np.ndarray, ref_winding: int
) -> int:
    """w(p) from w(ref) by summing signed crossings along ref→p.

    Raises ValueError on a degenerate (vertex) crossing — callers retry
    with a perturbed probe."""
    w = ref_winding
    for a, b in edges:
        cs = P.crossing_sign(ref, p, a, b)
        if cs > 0:
            # winding decreases when the edge ends on the positive side
            # of the path plane (the edge crosses ref→p left-to-right as
            # seen along the path) — calibrated on a CCW loop: leaving
            # the loop across one of its edges lowers w by 1
            w += -1 if P.sign(ref[None], p[None], b[None])[0] > 0 else 1
        elif cs == 0:
            raise ValueError("degenerate crossing on winding probe path")
    return w


def winding_sides(
    m: np.ndarray,
    parent: tuple[np.ndarray, np.ndarray],
    edges,
    ref: np.ndarray,
    ref_winding: int,
) -> tuple[int, int]:
    """EXACT (w_left, w_right) for the point m interior to the sub-edge
    whose original (uncut) edge is `parent` — no epsilon probes.

    Non-incident edges: robust crossing count along ref→m (m is a
    definite double triple that lies exactly on none of them in general
    position).  Incident edges (bit-equal to the parent, either
    direction): the limit path ref→(m ± ε·left) crosses the edge iff ref
    is strictly on the opposite side of its great circle — decided by
    the exact Sign, with the standard direction increment."""
    base = ref_winding
    w_left = 0
    w_right = 0
    tc, td = tuple(parent[0]), tuple(parent[1])
    for c, d in edges:
        k = (tuple(c), tuple(d))
        if k == (tc, td) or k == (td, tc):
            s_ref = int(P.sign(c[None], d[None], ref[None])[0])
            if s_ref == 0:
                raise ValueError("reference point on an input edge circle")
            delta = -1 if int(P.sign(ref[None], m[None], d[None])[0]) > 0 else 1
            # m_left is displaced to the PARENT's left: that is this
            # copy's left side iff the copy is co-directed.  The limit
            # path ref→m± crosses the copy iff ref sits on the circle
            # side opposite the probe.
            side_left = 1 if k == (tc, td) else -1
            if s_ref * side_left < 0:
                w_left += delta
            else:
                w_right += delta
        else:
            cs = P.crossing_sign(ref, m, c, d)
            if cs > 0:
                base += (
                    -1 if int(P.sign(ref[None], m[None], d[None])[0]) > 0 else 1
                )
            elif cs == 0:
                raise ValueError("degenerate crossing on winding probe path")
    return base + w_left, base + w_right


def _winding_at(
    p: np.ndarray, edges, ref: np.ndarray, ref_winding: int
) -> int:
    """winding_number with probe-perturbation retries: a degeneracy
    emission test needs w at a point not on any arrangement edge; if the
    path ref→p hits a vertex exactly, nudge the probe slightly (the
    winding number is constant in the point's open region)."""
    try:
        return winding_number(p, edges, ref, ref_winding)
    except ValueError:
        pass
    for t in (1e-9, 2.345e-9, -1.7e-9):
        q = p + np.array([t, -0.6 * t, 0.3 * t])
        q = q / np.linalg.norm(q)
        try:
            return winding_number(q, edges, ref, ref_winding)
        except ValueError:
            continue
    raise ValueError("could not find a generic probe for degeneracy test")


def _slerp(x: np.ndarray, y: np.ndarray, t: float) -> np.ndarray:
    omega = math.acos(max(-1.0, min(1.0, float(x @ y))))
    if omega == 0:
        return x
    so = math.sin(omega)
    p = (math.sin((1 - t) * omega) * x + math.sin(t * omega) * y) / so
    return p / np.linalg.norm(p)


def winding_operation_snapped(
    loops: list[np.ndarray],
    ref: np.ndarray,
    ref_winding: int,
    rule,
    snap,
    include_degeneracies: bool = False,
):
    """S2WindingOperation with a snap function (the reference's
    options.snap_function_, s2winding_operation.h:136-148): inputs snap
    through ONE joint site set, and the declared reference winding is
    transported across the snap via the signed-crossing delta along an
    anchor path — the closed-loop specialization of
    GetSnappedWindingDelta (the winding at a far anchor is unchanged by
    snapping, so delta(ref) = crossings(q→ref, snapped) −
    crossings(q→ref, original)).  Loops that collapse to a single site
    become point shells (s2winding_operation_test.cc CollapsingShell)."""
    from .builder import choose_sites, snap_edge_chain

    all_v = [np.asarray(l, float).reshape(-1, 3) for l in loops]
    all_v = [v for v in all_v if len(v)]
    if not any(len(v) > 1 for v in all_v):
        return winding_operation(
            all_v, ref, ref_winding, rule, include_degeneracies
        )
    sites, _ = choose_sites(np.concatenate(all_v), snap)
    snapped: list[np.ndarray] = []
    orig_edges: list = []
    snap_edges: list = []
    for v in all_v:
        if len(v) == 1:
            d = np.arccos(np.clip(sites @ v[0], -1.0, 1.0))
            snapped.append(sites[int(np.argmin(d))][None])
            continue
        chain: list[np.ndarray] = []
        for i in range(len(v)):
            orig_edges.append((v[i], v[(i + 1) % len(v)]))
            for si in snap_edge_chain(
                v[i], v[(i + 1) % len(v)], sites, snap.snap_radius
            ):
                s = sites[si]
                if chain and np.all(chain[-1] == s):
                    continue
                chain.append(s)
        if len(chain) > 1 and np.all(chain[0] == chain[-1]):
            chain.pop()
        if chain:
            snapped.append(np.asarray(chain))
        for i in range(len(chain)):
            if len(chain) > 1:
                snap_edges.append((chain[i], chain[(i + 1) % len(chain)]))
    # anchor far from all geometry: the winding there is snap-invariant
    c = np.concatenate(all_v).sum(0)
    n = np.linalg.norm(c)
    q = -(c / n) if n > 1e-30 else np.array([0.0, 0.0, 1.0])
    delta = (_winding_at(ref, snap_edges, q, 0)
             - _winding_at(ref, orig_edges, q, 0))
    return winding_operation(
        snapped, ref, ref_winding + delta, rule, include_degeneracies
    )


def winding_operation(
    loops: list[np.ndarray],
    ref: np.ndarray,
    ref_winding: int,
    rule,
    include_degeneracies: bool = False,
):
    """→ (boundary loops, is_full), or with `include_degeneracies` a
    3-tuple (boundary loops, is_full, degens) where degens is a dict
    {"points": [xyz], "sibling_edges": [(a, b)]} of the emitted
    degenerate boundaries (s2winding_operation.h:96-124).  is_full means
    the rule holds everywhere (no boundary); empty result + rule false
    at ref means the empty region."""
    raw_edges = []
    point_shells: list[np.ndarray] = []
    for lp in loops:
        v = np.asarray(lp, float).reshape(-1, 3)
        if len(v) == 1:
            point_shells.append(v[0])
            continue
        for i in range(len(v)):
            raw_edges.append((v[i], v[(i + 1) % len(v)]))
    # cancel sibling pairs (edge + bit-exact reverse): they contribute
    # nothing to any winding number and the reference removes them from
    # the arrangement, re-emitting per the degeneracy rules below
    from collections import Counter

    fwd = Counter()
    for a, b in raw_edges:
        fwd[(tuple(a), tuple(b))] += 1
    siblings: list[tuple[tuple, tuple, int]] = []  # (a, b, n_pairs)
    edges = []
    done = set()
    for a, b in raw_edges:
        ka, kb = tuple(a), tuple(b)
        key = (min(ka, kb), max(ka, kb))
        if key in done:
            continue
        done.add(key)
        f = fwd.get((key[0], key[1]), 0)
        r = fwd.get((key[1], key[0]), 0)
        pairs = min(f, r)
        if pairs:
            siblings.append((key[0], key[1], pairs))
        surplus, direction = (f - r, (key[0], key[1])) if f >= r else (
            r - f, (key[1], key[0])
        )
        for _ in range(surplus):
            edges.append(
                (np.asarray(direction[0]), np.asarray(direction[1]))
            )

    def _finish(result_loops, full):
        if not include_degeneracies:
            return result_loops, full
        degens = {"points": [], "sibling_edges": []}
        # ODD is the only rule with this signature on {0, 1, 2}
        odd_rule = rule(1) and not rule(0) and not rule(2)
        for p, mult in Counter(tuple(q) for q in point_shells).items():
            if odd_rule:
                emit = mult % 2 == 1
            else:
                emit = _winding_at(np.asarray(p), edges, ref, ref_winding) == 0
            if emit:
                degens["points"].append(np.asarray(p))
        for ka, kb, pairs in siblings:
            a, b = np.asarray(ka), np.asarray(kb)
            if odd_rule:
                emit = pairs % 2 == 1
            else:
                m = _slerp(a, b, 0.4926353)
                emit = _winding_at(m, edges, ref, ref_winding) == 0
            if emit:
                degens["sibling_edges"].append((a, b))
        return result_loops, full, degens

    if not edges:
        return _finish([], bool(rule(ref_winding)))
    subs = _split_edges(edges, edges, with_parent=True)
    # S2Builder vertex merging: the winding op always sets
    # split_crossing_edges, which gives every edge a snap radius of at
    # least kIntersectionError (s2builder.h:238-258) — crossing points
    # closer than that collapse onto ONE site.  Mirror it by merging
    # sub-edge endpoints within 4·kIntersectionError (chord), dropping
    # the resulting zero-length sub-edges; without this, slivers between
    # nearly-coincident crossings are too short to carry an interior
    # probe point.
    merge2 = (4 * 8 * 0.5 * 2.220446049250313e-16) ** 2
    remap: dict = {}

    def _canon(t: tuple) -> tuple:
        while t in remap:
            t = remap[t]
        return t

    for a, b, _ei in subs:
        d = a - b
        if float(d @ d) < merge2:
            ka, kb = _canon(tuple(a)), _canon(tuple(b))
            if ka != kb:
                lo, hi = (ka, kb) if ka < kb else (kb, ka)
                remap[hi] = lo
    if remap:
        merged_subs = []
        for a, b, ei in subs:
            ka, kb = _canon(tuple(a)), _canon(tuple(b))
            if ka == kb:
                continue
            merged_subs.append((np.asarray(ka), np.asarray(kb), ei))
        subs = merged_subs
        if not subs:
            # every boundary edge collapsed: winding is constant
            return _finish([], bool(rule(ref_winding)))
    kept = []
    for a, b, ei in subs:
        parent = edges[ei]
        for attempt, t in enumerate((0.4926353, 0.6180339, 0.3141592)):
            try:
                m = _slerp(a, b, t)
                if tuple(m) == tuple(a) or tuple(m) == tuple(b):
                    # ultra-short sub-edge: slerp underflows to an
                    # endpoint (acos rounds to 0); the chord midpoint
                    # keeps ~half the separation and stays interior
                    m = a + b
                    m = m / np.linalg.norm(m)
                if tuple(m) == tuple(a) or tuple(m) == tuple(b):
                    raise ValueError("sub-edge too short for interior probe")
                wl, wr = winding_sides(m, parent, edges, ref, ref_winding)
                break
            except ValueError:
                if attempt == 2:
                    raise
        rl, rr = bool(rule(wl)), bool(rule(wr))
        if rl and not rr:
            kept.append((a, b))
        elif rr and not rl:
            kept.append((b, a))
    if remap:
        # vertex merging can leave exact duplicate directed sub-edges
        # (coincident offset arcs); the boundary is still ONE curve —
        # keep a single representative per directed pair
        seen_pairs = set()
        uniq = []
        for a, b in kept:
            key = (tuple(a), tuple(b))
            if key in seen_pairs:
                continue
            seen_pairs.add(key)
            uniq.append((a, b))
        # a kept sibling pair is a zero-area sliver between two merged
        # coincident arcs — cancel both directions
        uniq = [
            (a, b)
            for a, b in uniq
            if (tuple(b), tuple(a)) not in seen_pairs
        ]
        # classification noise on sub-ulp slivers can leave isolated
        # kept edges; a true region boundary has balanced in/out degree
        # at every vertex, so prune dangling edges iteratively
        changed = True
        while changed:
            changed = False
            outs = Counter(tuple(a) for a, b in uniq)
            ins = Counter(tuple(b) for a, b in uniq)
            pruned = [
                (a, b)
                for a, b in uniq
                if ins.get(tuple(a), 0) > 0 and outs.get(tuple(b), 0) > 0
            ]
            if len(pruned) != len(uniq):
                uniq = pruned
                changed = True
        kept = uniq
    if not kept:
        return _finish([], bool(rule(ref_winding)))
    return _finish(_assemble_loops(kept), False)
