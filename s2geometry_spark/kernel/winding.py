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

Degenerate outputs (point shells / sibling pairs, the reference's
degenerate-boundary support) and snap rounding are out of scope;
compose with kernel/builder.py snapping for near-degenerate input.
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


def _slerp(x: np.ndarray, y: np.ndarray, t: float) -> np.ndarray:
    omega = math.acos(max(-1.0, min(1.0, float(x @ y))))
    if omega == 0:
        return x
    so = math.sin(omega)
    p = (math.sin((1 - t) * omega) * x + math.sin(t * omega) * y) / so
    return p / np.linalg.norm(p)


def winding_operation(
    loops: list[np.ndarray],
    ref: np.ndarray,
    ref_winding: int,
    rule,
) -> tuple[list[np.ndarray], bool]:
    """→ (boundary loops, is_full).  is_full means the rule holds
    everywhere (no boundary); empty result + rule false at ref means the
    empty region."""
    edges = []
    for lp in loops:
        v = np.asarray(lp, float).reshape(-1, 3)
        for i in range(len(v)):
            edges.append((v[i], v[(i + 1) % len(v)]))
    if not edges:
        return [], bool(rule(ref_winding))
    subs = _split_edges(edges, edges, with_parent=True)
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
    if not kept:
        return [], bool(rule(ref_winding))
    return _assemble_loops(kept), False
