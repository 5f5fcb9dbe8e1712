"""S2WindingOperation (general position) — winding-number boolean ops.

Given possibly self-intersecting directed loops, a reference point with
known winding number, and a winding rule, computes the boundary of the
region where the rule holds (s2winding_operation.h:37-90: POSITIVE =
N-way union, NEGATIVE, NON_ZERO, ODD = N-way symmetric difference).

Re-derivation (the reference routes through S2Builder graphs):
 1. split every edge at its proper crossings with every other edge
    (the bow-tie self-crossing case included);
 2. for each sub-edge, probe the winding number just left and just
    right of an interior point: w(p) = w(ref) + Σ signed crossings of
    the geodesic ref→p with the input edges (+1 when the edge crosses
    the path leftward);
 3. keep sub-edges where rule(w_left) ≠ rule(w_right), oriented with
    the rule-true side on the left;
 4. assemble the directed boundary loops (max-CCW face tracing).

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


def _probe_pair(a: np.ndarray, b: np.ndarray, t: float, eps: float):
    m = _slerp(a, b, t)
    tang = b - a * float(a @ b)
    n = np.linalg.norm(tang)
    if n == 0:
        raise ValueError("degenerate sub-edge")
    tang = tang / n
    left = np.cross(m, tang)
    pl = m + eps * left
    pr = m - eps * left
    return pl / np.linalg.norm(pl), pr / np.linalg.norm(pr)


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
    subs = _split_edges(edges, edges)
    kept = []
    for a, b in subs:
        for attempt, (t, eps) in enumerate(
            ((0.4926353, 1e-9), (0.6180339, 3e-10), (0.3141592, 1e-8))
        ):
            try:
                pl, pr = _probe_pair(a, b, t, eps)
                wl = winding_number(pl, edges, ref, ref_winding)
                wr = winding_number(pr, edges, ref, ref_winding)
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
