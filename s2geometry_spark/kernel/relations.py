"""Polygon↔polygon relations: contains / intersects (s2polygon_test
matrix semantics, s2polygon_test.cc:697-779).

Exact for boundaries in general position (no shared vertices/edges):
 - a proper edge crossing (CrossingSign == +1, robust predicates) means
   the boundaries cross → intersects, neither contains;
 - with disjoint boundaries, an edge lies entirely inside or outside the
   other region, so vertex PIP tests extend to whole boundaries:
     b ⊆ a  ⇔  no crossings ∧ every vertex of b ∈ a
                           ∧ no vertex of a ∈ b's interior
     a ∩ b ≠ ∅ ⇔ crossings ∨ some vertex of b ∈ a ∨ some vertex of a ∈ b
 - bit-identical polygons and empty/full are special-cased.

Shared-boundary degeneracies (several fixture-matrix rows) need the
snap-rounded boolean-op machinery (S2BooleanOperation, SURVEY §2.6
stretch phase) and are not claimed here.
"""

from __future__ import annotations

import numpy as np

from . import predicates as P
from .contains import Polygon


def _edges(poly: Polygon):
    cs, ds = [], []
    for loop in poly.loops:
        v = loop.vertices
        if len(v) >= 3:
            cs.append(v)
            ds.append(np.roll(v, -1, axis=0))
    if not cs:
        return np.zeros((0, 3)), np.zeros((0, 3))
    return np.concatenate(cs), np.concatenate(ds)


def _vertices(poly: Polygon) -> np.ndarray:
    vs = [l.vertices for l in poly.loops if len(l.vertices) >= 3]
    return np.concatenate(vs) if vs else np.zeros((0, 3))


def _proper_crossing(a: Polygon, b: Polygon) -> bool:
    """Any interior edge crossing between boundaries (robust signs)."""
    ca, da = _edges(a)
    cb, db = _edges(b)
    if not len(ca) or not len(cb):
        return False
    # Vectorized triage of the 4 orientation signs for all edge pairs;
    # uncertain pairs fall back to the scalar robust crossing test.
    n1 = np.cross(ca, da)  # (E1,3)
    s_ab_c = P.triage_sign_det(cb @ n1.T).T  # (E1,E2): sign(a1,b1,c2)
    s_ab_d = P.triage_sign_det(db @ n1.T).T
    n2 = np.cross(cb, db)
    s_cd_a = P.triage_sign_det(ca @ n2.T)  # (E1,E2): sign(c2,d2,a1)
    s_cd_b = P.triage_sign_det(da @ n2.T)
    # Spherical crossing needs all four orientations mutually consistent
    # (acb == bda == cbd == dac, s2edge_crosser.cc) — the planar
    # opposite-sides test alone also fires on ANTIPODAL crossings.
    acb = -s_ab_c
    bda = s_ab_d
    cbd = -s_cd_b
    dac = s_cd_a
    certain_no = (
        ((acb != 0) & (bda != 0) & (acb != bda))
        | ((cbd != 0) & (dac != 0) & (cbd != dac))
        | ((acb != 0) & (cbd != 0) & (acb != cbd))
        | ((bda != 0) & (dac != 0) & (bda != dac))
        | ((acb != 0) & (dac != 0) & (acb != dac))
        | ((bda != 0) & (cbd != 0) & (bda != cbd))
    )
    crossing = (acb == bda) & (cbd == acb) & (dac == acb) & (acb != 0)
    if crossing.any():
        return True
    pending = ~certain_no & ~crossing
    for i, j in zip(*np.nonzero(pending)):
        if P.crossing_sign(ca[i], da[i], cb[j], db[j]) > 0:
            return True
    return False


def _same_polygon(a: Polygon, b: Polygon) -> bool:
    if len(a.loops) != len(b.loops):
        return False
    for la, lb in zip(a.loops, b.loops):
        if la.vertices.shape != lb.vertices.shape or not (
            la.vertices == lb.vertices
        ).all():
            return False
    return True


def polygon_relations(a: Polygon, b: Polygon) -> tuple[bool, bool, bool]:
    """(a ⊇ b, b ⊇ a, a ∩ b ≠ ∅)."""
    if a.is_empty or b.is_empty:
        return (b.is_empty, a.is_empty, False)
    if a.is_full or b.is_full:
        return (a.is_full, b.is_full, True)
    if _same_polygon(a, b):
        return (True, True, True)
    if _proper_crossing(a, b):
        return (False, False, True)
    va = _vertices(a)
    vb = _vertices(b)
    b_in_a = a.contains(vb)
    a_in_b = b.contains(va)
    contains_ab = bool(b_in_a.all()) and not bool(a_in_b.any())
    contains_ba = bool(a_in_b.all()) and not bool(b_in_a.any())
    intersects = bool(b_in_a.any() or a_in_b.any())
    return (contains_ab, contains_ba, intersects)


def _probes_of(poly: Polygon, eps: float) -> np.ndarray:
    """Two probe points per edge, displaced ±eps perpendicular to the
    boundary at each edge midpoint.  With no proper boundary crossings,
    every face of the two-polygon overlay is adjacent to some edge
    midpoint, so these probes witness every face."""
    C, D = _edges(poly)
    if not len(C):
        return np.zeros((0, 3))
    m = C + D
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    t = D - C
    t = t - m * (t * m).sum(1, keepdims=True)
    norm_t = np.linalg.norm(t, axis=1, keepdims=True)
    norm_t[norm_t == 0] = 1.0
    t = t / norm_t
    n = np.cross(m, t)
    probes = np.concatenate([m + eps * n, m - eps * n])
    return probes / np.linalg.norm(probes, axis=1, keepdims=True)


def polygon_relations_probed(
    a: Polygon, b: Polygon, eps: float = 1e-11
) -> tuple[bool, bool, bool]:
    """(a ⊇ b, b ⊇ a, a ∩ b ≠ ∅) — robust to SHARED boundaries.

    Handles the full s2polygon_test relation matrix: shared loops,
    shared vertices (the south-pole family), hemisphere complements.
    Requires: no pair of edges overlaps *partially* (fixture polygons
    share edges exactly or only vertices), and the minimum separation
    between distinct non-incident edges at edge midpoints exceeds eps.

    A proper boundary crossing forces (False, False, True); otherwise
    every overlay face is witnessed by an edge-midpoint probe and the
    relations are decided by probe containment in both polygons.
    """
    if a.is_empty or b.is_empty:
        return (b.is_empty, a.is_empty, False)
    if a.is_full or b.is_full:
        return (a.is_full, b.is_full, True)
    if _proper_crossing(a, b):
        return (False, False, True)
    probes = np.concatenate([_probes_of(a, eps), _probes_of(b, eps)])
    in_a = a.contains(probes)
    in_b = b.contains(probes)
    contains_ab = not bool((in_b & ~in_a).any())
    contains_ba = not bool((in_a & ~in_b).any())
    intersects = bool((in_a & in_b).any())
    return (contains_ab, contains_ba, intersects)
