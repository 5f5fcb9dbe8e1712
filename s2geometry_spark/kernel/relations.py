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
    certain_no = (
        ((s_ab_c != 0) & (s_ab_d != 0) & (s_ab_c == s_ab_d))
        | ((s_cd_a != 0) & (s_cd_b != 0) & (s_cd_a == s_cd_b))
    )
    crossing = (
        (s_ab_c == -s_ab_d) & (s_ab_c != 0)
        & (s_cd_a == -s_cd_b) & (s_cd_a != 0)
    )
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
