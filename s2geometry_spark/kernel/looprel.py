"""S2Loop ↔ S2Loop relations: Contains / Intersects / CompareBoundary /
ContainsNested / BoundaryEquals / Invert.

Port (semantics, re-derived over this repo's robust predicates):
  - WedgeContains / WedgeIntersects          s2wedge_relations.cc:25-46
  - WedgeContainsSemiwedge                   s2loop.cc:1157-1167
  - HasCrossingRelation + LoopRelation       s2loop.cc:699-1054 — the
    reference walks two S2ShapeIndexes in cell order purely as an
    optimization; the relation OUTCOME is order-independent (any proper
    crossing dominates, wedge results accumulate), so this port
    evaluates the full edge-pair matrix with vectorized sign triage and
    resolves only uncertain / shared-vertex pairs scalarly.
  - S2Loop::Contains(S2Loop)                 s2loop.cc:1056-1101
  - S2Loop::Intersects(S2Loop)               s2loop.cc:1124-1154
  - S2Loop::CompareBoundary                  s2loop.cc:1213-1235
  - S2Loop::ContainsNested                   s2loop.cc:1237-1258
  - S2Loop::BoundaryEquals / Invert          s2loop.cc:1267+, s2loop.cc:379

The bound-box preconditions in the reference (subregion_bound_.Contains
etc.) are pure short-circuits — every semantic decision they guard is
re-checked pointwise here, unconditionally.
"""

from __future__ import annotations

import numpy as np

from . import predicates as P
from .contains import Loop

__all__ = [
    "wedge_contains",
    "wedge_intersects",
    "loop_contains",
    "loop_intersects",
    "compare_boundary",
    "contains_nested",
    "boundary_equals",
    "invert",
]


def wedge_contains(a0, ab1, a2, b0, b2) -> bool:
    """WedgeContains (s2wedge_relations.cc:25-33): CCW edge order around
    ab1 must be a2 b2 b0 a0."""
    return P.ordered_ccw(a2, b2, b0, ab1) and P.ordered_ccw(b0, a0, a2, ab1)


def wedge_intersects(a0, ab1, a2, b0, b2) -> bool:
    """WedgeIntersects (s2wedge_relations.cc:35-46): for A NOT to
    intersect B the CCW order around ab1 must be a0 b2 b0 a2 (written
    as negations for shared-vertex correctness, as in the reference)."""
    return not (
        P.ordered_ccw(a0, b2, b0, ab1) and P.ordered_ccw(b0, a2, a0, ab1)
    )


WEDGE_EQUALS = "WEDGE_EQUALS"
WEDGE_PROPERLY_CONTAINS = "WEDGE_PROPERLY_CONTAINS"
WEDGE_IS_PROPERLY_CONTAINED = "WEDGE_IS_PROPERLY_CONTAINED"
WEDGE_PROPERLY_OVERLAPS = "WEDGE_PROPERLY_OVERLAPS"
WEDGE_IS_DISJOINT = "WEDGE_IS_DISJOINT"


def get_wedge_relation(a0, ab1, a2, b0, b2) -> str:
    """GetWedgeRelation (s2wedge_relations.cc:47-80): classify the six
    circular edge orderings at a shared vertex into the five-value
    relation, taking the most specific answer when edges overlap."""
    import numpy as np

    if np.array_equal(a0, b0) and np.array_equal(a2, b2):
        return WEDGE_EQUALS
    if P.ordered_ccw(a0, a2, b2, ab1):
        # cases 1, 5, 6 (or 2 if a2 == b2)
        if P.ordered_ccw(b2, b0, a0, ab1):
            return WEDGE_PROPERLY_CONTAINS
        return (
            WEDGE_IS_PROPERLY_CONTAINED
            if np.array_equal(a2, b2)
            else WEDGE_PROPERLY_OVERLAPS
        )
    # cases 2, 3, 4
    if P.ordered_ccw(a0, b0, b2, ab1):
        return WEDGE_IS_PROPERLY_CONTAINED
    return (
        WEDGE_IS_DISJOINT
        if P.ordered_ccw(a0, b0, a2, ab1)
        else WEDGE_PROPERLY_OVERLAPS
    )


def _wedge_contains_semiwedge(a0, ab1, a2, b2, reverse_b: bool) -> bool:
    """WedgeContainsSemiwedge (s2loop.cc:1157-1167)."""
    if (b2 == a0).all() or (b2 == a2).all():
        return bool((b2 == a0).all()) == reverse_b
    return P.ordered_ccw(a0, a2, b2, ab1)


def _edge_pair_events(a: Loop, b: Loop):
    """(has_proper_crossing, shared_pairs) over the full edge-pair
    matrix.  shared_pairs lists (i, j) with a.vertex(i+1) == b.vertex(j+1)
    — the reference processes each shared vertex exactly at the edge
    pair that ENDS there (s2loop.cc:885-897).  Proper crossings are
    triaged vectorized (the 4 orientation determinants as matrix
    products); only uncertain pairs fall back to the scalar robust
    CrossingSign."""
    va, vb = a.vertices, b.vertices
    ca, da = va, np.roll(va, -1, axis=0)
    cb, db = vb, np.roll(vb, -1, axis=0)

    # Pairs sharing any vertex: CrossingSign == 0 there by definition.
    eq = lambda X, Y: (X[:, None, :] == Y[None, :, :]).all(-1)  # noqa: E731
    shares = eq(ca, cb) | eq(ca, db) | eq(da, cb) | eq(da, db)
    shared_heads = eq(da, db)

    n1 = np.cross(ca, da)
    acb = -P.triage_sign_det(cb @ n1.T).T
    bda = P.triage_sign_det(db @ n1.T).T
    n2 = np.cross(cb, db)
    cbd = -P.triage_sign_det(da @ n2.T)
    dac = P.triage_sign_det(ca @ n2.T)
    certain_no = (
        ((acb != 0) & (bda != 0) & (acb != bda))
        | ((cbd != 0) & (dac != 0) & (cbd != dac))
        | ((acb != 0) & (cbd != 0) & (acb != cbd))
        | ((bda != 0) & (dac != 0) & (bda != dac))
        | ((acb != 0) & (dac != 0) & (acb != dac))
        | ((bda != 0) & (cbd != 0) & (bda != cbd))
    )
    crossing = (acb == bda) & (cbd == acb) & (dac == acb) & (acb != 0)
    if (crossing & ~shares).any():
        return True, []
    pending = ~certain_no & ~shares
    for i, j in zip(*np.nonzero(pending)):
        if P.crossing_sign(ca[i], da[i], cb[j], db[j]) > 0:
            return True, []
    return False, list(zip(*np.nonzero(shared_heads)))


def _vertex(v: np.ndarray, i: int) -> np.ndarray:
    return v[i % len(v)]


def _sweep(a: Loop, b: Loop, wedges_cross):
    """HasCrossingRelation re-expressed: returns (relation_fired,
    found_shared_vertex).  relation_fired is True on any proper edge
    crossing or any wedge where wedges_cross(a0, ab1, a2, b0, b2) is
    True (s2loop.cc:874-899)."""
    has_crossing, shared = _edge_pair_events(a, b)
    if has_crossing:
        return True, True
    va, vb = a.vertices, b.vertices
    fired = False
    for i, j in shared:
        if wedges_cross(
            va[i], _vertex(va, i + 1), _vertex(va, i + 2),
            vb[j], _vertex(vb, j + 2),
        ):
            fired = True
            break
    return fired, bool(shared)


def _pt(loop: Loop, p: np.ndarray) -> bool:
    return bool(loop.contains(np.asarray(p, float)[None])[0])


def loop_contains(a: Loop, b: Loop) -> bool:
    """S2Loop::Contains(S2Loop) (s2loop.cc:1056-1101)."""
    if a.is_empty_or_full or b.is_empty_or_full:
        return a.is_full or b.is_empty
    fired, shared = _sweep(
        a, b, lambda a0, ab1, a2, b0, b2: not wedge_contains(a0, ab1, a2, b0, b2)
    )
    if fired:
        return False
    if shared:
        return True
    if not _pt(a, b.vertices[0]):
        return False
    # (A ∪ B) covering the sphere means neither contains the other.
    if _pt(b, a.vertices[0]):
        return False
    return True


def loop_intersects(a: Loop, b: Loop) -> bool:
    """S2Loop::Intersects (s2loop.cc:1124-1154)."""
    if a.is_empty or b.is_empty:
        return False
    if a.is_full or b.is_full:
        return True
    fired, shared = _sweep(a, b, wedge_intersects)
    if fired:
        return True
    if shared:
        return False
    # No crossings / shared vertices: loops intersect iff A ⊇ B,
    # B ⊇ A, or A and B contain each other's boundaries — all of which
    # imply one loop contains the other's vertex 0.
    return _pt(a, b.vertices[0]) or _pt(b, a.vertices[0])


def compare_boundary(a: Loop, b: Loop, b_is_hole: bool = False) -> int:
    """S2Loop::CompareBoundary (s2loop.cc:1213-1235): +1 if A contains
    the boundary of B, -1 if A excludes it, 0 if the boundaries cross.
    Neither loop may be empty."""
    assert not a.is_empty and not b.is_empty
    if a.is_full:
        return 1
    if b.is_full:
        return -1
    state = {"contains": False, "excludes": False}

    def wedges_cross(a0, ab1, a2, b0, b2):
        if _wedge_contains_semiwedge(a0, ab1, a2, b2, b_is_hole):
            state["contains"] = True
        else:
            state["excludes"] = True
        return state["contains"] and state["excludes"]

    fired, shared = _sweep(a, b, wedges_cross)
    if fired:
        return 0
    if shared:
        return 1 if state["contains"] else -1
    return 1 if _pt(a, b.vertices[0]) else -1


def _find_vertex(a: Loop, p: np.ndarray) -> int:
    """FindVertex (s2loop.cc): the index m in [1, n] with vertex(m) == p
    (vertex() wraps, so vertices[0] is reported as m == n)."""
    hits = np.nonzero((a.vertices == np.asarray(p, float)).all(-1))[0]
    if not len(hits):
        return -1
    k = int(hits[0])
    return k if k >= 1 else len(a.vertices)


def contains_nested(a: Loop, b: Loop) -> bool:
    """S2Loop::ContainsNested (s2loop.cc:1237-1258) — valid only when
    the regions do not cross (one contains the other or disjoint)."""
    if a.is_empty_or_full or len(b.vertices) < 2:
        return a.is_full or b.is_empty
    m = _find_vertex(a, b.vertices[1])
    if m < 0:
        return _pt(a, b.vertices[1])
    va = a.vertices
    return wedge_contains(
        _vertex(va, m - 1), _vertex(va, m), _vertex(va, m + 1),
        b.vertices[0], _vertex(b.vertices, 2),
    )


def boundary_equals(a: Loop, b: Loop) -> bool:
    """S2Loop::BoundaryEquals (s2loop.cc:1267+): identical vertex cycles
    up to rotation; empty/full loops compare by their is_empty state
    regardless of the sentinel vertex's exact position (s2loop.cc:1268:
    `if (is_empty_or_full()) return is_empty() == b.is_empty();`)."""
    if a.is_empty_or_full or b.is_empty_or_full:
        return (
            a.is_empty_or_full
            and b.is_empty_or_full
            and a.origin_inside == b.origin_inside
        )
    va, vb = a.vertices, b.vertices
    if len(va) != len(vb):
        return False
    for off in range(len(va)):
        if (np.roll(va, -off, axis=0) == vb).all():
            return True
    return False


def invert(a: Loop) -> Loop:
    """S2Loop::Invert (s2loop.cc:379): the complement region."""
    if a.is_empty_or_full:
        return Loop(-a.vertices)
    return Loop(a.vertices[::-1].copy())


def match_boundaries(a: np.ndarray, b: np.ndarray, a_offset: int,
                     max_error_rad: float) -> bool:
    """MatchBoundaries (s2loop.cc:1312-1355): backtracking walk over
    (i, j) states — advance i only while a's next vertex stays within
    max_error of b's current edge, and vice versa."""
    import math

    from .distance import update_min_distance

    na, nb = len(a), len(b)
    s = 2 * math.sin(0.5 * min(math.pi, max_error_rad))
    tol2 = s * s

    def av(k: int) -> np.ndarray:
        return a[k % na]

    def bv(k: int) -> np.ndarray:
        return b[k % nb]

    pending = [(0, 0)]
    done = {(0, 0)}
    while pending:
        i, j = pending.pop()
        if i == na and j == nb:
            return True
        io = i + a_offset
        if io >= na:
            io -= na
        if (
            i < na
            and (i + 1, j) not in done
            and update_min_distance(av(io + 1), bv(j), bv(j + 1)) <= tol2
        ):
            done.add((i + 1, j))
            pending.append((i + 1, j))
        if (
            j < nb
            and (i, j + 1) not in done
            and update_min_distance(bv(j + 1), av(io), av(io + 1)) <= tol2
        ):
            done.add((i, j + 1))
            pending.append((i, j + 1))
    return False


def boundary_near(a: np.ndarray, b: np.ndarray, max_error_rad: float) -> bool:
    """S2Loop::BoundaryNear (s2loop.cc:1357-1366): boundaries match
    within max_error under some starting offset."""
    a = np.asarray(a, float).reshape(-1, 3)
    b = np.asarray(b, float).reshape(-1, 3)
    for a_offset in range(len(a)):
        if match_boundaries(a, b, a_offset, max_error_rad):
            return True
    return False
