"""Robust spherical orientation predicates, vectorized with exact fallback.

Port of the reference's tiered Sign() (s2predicates.cc:43-296):
  1. TriageSign — plain float64 determinant with error bound
     kMaxDetError = 3.6548 * DBL_EPSILON (s2predicates.cc:374-406),
     evaluated for ALL rows as a NumPy einsum;
  2. StableSign — numerically stable re-derivation on the uncertain
     subset (s2predicates.cc:64-103);
  3. ExactSign — exact rational arithmetic (`fractions.Fraction`; doubles
     are dyadic rationals so this is exact like ExactFloat) + the
     "Simulation of Simplicity" symbolic perturbation copied verbatim
     from SymbolicallyPerturbedSign (s2predicates.cc:131-226).

Only the (typically ~1e-6) uncertain fraction of rows ever leaves the
vectorized path.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

DBL_EPSILON = float(np.finfo(np.float64).eps)
MAX_DET_ERROR = 3.6548 * DBL_EPSILON  # s2predicates.cc:393
DET_ERROR_MULT = 3.2321 * DBL_EPSILON  # StableSign, s2predicates.cc:82
MIN_NO_UNDERFLOW = DET_ERROR_MULT * np.sqrt(np.finfo(np.float64).tiny)

# S2::Origin (s2pointutil.h:98-115): ~66km from the north pole.
ORIGIN = np.array(
    [-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195]
)


def cross(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cross product for (...,3) arrays."""
    return np.cross(a, b)


def dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.einsum("...i,...i->...i", a, b).sum(-1) if False else (a * b).sum(-1)


def triage_sign_det(det: np.ndarray) -> np.ndarray:
    """det → {-1, 0, +1} with 0 meaning *uncertain* (|det| ≤ kMaxDetError)."""
    out = np.zeros(det.shape, dtype=np.int8)
    out[det > MAX_DET_ERROR] = 1
    out[det < -MAX_DET_ERROR] = -1
    return out


def _stable_sign_rows(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized StableSign (s2predicates.cc:64-103) on (n,3) rows;
    0 = still uncertain."""
    ab = b - a
    bc = c - b
    ca = a - c
    ab2 = (ab * ab).sum(-1)
    bc2 = (bc * bc).sum(-1)
    ca2 = (ca * ca).sum(-1)
    det_ab = -(np.cross(ca, bc) * c).sum(-1)
    err_ab = DET_ERROR_MULT * np.sqrt(ca2 * bc2)
    det_bc = -(np.cross(ab, ca) * a).sum(-1)
    err_bc = DET_ERROR_MULT * np.sqrt(ab2 * ca2)
    det_ca = -(np.cross(bc, ab) * b).sum(-1)
    err_ca = DET_ERROR_MULT * np.sqrt(bc2 * ab2)
    use_ab = (ab2 >= bc2) & (ab2 >= ca2)
    use_bc = ~use_ab & (bc2 >= ca2)
    det = np.where(use_ab, det_ab, np.where(use_bc, det_bc, det_ca))
    err = np.where(use_ab, err_ab, np.where(use_bc, err_bc, err_ca))
    out = np.zeros(det.shape, dtype=np.int8)
    ok = err >= MIN_NO_UNDERFLOW
    out[ok & (np.abs(det) > err) & (det > 0)] = 1
    out[ok & (np.abs(det) > err) & (det < 0)] = -1
    return out


def _sgn(x: Fraction) -> int:
    return (x > 0) - (x < 0)


def _symbolically_perturbed_sign(a, b, c, bxc) -> int:
    """Verbatim port of SymbolicallyPerturbedSign (s2predicates.cc:131-226).

    a,b,c are Fraction triples sorted lexicographically ascending;
    bxc is the exact cross product b × c.
    """
    s = _sgn(bxc[2])  # da[2]
    if s:
        return s
    s = _sgn(bxc[1])  # da[1]
    if s:
        return s
    s = _sgn(bxc[0])  # da[0]
    if s:
        return s
    s = _sgn(c[0] * a[1] - c[1] * a[0])  # db[2]
    if s:
        return s
    s = _sgn(c[0])  # db[2] * da[1]
    if s:
        return s
    s = -_sgn(c[1])  # db[2] * da[0]
    if s:
        return s
    s = _sgn(c[2] * a[0] - c[0] * a[2])  # db[1]
    if s:
        return s
    s = _sgn(c[2])  # db[1] * da[0]
    if s:
        return s
    s = _sgn(a[0] * b[1] - a[1] * b[0])  # dc[2]
    if s:
        return s
    s = -_sgn(b[0])  # dc[2] * da[1]
    if s:
        return s
    s = _sgn(b[1])  # dc[2] * da[0]
    if s:
        return s
    s = _sgn(a[0])  # dc[2] * db[1]
    if s:
        return s
    return 1  # dc[2] * db[1] * da[0]


def exact_sign(pa, pb, pc, perturb: bool = True) -> int:
    """ExactSign (s2predicates.cc:229-262) for one point triple (tuples)."""
    pa, pb, pc = tuple(pa), tuple(pb), tuple(pc)
    if pa == pb or pb == pc or pc == pa:
        return 0
    perm_sign = 1
    if pa > pb:
        pa, pb = pb, pa
        perm_sign = -perm_sign
    if pb > pc:
        pb, pc = pc, pb
        perm_sign = -perm_sign
    if pa > pb:
        pa, pb = pb, pa
        perm_sign = -perm_sign
    a = tuple(Fraction(x) for x in pa)
    b = tuple(Fraction(x) for x in pb)
    c = tuple(Fraction(x) for x in pc)
    bxc = (
        b[1] * c[2] - b[2] * c[1],
        b[2] * c[0] - b[0] * c[2],
        b[0] * c[1] - b[1] * c[0],
    )
    det = a[0] * bxc[0] + a[1] * bxc[1] + a[2] * bxc[2]
    det_sign = _sgn(det)
    if det_sign == 0 and perturb:
        det_sign = _symbolically_perturbed_sign(a, b, c, bxc)
    return perm_sign * det_sign


def sign(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Robust Sign() for broadcastable (...,3) arrays → int8 in {-1,+1}
    (0 only when two points are bit-identical, matching ExpensiveSign)."""
    a, b, c = np.broadcast_arrays(
        np.asarray(a, float), np.asarray(b, float), np.asarray(c, float)
    )
    det = (np.cross(a, b) * c).sum(-1)
    out = triage_sign_det(det)
    unc = out == 0
    if unc.any():
        rows_a = a[unc].reshape(-1, 3)
        rows_b = b[unc].reshape(-1, 3)
        rows_c = c[unc].reshape(-1, 3)
        stable = _stable_sign_rows(rows_a, rows_b, rows_c)
        still = stable == 0
        if still.any():
            exact = np.array(
                [
                    exact_sign(ra, rb, rc)
                    for ra, rb, rc in zip(
                        rows_a[still], rows_b[still], rows_c[still]
                    )
                ],
                dtype=np.int8,
            )
            stable[still] = exact
        out[unc] = stable
    return out


def ortho(a: np.ndarray) -> np.ndarray:
    """S2::Ortho (s2pointutil.cc:48-60, the non-S2_TEST_DEGENERACIES
    branch): RefDir for vertex crossings and semi-open vertex
    containment.  The reference deliberately perturbs the cross-product
    axis — temp = (0.012, 0.0053, 0.00457) with temp[k] = 1 — so the
    result never lies exactly on a coordinate plane (Vector3::Ortho's
    axis-aligned variant creates many more degenerate sign cases, e.g.
    equatorial RefDirs for equator-adjacent vertices)."""
    a = np.asarray(a, float)
    ax = np.abs(a)
    largest = np.where(ax[0] > ax[1], np.where(ax[0] > ax[2], 0, 2), np.where(ax[1] > ax[2], 1, 2))
    k = largest - 1
    if k < 0:
        k = 2
    temp = np.array([0.012, 0.0053, 0.00457])
    temp[k] = 1.0
    out = np.cross(a, temp)
    return out / np.linalg.norm(out)


def ordered_ccw(a, b, c, o) -> bool:
    """OrderedCCW (s2predicates.cc:299-312), scalar."""
    s = 0
    if sign(b[None], o[None], a[None])[0] >= 0:
        s += 1
    if sign(c[None], o[None], b[None])[0] >= 0:
        s += 1
    if sign(a[None], o[None], c[None])[0] > 0:
        s += 1
    return s >= 2


def angle_contains_vertex(a, b, c) -> bool:
    """AngleContainsVertex (s2edge_crossings.h:239-252)."""
    return not ordered_ccw(ortho(b), c, a, b)


class ContainsVertexQuery:
    """S2ContainsVertexQuery (s2contains_vertex_query.h/.cc): decide
    whether a target vertex of an edge graph is contained, from the
    signed multiset of edges incident to it.  ContainsSign finds the
    unmatched edge immediately clockwise from RefDir(target); the result
    is +1 iff that edge is outgoing (closed at the CCW-first edge, open
    at the other — the S2::VertexCrossing compatibility convention)."""

    def __init__(self, target: np.ndarray) -> None:
        self._target = np.asarray(target, float).reshape(3)
        self._edge_map: dict[tuple, int] = {}

    def add_edge(self, v: np.ndarray, direction: int) -> None:
        """direction +1 = outgoing edge (target, v); -1 = incoming."""
        key = tuple(np.asarray(v, float).reshape(3))
        self._edge_map[key] = self._edge_map.get(key, 0) + direction

    def duplicate_edges(self) -> bool:
        """True when some incident edge appears more than once in the
        same direction (net count beyond ±1)."""
        return any(abs(s) > 1 for s in self._edge_map.values())

    def contains_sign(self) -> int:
        """s2contains_vertex_query.cc:30-49."""
        reference_dir = ortho(self._target)
        best_point, best_sign = reference_dir, 0
        for key, s in self._edge_map.items():
            if s == 0:
                continue  # matched incoming/outgoing pair
            p = np.asarray(key)
            if ordered_ccw(reference_dir, best_point, p, self._target):
                best_point, best_sign = p, s
        return best_sign


def vertex_crossing(a, b, c, d) -> bool:
    """VertexCrossing (s2edge_crossings.cc), scalar — requires a shared vertex."""
    a, b, c, d = (tuple(v) for v in (a, b, c, d))
    if a == b or c == d:
        return False
    an, bn, cn, dn = (np.asarray(v) for v in (a, b, c, d))
    if a == c:
        return (b == d) or ordered_ccw(ortho(an), dn, bn, an)
    if b == d:
        return ordered_ccw(ortho(bn), cn, an, bn)
    if a == d:
        return (b == c) or ordered_ccw(ortho(an), cn, bn, an)
    if b == c:
        return ordered_ccw(ortho(bn), dn, an, bn)
    return False


def crossing_sign(a, b, c, d) -> int:
    """CrossingSign (s2edge_crossings.h:103-127), scalar robust version:
    +1 interior crossing / 0 shared vertex / -1 none."""
    a, b, c, d = (np.asarray(v, float) for v in (a, b, c, d))
    ta, tb, tc, td = (tuple(v) for v in (a, b, c, d))
    if ta == tc or ta == td or tb == tc or tb == td:
        return 0
    if ta == tb or tc == td:
        return -1
    if not (
        np.isfinite(a).all()
        and np.isfinite(b).all()
        and np.isfinite(c).all()
        and np.isfinite(d).all()
    ):
        # NaN/Inf points never cross (s2edge_crosser_test.cc
        # InvalidNanPoints expects -1 without crashing; the exact tier
        # cannot represent non-finite coordinates)
        return -1
    acb = -int(sign(a[None], b[None], c[None])[0])
    bda = int(sign(a[None], b[None], d[None])[0])
    if acb != bda:
        return -1
    cbd = -int(sign(c[None], d[None], b[None])[0])
    if cbd != acb:
        return -1
    dac = int(sign(c[None], d[None], a[None])[0])
    if dac != acb:
        return -1
    return 1


def triage_sign_dot_prod(a, b) -> int:
    """TriageSignDotProd (s2predicates.cc:920-941): sign of a·b with the
    Rump dot-product error bound 3.046875ε for vectors of norm ≤ √2; 0
    means inconclusive."""
    na = float(np.dot(np.asarray(a, float), np.asarray(b, float)))
    k_max_error = 3.046875 * 2.220446049250313e-16
    if abs(na) <= k_max_error:
        return 0
    return 1 if na > 0 else -1


def sign_dot_prod(a, b) -> int:
    """SignDotProd (s2predicates.cc:950-964): triage in double, then
    exact rational arithmetic (no long-double tier in this engine)."""
    s = triage_sign_dot_prod(a, b)
    if s != 0:
        return s
    fa = [Fraction(float(x)) for x in np.asarray(a, float)]
    fb = [Fraction(float(x)) for x in np.asarray(b, float)]
    d = fa[0] * fb[0] + fa[1] * fb[1] + fa[2] * fb[2]
    return _sgn(d)


def edge_or_vertex_crossing(a, b, c, d) -> bool:
    cs = crossing_sign(a, b, c, d)
    if cs < 0:
        return False
    if cs > 0:
        return True
    return vertex_crossing(a, b, c, d)


def signed_vertex_crossing(a, b, c, d) -> int:
    """S2::SignedVertexCrossing (s2edge_crossings.cc:393-412): +1 when
    both edges are outgoing/incoming at the shared vertex, else -1/0."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    c, d = np.asarray(c, float), np.asarray(d, float)
    if np.array_equal(a, b) or np.array_equal(c, d):
        return 0
    if np.array_equal(a, c):
        return 1 if (np.array_equal(b, d)
                     or ordered_ccw(ortho(a), d, b, a)) else 0
    if np.array_equal(b, d):
        return 1 if ordered_ccw(ortho(b), c, a, b) else 0
    if np.array_equal(a, d):
        return -1 if (np.array_equal(b, c)
                      or ordered_ccw(ortho(a), c, b, a)) else 0
    if np.array_equal(b, c):
        return -1 if ordered_ccw(ortho(b), d, a, b) else 0
    return 0


def signed_edge_or_vertex_crossing(a, b, c, d) -> int:
    """S2EdgeCrosser::SignedEdgeOrVertexCrossing: ±1 per crossing with
    the sign of Sign(a, b, c) for interior crossings
    (s2edge_crosser.h:342-347)."""
    cs = crossing_sign(a, b, c, d)
    if cs < 0:
        return 0
    if cs > 0:
        return int(sign(
            np.asarray(a, float)[None], np.asarray(b, float)[None],
            np.asarray(c, float)[None],
        )[0])
    return signed_vertex_crossing(a, b, c, d)
