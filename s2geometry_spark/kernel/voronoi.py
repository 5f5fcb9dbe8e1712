"""Exact Voronoi-snapping predicates for the S2Builder edge phase.

Round-3 directive 4 (SURVEY §7.1 #5): replace the builder's
double-precision coverage-interval bisection with the reference's exact
predicates, so inputs with site separations below ~1e-12 snap
identically to the reference:

  - compare_distances(x, a, b): which site is closer to x, exact
    rationals + the pedestal symbolic perturbation (A on a higher
    pedestal iff A < B ⇒ AX > BX; s2predicates.cc
    ExactCompareDistances / SymbolicCompareDistances).
  - voronoi_site_exclusion(a, b, x0, x1, r): does one site's coverage
    interval along edge X contain the other's — the double-square-root
    elimination of s2pred::ExactVoronoiSiteExclusion
    (s2predicates.cc:1551-1662), a degree-20 rational polynomial
    predicate with the d<0 wraparound cases and the shared-endpoint
    symbolic tie (A closer iff A > B).
  - edge_circumcenter_sign(x0, x1, a, b, c): which side of edge X the
    circumcenter of ABC lies on — ExactEdgeCircumcenterSign
    (s2predicates.cc:1141-1246) + SymbolicEdgeCircumcenterSign
    (:1252-1317), used by the snap-chain maintenance when a middle site
    may be excluded by its two neighbors combined (s2builder.cc SnapEdge
    :1224-1240).

All tiers here are EXACT (Fraction — doubles are dyadic rationals, so
every expression below is an exact rational; the reference's ExactFloat
plays the same role).  The reference's double/long-double triage tiers
are an optimization only; at the builder's workload sizes (tens of
candidate sites per edge) the exact tier costs microseconds, so it runs
unconditionally — no dead gates (round-3 ADVICE precedent).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

FIRST = "first"
SECOND = "second"
NEITHER = "neither"


def _fr(v) -> tuple[Fraction, Fraction, Fraction]:
    return tuple(Fraction(float(t)) for t in v)


def _dot(p, q) -> Fraction:
    return p[0] * q[0] + p[1] * q[1] + p[2] * q[2]


def _cross(p, q):
    return (
        p[1] * q[2] - p[2] * q[1],
        p[2] * q[0] - p[0] * q[2],
        p[0] * q[1] - p[1] * q[0],
    )


def _sgn(x: Fraction) -> int:
    return (x > 0) - (x < 0)


def compare_distances(x, a, b) -> int:
    """-1 / 0 / +1 as AX < / == / > BX, points treated as projected onto
    the unit sphere; exact ties resolve by the pedestal perturbation
    (A < B ⇒ AX > BX), so 0 only when a == b bit-exactly."""
    fx, fa, fb = _fr(x), _fr(a), _fr(b)
    cos_ax = _dot(fx, fa)
    cos_bx = _dot(fx, fb)
    a_sign, b_sign = _sgn(cos_ax), _sgn(cos_bx)
    if a_sign != b_sign:
        return -1 if a_sign > b_sign else 1
    cmp = cos_bx * cos_bx * _dot(fa, fa) - cos_ax * cos_ax * _dot(fb, fb)
    s = a_sign * _sgn(cmp)
    if s != 0:
        return s
    ta, tb = tuple(float(t) for t in a), tuple(float(t) for t in b)
    return 1 if ta < tb else (-1 if ta > tb else 0)


def _unperturbed_sign(x0, x1, p) -> int:
    """sgn((x0 × x1) · p) exactly, 0 when linearly dependent."""
    return _sgn(_dot(_cross(_fr(x0), _fr(x1)), _fr(p)))


def compare_edge_directions(a0, a1, b0, b1) -> int:
    """s2pred::CompareEdgeDirections: +1 / 0 / -1 as the angle between
    edge directions A and B is less than / equal to / greater than 90° —
    the exact sign of (a0 × a1) · (b0 × b1) (doubles are exact
    rationals, so the Fraction product is the exact answer)."""
    return _sgn(_dot(_cross(_fr(a0), _fr(a1)), _cross(_fr(b0), _fr(b1))))


def edge_circumcenter_sign(x0, x1, a, b, c) -> int:
    """Sign(X0, X1, Z) where Z = circumcenter of triangle ABC
    (ExactEdgeCircumcenterSign + symbolic fallback)."""
    from . import predicates as P

    abc_sign = int(P.sign(np.asarray(a)[None], np.asarray(b)[None],
                          np.asarray(c)[None])[0])
    fx0, fx1 = _fr(x0), _fr(x1)
    fa, fb, fc = _fr(a), _fr(b), _fr(c)
    nx = _cross(fx0, fx1)
    if nx == (0, 0, 0):
        result = 0
    else:
        dab = _dot(nx, _cross(fa, fb))
        dbc = _dot(nx, _cross(fb, fc))
        dca = _dot(nx, _cross(fc, fa))
        abc2 = _dot(fa, fa) * dbc * dbc
        bca2 = _dot(fb, fb) * dca * dca
        cab2 = _dot(fc, fc) * dab * dab
        lhs3_sgn, rhs3_sgn = _sgn(dab), -_sgn(dbc)
        lhs2_sgn = max(-1, min(1, lhs3_sgn - rhs3_sgn))
        if lhs2_sgn == 0 and lhs3_sgn != 0:
            lhs2_sgn = _sgn(cab2 - abc2) * lhs3_sgn
        rhs2_sgn = -_sgn(dca)
        result = max(-1, min(1, lhs2_sgn - rhs2_sgn))
        if result == 0 and lhs2_sgn != 0:
            lhs4_sgn = _sgn(dab) * _sgn(dbc)
            rhs4 = bca2 - cab2 - abc2
            result = max(-1, min(1, lhs4_sgn - _sgn(rhs4)))
            if result == 0 and lhs4_sgn != 0:
                result = _sgn(4 * abc2 * cab2 - rhs4 * rhs4) * lhs4_sgn
            result *= lhs2_sgn
        result *= abc_sign
    if result != 0:
        return result
    # symbolic: smallest point lexicographically has the largest pedestal
    ta, tb, tc = (tuple(float(t) for t in v) for v in (a, b, c))
    if ta == tb or tb == tc or tc == ta:
        return 0
    pts = sorted([(ta, a), (tb, b), (tc, c)])
    for _t, p in pts:
        s = _unperturbed_sign(x0, x1, p)
        if s != 0:
            return s
    return 0


def voronoi_site_exclusion(a, b, x0, x1, r_rad: float) -> str:
    """GetVoronoiSiteExclusion (s2predicates.h:314): FIRST if site a's
    clipped Voronoi region misses edge X, SECOND for site b, else
    NEITHER.  REQUIRES compare_distances(x0, a, b) < 0 and both sites
    within r of edge X (up to candidate-filter slack)."""
    # If one site is closer to both endpoints it is closer everywhere on
    # X (symbolic perturbation included) — GetVoronoiSiteExclusion's
    # CompareDistances pre-check.
    if compare_distances(x1, a, b) < 0:
        return SECOND
    r2 = Fraction((2 * math.sin(0.5 * min(math.pi, r_rad))) ** 2)
    fa, fb, fx0, fx1 = _fr(a), _fr(b), _fr(x0), _fr(x1)
    n = _cross(fx0, fx1)
    rhs2 = _dot(_cross(fa, fb), n)
    rhs2_sgn = _sgn(rhs2)
    if rhs2_sgn < 0:
        # d < 0 wraparound (long edge / large radius): keep A iff
        # d(A, X0) < 90°, keep B iff d(B, X1) < 90° (exact: cos sign)
        ca = -_sgn(_dot(fa, fx0))  # <0 ⇔ within 90°
        cb = -_sgn(_dot(fb, fx1))
        if ca < 0 and cb < 0:
            return NEITHER
        return FIRST if ca > 0 else SECOND
    n2 = _dot(n, n)
    a_dn = _dot(fa, n)
    b_dn = _dot(fb, n)
    cos_d = _dot(fa, fb) * n2 - a_dn * b_dn
    if _sgn(cos_d) < 0:
        return NEITHER
    a2 = _dot(fa, fa)
    b2 = _dot(fb, fb)
    n2sin2_r = r2 * (1 - r2 / 4) * n2
    sa2 = b2 * (n2sin2_r * a2 - a_dn * a_dn)
    sb2 = a2 * (n2sin2_r * b2 - b_dn * b_dn)
    lhs2_sgn = _sgn(sb2 - sa2)
    if lhs2_sgn == 0:
        # d == 0 was handled by the CompareDistances pre-check
        return NEITHER
    cos_r = 1 - r2 / 2
    cos2_r = cos_r * cos_r
    lhs3 = cos2_r * (sa2 + sb2) - rhs2 * rhs2
    if _sgn(lhs3) < 0:
        return NEITHER
    lhs4 = lhs3 * lhs3
    rhs4 = 4 * cos2_r * cos2_r * sa2 * sb2
    result = _sgn(lhs4 - rhs4)
    if result < 0:
        return NEITHER
    if result == 0:
        # shared interval endpoint exactly at distance r: symbolic —
        # A is closer to the equidistant point iff A > B
        ta, tb = tuple(float(t) for t in a), tuple(float(t) for t in b)
        if (lhs2_sgn > 0) == (ta > tb):
            return NEITHER
    return FIRST if lhs2_sgn > 0 else SECOND


def compare_edge_distance(x, a0, a1, r_rad: float) -> int:
    """s2pred::CompareEdgeDistance, exact tier (s2predicates.cc:674-756:
    TriageCompareEdgeDistance structure with ExactCompareLineDistance /
    endpoint CompareDistance bodies in rationals): sign of
    d(x, edge a0a1) − r.

    Used as snap_edge_chain's candidate ADMISSION gate (the reference
    gates with exact CompareEdgeDistance, s2builder.cc:1190): a site
    admitted only through double-precision slack would reach
    voronoi_site_exclusion with negative sa2/sb2, where FIRST/SECOND is
    arbitrary — exactly the sub-1e-12 regime these predicates exist for."""
    fx, f0, f1 = _fr(x), _fr(a0), _fr(a1)
    r2 = Fraction((2 * math.sin(0.5 * min(math.pi, r_rad))) ** 2)
    return _compare_edge_distance_r2(fx, f0, f1, r2)


def compare_edge_distance_chord2(x, a0, a1, length2: float) -> int:
    """compare_edge_distance with the threshold given directly as a
    squared chord length (exact — no radians round trip), the form the
    S1ChordAngle-based reference predicate takes."""
    return _compare_edge_distance_r2(
        _fr(x), _fr(a0), _fr(a1), Fraction(max(0.0, min(4.0, length2)))
    )


def _compare_edge_distance_r2(fx, f0, f1, r2: Fraction) -> int:
    # interior test — CompareEdgeDirections(a0,a1, a0,x) > 0 and
    # (a0,a1, x,a1) > 0 (ExactCompareEdgeDistance; the antipodal guard
    # falls through to the endpoint branch, same as the reference)
    n = _cross(f0, f1)
    antip0 = all(t0 == -tx for t0, tx in zip(f0, fx))
    antip1 = all(t1 == -tx for t1, tx in zip(f1, fx))
    if not antip0 and not antip1:
        int0 = _sgn(_dot(n, _cross(f0, fx)))
        int1 = _sgn(_dot(n, _cross(fx, f1)))
        if int0 > 0 and int1 > 0:
            # closest point is in the edge interior: compare the
            # great-circle distance (ExactCompareLineDistance)
            if r2 >= 2:
                return -1
            sin_d = _dot(fx, n)
            sin2_r = r2 * (1 - r2 / 4)
            cmp = sin_d * sin_d - sin2_r * _dot(fx, fx) * _dot(n, n)
            return _sgn(cmp)
    # closest point is an endpoint: chord² against r² (the same metric
    # the double-precision candidate filter uses)

    def endpoint(fp):
        d = tuple(a - b for a, b in zip(fx, fp))
        return _sgn(_dot(d, d) - r2)

    return min(endpoint(f0), endpoint(f1))


def compare_point_distance_chord2(x, y, length2: float) -> int:
    """s2pred::CompareDistance with the threshold as a squared chord
    (exact): sign of angle(x, y) − r, points treated as directions
    (inputs need not be exactly unit length — the comparison uses
    sin²θ·|x|²|y|² = |x×y|² like ExactCompareDistance)."""
    fx, fy = _fr(x), _fr(y)
    r2 = Fraction(max(0.0, min(4.0, length2)))
    cos_xy = _dot(fx, fy)
    # sin²(r) = r2·(1 − r2/4); r < 90° iff r2 < 2
    sin2_r = r2 * (1 - r2 / 4)
    n = _cross(fx, fy)
    sin2_xy = _dot(n, n)  # |x×y|² = sin²θ·|x|²|y|²
    norm2 = _dot(fx, fx) * _dot(fy, fy)
    if r2 < 2:
        if cos_xy <= 0:
            return 1  # θ ≥ 90° > r
        return _sgn(sin2_xy - sin2_r * norm2)
    if cos_xy >= 0:
        return -1  # θ ≤ 90° ≤ r
    return -_sgn(sin2_xy - sin2_r * norm2)
