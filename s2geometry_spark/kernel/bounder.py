"""Edge-aware lat/lng bounding rectangles (s2latlng_rect_bounder.cc).

S2LatLngRectBounder computes a tight rect containing every point of an
edge CHAIN (not just its vertices): edges whose great circle attains an
interior latitude extremum widen the lat interval by the exact
max-latitude of the circle (atan2 of the normal), with the reference's
full floating-point error budget (normal-degeneracy fallback at
1.91346e-15, m-projection error 6.06638e-16·‖n‖, latitude budget trick
for short edges, and the final 2·DBL_EPSILON GetBound expansion).

Used by the convex-hull query (kernel/hull.py) and anywhere a loop /
polyline needs a conservative S2LatLngRect.
"""

from __future__ import annotations

import math

import numpy as np

from .intervals import R1Interval, S1Interval
from .region import LatLng, LatLngRect

DBL_EPSILON = 2.220446049250313e-16


def _latlng_of(p: np.ndarray) -> LatLng:
    return LatLng(
        math.atan2(p[2], math.hypot(p[0], p[1])), math.atan2(p[1], p[0])
    )


class LatLngRectBounder:
    """Port of S2LatLngRectBounder (s2latlng_rect_bounder.cc:37-210)."""

    def __init__(self) -> None:
        self._a: np.ndarray | None = None
        self._a_latlng: LatLng | None = None
        self._bound = LatLngRect.empty()

    def add_point(self, b: np.ndarray) -> None:
        b = np.asarray(b, float).reshape(3)
        self._add_internal(b, _latlng_of(b))

    def _add_internal(self, b: np.ndarray, b_latlng: LatLng) -> None:
        if self._bound.is_empty():
            # first vertex: just add the point
            self._bound = LatLngRect(
                R1Interval(b_latlng.lat, b_latlng.lat),
                S1Interval.from_point(b_latlng.lng),
            )
        else:
            a = self._a
            a_ll = self._a_latlng
            # robust normal N = (A-B) x (A+B) = 2 (A x B); zero when
            # proportional (we want zero there, unlike RobustCrossProd)
            n = np.cross(a - b, a + b)
            n_norm = float(np.linalg.norm(n))
            if n_norm < 1.91346e-15:
                # nearly identical or nearly antipodal
                if float(a @ b) < 0:
                    self._bound = LatLngRect.full()
                else:
                    self._bound = self._bound.union(
                        LatLngRect.from_point_pair(a_ll, b_latlng)
                    )
            else:
                lng_ab = S1Interval.from_point_pair(a_ll.lng, b_latlng.lng)
                if lng_ab.get_length() >= math.pi - 2 * DBL_EPSILON:
                    # nearly opposite lines of longitude: either side of
                    # the pole is possible
                    lng_ab = S1Interval.full()
                lat_ab = R1Interval.from_point_pair(a_ll.lat, b_latlng.lat)

                # does AB cross the plane through N and the Z-axis?
                m = np.cross(n, np.array([0.0, 0.0, 1.0]))
                m_a = float(m @ a)
                m_b = float(m @ b)
                m_error = 6.06638e-16 * n_norm + 6.83174e-31
                if (
                    m_a * m_b < 0
                    or abs(m_a) <= m_error
                    or abs(m_b) <= m_error
                ):
                    # interior latitude extremum possible
                    max_lat = min(
                        math.atan2(
                            math.hypot(n[0], n[1]), abs(n[2])
                        )
                        + 3 * DBL_EPSILON,
                        0.5 * math.pi,
                    )
                    # latitude-change budget for short edges
                    lat_budget_z = (
                        0.5 * float(np.linalg.norm(a - b)) * math.sin(max_lat)
                    )
                    lat_budget = 2 * math.asin(
                        min((1 + 4 * DBL_EPSILON) * lat_budget_z, 1.0)
                    )
                    max_delta = (
                        0.5 * (lat_budget - lat_ab.get_length()) + DBL_EPSILON
                    )
                    if m_a <= m_error and m_b >= -m_error:
                        lat_ab.hi = min(max_lat, lat_ab.hi + max_delta)
                    if m_b <= m_error and m_a >= -m_error:
                        lat_ab.lo = max(-max_lat, lat_ab.lo - max_delta)
                self._bound = self._bound.union(LatLngRect(lat_ab, lng_ab))
        self._a = b
        self._a_latlng = b_latlng

    def get_bound(self) -> LatLngRect:
        """s2latlng_rect_bounder.cc:187-210: expand by 2*DBL_EPSILON in
        latitude (rounding of computed S2LatLngs); longitude needs no
        expansion (atan2 is correctly rounded)."""
        return self._bound.expanded_radians(2 * DBL_EPSILON, 0.0).polar_closure()


def rect_bound_of_chain(vertices: np.ndarray, closed: bool = False) -> LatLngRect:
    """Tight rect bound of a vertex chain (loop if closed=True) — the
    S2Loop::GetRectBound / S2Polyline::GetRectBound building block."""
    v = np.asarray(vertices, float).reshape(-1, 3)
    b = LatLngRectBounder()
    for p in v:
        b.add_point(p)
    if closed and len(v) > 1:
        b.add_point(v[0])
    return b.get_bound()


def expand_for_subregions(bound: LatLngRect) -> LatLngRect:
    """S2LatLngRectBounder::ExpandForSubregions
    (s2latlng_rect_bounder.cc:214-345): expand a bound computed for a
    region so that it contains the bounds of any SUBREGION — returning
    Full when the bound contains nearly-antipodal points (within
    4.309·eps), since a subregion edge between such points bounds to
    Full."""
    import math

    if bound.is_empty():
        return bound
    eps = 2.220446049250313e-16
    lng_gap = max(0.0, math.pi - bound.lng.get_length() - 2.5 * eps)
    min_abs_lat = max(bound.lat.lo, -bound.lat.hi)
    lat_gap1 = math.pi / 2 + bound.lat.lo
    lat_gap2 = math.pi / 2 - bound.lat.hi
    if min_abs_lat >= 0:
        if 2 * min_abs_lat + lng_gap < 1.354e-15:
            return LatLngRect.full()
    elif lng_gap >= math.pi / 2:
        if lat_gap1 + lat_gap2 < 1.687e-15:
            return LatLngRect.full()
    else:
        if max(lat_gap1, lat_gap2) * lng_gap < 1.765e-15:
            return LatLngRect.full()
    lat_expansion = 9 * eps
    lng_expansion = math.pi if lng_gap <= 0 else 0.0
    return bound.expanded_radians(
        lat_expansion, lng_expansion).polar_closure()
