"""Convex hull on the sphere (s2convex_hull_query.h/.cc).

Full port of S2ConvexHullQuery: Andrew's monotone chain run in CCW
order around an origin chosen OUTSIDE the hull (the Ortho of the cap
bound's center), which is what makes the algorithm correct for any
input that fits in a convex cap — no gnomonic/hemisphere restriction.

Results mirror the reference exactly:
  - no points → "empty"; one point → 3-vertex degenerate loop; two
    points → (a, b, midpoint) loop; antipodal pair or non-convex cap
    bound → "full" (s2convex_hull_query.cc:117-146, 180-221)
  - the rect bound is accumulated with the edge-aware
    LatLngRectBounder (kernel/bounder.py), matching
    S2Loop/S2Polyline::GetRectBound semantics.

The Spark-facing per-group operator is operators/hull.convex_hulls.
"""

from __future__ import annotations

import functools
import math

import numpy as np

from .bounder import LatLngRectBounder, _latlng_of
from .predicates import ortho, sign
from .region import LatLngRect

EMPTY = "empty"
FULL = "full"
DBL_ERR = 0.5 * 2.220446049250313e-16


class ConvexHullQuery:
    """Port of S2ConvexHullQuery (s2convex_hull_query.cc:48-240)."""

    def __init__(self) -> None:
        self._bound = LatLngRect.empty()
        self._points: list[np.ndarray] = []

    def add_point(self, p: np.ndarray) -> None:
        p = np.asarray(p, float).reshape(3)
        ll = _latlng_of(p)
        if self._bound.is_empty():
            self._bound = LatLngRect.from_point_pair(ll, ll)
        else:
            self._bound = self._bound.union(LatLngRect.from_point_pair(ll, ll))
        self._points.append(p)

    def add_polyline(self, vertices: np.ndarray) -> None:
        v = np.asarray(vertices, float).reshape(-1, 3)
        b = LatLngRectBounder()
        for p in v:
            b.add_point(p)
        self._bound = self._bound.union(b.get_bound())
        self._points.extend(v)

    def add_loop(self, vertices: np.ndarray) -> None:
        """Closed loop: the bound is S2Loop::GetRectBound semantics
        (s2loop.cc InitBound) — edge-aware bounder over the closed
        chain, extended to the pole(s) the loop interior contains."""
        from .contains import Loop
        from .intervals import R1Interval, S1Interval

        v = np.asarray(vertices, float).reshape(-1, 3)
        if len(v) == 0:
            return
        b = LatLngRectBounder()
        for p in v:
            b.add_point(p)
        b.add_point(v[0])
        rect = b.get_bound()
        loop = Loop(v)
        if bool(loop.contains(np.array([[0.0, 0.0, 1.0]]))[0]):
            rect = LatLngRect(
                R1Interval(rect.lat.lo, 0.5 * math.pi), S1Interval.full()
            )
        if rect.lng.is_full() and bool(
            loop.contains(np.array([[0.0, 0.0, -1.0]]))[0]
        ):
            rect = LatLngRect(
                R1Interval(-0.5 * math.pi, rect.lat.hi), rect.lng
            )
        self._bound = self._bound.union(rect)
        self._points.extend(v)

    def get_cap_bound(self):
        return self._bound.get_cap_bound()

    def get_convex_hull(self):
        """Returns "empty", "full", or an (N,3) CCW loop array
        (s2convex_hull_query.cc:117-170)."""
        cap = self.get_cap_bound()
        if cap.height() >= 1 - 10 * DBL_ERR:
            return FULL
        origin = ortho(np.asarray(cap.center, float))

        def cmp(x, y):
            s = int(sign(origin[None], x[None], y[None])[0])
            return -s  # sign > 0 → x before y

        pts = sorted(self._points, key=functools.cmp_to_key(cmp))
        # remove adjacent duplicates (std::unique semantics)
        dedup: list[np.ndarray] = []
        for p in pts:
            if not dedup or not np.array_equal(dedup[-1], p):
                dedup.append(p)
        if not dedup:
            return EMPTY
        if len(dedup) == 1:
            return _single_point_loop(dedup[0])
        if len(dedup) == 2:
            return _single_edge_loop(dedup[0], dedup[1])

        lower = _monotone_chain(dedup)
        upper = _monotone_chain(dedup[::-1])
        assert np.array_equal(lower[0], upper[-1])
        assert np.array_equal(lower[-1], upper[0])
        return np.asarray(lower[:-1] + upper[:-1]).reshape(-1, 3)


def _monotone_chain(points: list[np.ndarray]) -> list[np.ndarray]:
    """Maximal subset making only left (CCW) turns
    (s2convex_hull_query.cc:172-183)."""
    out: list[np.ndarray] = []
    for p in points:
        while len(out) >= 2 and int(sign(out[-2][None], out[-1][None], p[None])[0]) <= 0:
            out.pop()
        out.append(p)
    return out


def _single_point_loop(p: np.ndarray) -> np.ndarray:
    """3-vertex degenerate loop around one point
    (s2convex_hull_query.cc:185-197)."""
    k_offset = 1e-15
    d0 = ortho(p)
    d1 = np.cross(p, d0)
    v1 = p + k_offset * d0
    v2 = p + k_offset * d1
    return np.asarray(
        [p, v1 / np.linalg.norm(v1), v2 / np.linalg.norm(v2)]
    ).reshape(-1, 3)


def _single_edge_loop(a: np.ndarray, b: np.ndarray):
    """(a, b, midpoint) loop, normalized to enclose at most half the
    sphere; antipodal pair → full (s2convex_hull_query.cc:199-221)."""
    if np.array_equal(a, -b):
        return FULL
    from .measures import polyline_interpolate

    mid = polyline_interpolate(np.asarray([a, b]), 0.5)
    loop = np.asarray([a, b, mid]).reshape(-1, 3)
    # S2Loop::Normalize: invert when the loop encloses more than half
    # the sphere.  This sliver loop is degenerate (zero area), so both
    # orientations are equivalent up to sign noise; keep the input
    # orientation unless the signed area is clearly negative.
    from .measures import loop_signed_area

    with np.errstate(invalid="ignore", divide="ignore"):
        area = loop_signed_area(loop)
    if np.isfinite(area) and area < -1e-30:
        loop = loop[::-1].copy()
    return loop


def convex_hull_of_points(points: np.ndarray):
    """Convenience wrapper: hull of an (N,3) point array."""
    q = ConvexHullQuery()
    for p in np.asarray(points, float).reshape(-1, 3):
        q.add_point(p)
    return q.get_convex_hull()
