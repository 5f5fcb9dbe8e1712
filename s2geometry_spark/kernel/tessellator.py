"""S2EdgeTessellator + S2::Projection (s2edge_tessellator.cc,
s2projections.cc): convert between geodesic edges and projected
(planar) edges so that the maximum deviation stays within a tolerance.

The tessellator uses the reference's fixed-fraction error estimate:
sample the curve at t and 1−t with t = kInterpolationFraction, measure
the distance between the geodesic and projected interpolants there, and
compare against the tolerance scaled by kScaleFactor
(s2edge_tessellator.cc:40-182 derivation).
"""

from __future__ import annotations

import math

import numpy as np

# kInterpolationFraction / kScaleFactor (s2edge_tessellator.cc:179-182)
INTERPOLATION_FRACTION = 0.31215691082248312
SCALE_FACTOR = 0.83829992569888509
MIN_TOLERANCE_RAD = 1e-13  # kMinTolerance (cc:184-188)


def _slerp(a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
    """S2::Interpolate(a, b, t) semantics."""
    omega = math.atan2(float(np.linalg.norm(np.cross(a, b))), float(a @ b))
    if omega == 0:
        return a.copy()
    sa = math.sin((1 - t) * omega) / math.sin(omega)
    sb = math.sin(t * omega) / math.sin(omega)
    out = sa * a + sb * b
    return out / np.linalg.norm(out)


def _chord2(x: np.ndarray, y: np.ndarray) -> float:
    d = x - y
    return min(float(d @ d), 4.0)


class Projection:
    """S2::Projection (s2projections.h): maps S2Points to/from R²."""

    def project(self, p: np.ndarray) -> tuple[float, float]:
        raise NotImplementedError

    def unproject(self, xy: tuple[float, float]) -> np.ndarray:
        raise NotImplementedError

    def wrap_distance(self) -> tuple[float, float]:
        raise NotImplementedError

    @staticmethod
    def interpolate(f: float, a, b) -> tuple[float, float]:
        """Linear interpolation in projected space (cc:48-51)."""
        return ((1 - f) * a[0] + f * b[0], (1 - f) * a[1] + f * b[1])

    def wrap_destination(self, a, b) -> tuple[float, float]:
        """WrapDestination (s2projections.cc:31-44): translate b by
        multiples of the wrap distance so the edge (a, b) is short."""
        wx, wy = self.wrap_distance()
        x, y = b
        if wx > 0 and abs(x - a[0]) > 0.5 * wx:
            x -= round((x - a[0]) / wx) * wx
        if wy > 0 and abs(y - a[1]) > 0.5 * wy:
            y -= round((y - a[1]) / wy) * wy
        return (x, y)


def _latlng_to_point(lat: float, lng: float) -> np.ndarray:
    return np.array(
        [
            math.cos(lat) * math.cos(lng),
            math.cos(lat) * math.sin(lng),
            math.sin(lat),
        ]
    )


def _point_to_latlng(p: np.ndarray) -> tuple[float, float]:
    lat = math.atan2(p[2], math.hypot(p[0], p[1]))
    lng = math.atan2(p[1], p[0])
    return lat, lng


class PlateCarreeProjection(Projection):
    """s2projections.cc:53-79: x ∈ [-x_scale, x_scale] ↔ lng ±180°."""

    def __init__(self, x_scale: float = math.pi):
        self._x_wrap = 2 * x_scale
        self._to_radians = math.pi / x_scale
        self._from_radians = x_scale / math.pi

    def project(self, p):
        lat, lng = _point_to_latlng(np.asarray(p, float))
        return (self._from_radians * lng, self._from_radians * lat)

    def unproject(self, xy):
        lat = self._to_radians * xy[1]
        lng = self._to_radians * math.remainder(xy[0], self._x_wrap)
        return _latlng_to_point(lat, lng)

    def wrap_distance(self):
        return (self._x_wrap, 0.0)


class MercatorProjection(Projection):
    """s2projections.cc:81-113 (asinh-form y, exact at the poles)."""

    def __init__(self, max_x: float = math.pi):
        self._x_wrap = 2 * max_x
        self._to_radians = math.pi / max_x
        self._from_radians = max_x / math.pi

    def project(self, p):
        lat, lng = _point_to_latlng(np.asarray(p, float))
        sin_phi = math.sin(lat)
        y = 0.5 * math.log((1 + sin_phi) / (1 - sin_phi)) if abs(sin_phi) < 1 else math.copysign(math.inf, sin_phi)
        return (self._from_radians * lng, self._from_radians * y)

    def unproject(self, xy):
        x = self._to_radians * math.remainder(xy[0], self._x_wrap)
        try:
            k = math.exp(2 * self._to_radians * xy[1])
        except OverflowError:
            k = math.inf
        lat = math.pi / 2 if math.isinf(k) else math.asin((k - 1) / (k + 1))
        return _latlng_to_point(lat, x)

    def wrap_distance(self):
        return (self._x_wrap, 0.0)


class EdgeTessellator:
    """S2EdgeTessellator (s2edge_tessellator.cc:190-284)."""

    def __init__(self, projection: Projection, tolerance_rad: float):
        if tolerance_rad < MIN_TOLERANCE_RAD:
            raise ValueError("Tolerance too small")
        self._proj = projection
        t = SCALE_FACTOR * max(tolerance_rad, MIN_TOLERANCE_RAD)
        s = 2 * math.sin(0.5 * min(math.pi, t))
        self._scaled_tolerance2 = s * s

    def _estimate_max_error2(self, pa, a, pb, b) -> float:
        """EstimateMaxError (cc:201-217), squared chord."""
        if float(a @ b) < -1e-14:
            return math.inf
        t1 = INTERPOLATION_FRACTION
        t2 = 1 - INTERPOLATION_FRACTION
        mid1 = _slerp(a, b, t1)
        mid2 = _slerp(a, b, t2)
        pmid1 = self._proj.unproject(Projection.interpolate(t1, pa, pb))
        pmid2 = self._proj.unproject(Projection.interpolate(t2, pa, pb))
        return max(_chord2(mid1, pmid1), _chord2(mid2, pmid2))

    # --------------------------------------------------- projected
    def append_projected(self, a, b, vertices: list) -> None:
        """AppendProjected (cc:219-249): tessellate geodesic AB into
        projected vertices, wrapping across the projection seam."""
        a = np.asarray(a, float)
        b = np.asarray(b, float)
        pa = self._proj.project(a)
        if not vertices:
            vertices.append(pa)
        else:
            pa = self._proj.wrap_destination(vertices[-1], pa)
            assert vertices[-1] == pa, "Appended edges must form a chain"
        pb = self._proj.project(b)
        self._append_projected(pa, a, pb, b, vertices)

    def _append_projected(self, pa, a, pb_in, b, vertices: list) -> None:
        pb = self._proj.wrap_destination(pa, pb_in)
        if self._estimate_max_error2(pa, a, pb, b) <= self._scaled_tolerance2:
            vertices.append(pb)
        else:
            mid = a + b
            mid = mid / np.linalg.norm(mid)
            pmid = self._proj.wrap_destination(pa, self._proj.project(mid))
            self._append_projected(pa, a, pmid, mid, vertices)
            self._append_projected(pmid, mid, pb, b, vertices)

    # ------------------------------------------------- unprojected
    def append_unprojected(self, pa, pb, vertices: list) -> None:
        """AppendUnprojected (cc:251-284): tessellate the projected
        edge (pa, pb) into geodesic vertices."""
        a = self._proj.unproject(pa)
        b = self._proj.unproject(pb)
        if not vertices:
            vertices.append(a)
        self._append_unprojected(pa, a, pb, b, vertices)

    def _append_unprojected(self, pa, a, pb_in, b, vertices: list) -> None:
        pb = self._proj.wrap_destination(pa, pb_in)
        if self._estimate_max_error2(pa, a, pb, b) <= self._scaled_tolerance2:
            vertices.append(b)
        else:
            pmid = Projection.interpolate(0.5, pa, pb)
            mid = self._proj.unproject(pmid)
            self._append_unprojected(pa, a, pmid, mid, vertices)
            self._append_unprojected(pmid, mid, pb, b, vertices)
