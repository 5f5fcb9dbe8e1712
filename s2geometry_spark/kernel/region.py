"""Driver-side S2Region implementations for the coverer.

Each region implements the S2Region interface (s2region.h:39-98):
  contains_cell(cell), may_intersect_cell(cell), contains_point(p),
  get_cap_bound(), get_cell_union_bound().

Regions: Cap (s2cap.cc), LatLngRect (s2latlng_rect.cc), ShapeRegion
(points/polylines/polygons with S2ShapeIndexRegion-equivalent semantics,
s2shape_index_region.h), CellUnionRegion (s2cell_union.cc).
"""

from __future__ import annotations

import math

import numpy as np

from . import metrics
from .cell import Cell, DBL_EPSILON
from .cid import CID, MAX_LEVEL
from .clipping import (
    FACE_CLIP_ERROR_UV_COORD,
    INTERSECTS_RECT_ERROR_UV_DIST,
    clip_to_padded_face,
    intersects_rect,
    robust_cross_prod,
)
from .contains import Loop, Polygon
from .coords import latlng_to_xyz
from .intervals import PI, R1Interval, S1Interval
from .predicates import crossing_sign

__all__ = ["Cap", "LatLngRect", "ShapeRegion", "CellUnionRegion", "LatLng"]


def _ll_to_point(lat_rad: float, lng_rad: float) -> np.ndarray:
    x, y, z = latlng_to_xyz(math.degrees(lat_rad), math.degrees(lng_rad))
    return np.array([float(x), float(y), float(z)])


def _latitude(p) -> float:
    return math.atan2(p[2] + 0.0, math.sqrt(p[0] * p[0] + p[1] * p[1]))


def _longitude(p) -> float:
    return math.atan2(p[1] + 0.0, p[0] + 0.0)


def _chord_angle2(x, y) -> float:
    """S1ChordAngle(x, y): min(4, |x-y|²)."""
    d = np.asarray(x) - np.asarray(y)
    return min(4.0, float(d @ d))


def _chord2_add(a2: float, b2: float) -> float:
    """S1ChordAngle operator+ (s1chord_angle.cc): squared chord of the
    angle sum, clamped to Straight."""
    if b2 == 0:
        return a2
    if a2 + b2 >= 4.0:
        return 4.0
    x = a2 * (1 - 0.25 * b2)
    y = b2 * (1 - 0.25 * a2)
    return min(4.0, x + y + 2 * math.sqrt(x * y))


def _vertex_neighbors(p: np.ndarray, level: int) -> list[CID]:
    from . import cellid as K

    leaf = K.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )
    return [CID(int(v)) for v in K.vertex_neighbors(leaf, level)[0]]


class Cap:
    """S2Cap: center point + radius as squared chord length (s2cap.h)."""

    def __init__(self, center: np.ndarray, length2: float):
        self.center = np.asarray(center, dtype=np.float64)
        self.length2 = length2  # < 0 empty; 4 full

    # ---- constructors
    @staticmethod
    def from_point(p) -> "Cap":
        return Cap(p, 0.0)

    @staticmethod
    def from_center_angle(center, radians: float) -> "Cap":
        if radians < 0:
            return Cap(center, -1.0)
        length = 2 * math.sin(0.5 * min(math.pi, radians))
        return Cap(center, length * length)

    @staticmethod
    def from_center_height(center, height: float) -> "Cap":
        """FromCenterHeight: length2 = 2·height, clamped at 4 like
        S1ChordAngle::FromLength2 (s2cap.h:118-124)."""
        return Cap(center, min(4.0, 2.0 * height))

    @staticmethod
    def empty() -> "Cap":
        return Cap(np.array([1.0, 0, 0]), -1.0)

    @staticmethod
    def full() -> "Cap":
        return Cap(np.array([1.0, 0, 0]), 4.0)

    def is_empty(self) -> bool:
        return self.length2 < 0

    def is_full(self) -> bool:
        return self.length2 == 4.0

    def height(self) -> float:
        return 0.5 * self.length2

    def radius_radians(self) -> float:
        if self.is_empty():
            return -1.0
        return 2 * math.asin(0.5 * math.sqrt(min(self.length2, 4.0)))

    def complement(self) -> "Cap":
        if self.is_full():
            return Cap.empty()
        if self.is_empty():
            return Cap.full()
        return Cap(-self.center, 4.0 - self.length2)

    def add_point(self, p) -> None:
        if self.is_empty():
            self.center = np.asarray(p, dtype=np.float64)
            self.length2 = 0.0
        else:
            self.length2 = max(self.length2, _chord_angle2(self.center, p))

    def add_cap(self, other: "Cap") -> None:
        """AddCap (s2cap.cc:103-113): grow to contain `other`, rounding
        the summed chord angle up so containment is guaranteed."""
        from .distance import chord2_add

        if self.is_empty():
            self.center = other.center.copy()
            self.length2 = other.length2
        elif not other.is_empty():
            d2 = chord2_add(
                _chord_angle2(self.center, other.center),
                max(other.length2, 0.0),
            )
            eps = 2.220446049250313e-16
            d2 = min(4.0, d2 + (2 * eps + 2.02 * eps) * d2)
            self.length2 = max(self.length2, d2)

    # ---- cap-vs-cap algebra (s2cap.cc:48-146)
    def get_area(self) -> float:
        """S2Cap::GetArea (s2cap.cc:48-50)."""
        return 2 * PI * max(0.0, self.height())

    def get_centroid(self) -> np.ndarray:
        """S2Cap::GetCentroid (s2cap.cc:52-63): radial midpoint of the
        spanned distances times the cap area."""
        if self.is_empty():
            return np.zeros(3)
        r = 1.0 - 0.5 * self.height()
        return r * self.get_area() * self.center

    def contains_cap(self, other: "Cap") -> bool:
        """S2Cap::Contains(S2Cap) (s2cap.cc:73-76)."""
        if self.is_full() or other.is_empty():
            return True
        return self.length2 >= _chord2_add(
            _chord_angle2(self.center, other.center), max(other.length2, 0.0)
        )

    def intersects_cap(self, other: "Cap") -> bool:
        """S2Cap::Intersects(S2Cap) (s2cap.cc:78-81)."""
        if self.is_empty() or other.is_empty():
            return False
        return (
            _chord2_add(max(self.length2, 0.0), max(other.length2, 0.0))
            >= _chord_angle2(self.center, other.center)
        )

    def interior_intersects_cap(self, other: "Cap") -> bool:
        """S2Cap::InteriorIntersects (s2cap.cc:83-87)."""
        if self.length2 <= 0 or other.is_empty():
            return False
        return (
            _chord2_add(max(self.length2, 0.0), max(other.length2, 0.0))
            > _chord_angle2(self.center, other.center)
        )

    def expanded(self, radians: float) -> "Cap":
        """S2Cap::Expanded (s2cap.cc:115-119)."""
        assert radians >= 0
        if self.is_empty():
            return Cap.empty()
        s = 2 * math.sin(0.5 * min(math.pi, radians))
        return Cap(self.center, _chord2_add(self.length2, s * s))

    def union(self, other: "Cap") -> "Cap":
        """S2Cap::Union (s2cap.cc:121-145)."""
        if self.length2 < other.length2:
            return other.union(self)
        if self.is_full() or other.is_empty():
            return Cap(self.center, self.length2)
        this_radius = self.radius_radians()
        other_radius = other.radius_radians()
        distance = math.atan2(
            float(np.linalg.norm(np.cross(self.center, other.center))),
            float(self.center @ other.center),
        )
        if this_radius >= distance + other_radius:
            return Cap(self.center, self.length2)
        result_radius = 0.5 * (distance + this_radius + other_radius)
        # GetPointOnLine towards the other center
        d = other.center - (other.center @ self.center) * self.center
        nd = float(np.linalg.norm(d))
        if nd == 0:
            result_center = self.center
        else:
            ang = 0.5 * (distance - this_radius + other_radius)
            result_center = (
                math.cos(ang) * self.center + math.sin(ang) * (d / nd)
            )
        return Cap.from_center_angle(result_center, result_radius)

    def approx_equals(self, other: "Cap", max_error_rad: float = 1e-14) -> bool:
        """S2Cap::ApproxEquals (s2cap.cc:312-322)."""
        r2 = max_error_rad * max_error_rad
        return (
            _chord_angle2(self.center, other.center) <= r2
            and abs(self.length2 - other.length2) <= r2
        ) or (
            (self.is_empty() and other.length2 <= r2)
            or (other.is_empty() and self.length2 <= r2)
            or (self.is_full() and other.length2 >= 2 * (2 - r2))
            or (other.is_full() and self.length2 >= 2 * (2 - r2))
        )

    # ---- region interface
    def contains_point(self, p) -> bool:
        return _chord_angle2(self.center, p) <= self.length2

    def interior_contains_point(self, p) -> bool:
        """S2Cap::InteriorContains (s2cap.cc:301-304)."""
        return self.is_full() or _chord_angle2(self.center, p) < self.length2

    def _intersects(self, cell: Cell, vertices) -> bool:
        """S2Cap::Intersects (s2cap.cc:225-268): cell interior vs cap."""
        if self.length2 >= 2.0:  # >= Right
            return False
        if self.is_empty():
            return False
        if cell.contains_point(self.center):
            return True
        sin2_angle = self.length2 * (1 - 0.25 * self.length2)  # sin²(radius)
        for k in range(4):
            edge = cell.get_edge_raw(k)
            dot = float(self.center @ edge)
            if dot > 0:
                continue
            if dot * dot > sin2_angle * float(edge @ edge):
                return False
            direction = np.cross(edge, self.center)
            if float(direction @ vertices[k]) < 0 and float(
                direction @ vertices[(k + 1) & 3]
            ) > 0:
                return True
        return False

    def contains_cell(self, cell: Cell) -> bool:
        vertices = [cell.get_vertex(k) for k in range(4)]
        for v in vertices:
            if not self.contains_point(v):
                return False
        return not self.complement()._intersects(cell, vertices)

    def may_intersect_cell(self, cell: Cell) -> bool:
        vertices = [cell.get_vertex(k) for k in range(4)]
        for v in vertices:
            if self.contains_point(v):
                return True
        return self._intersects(cell, vertices)

    def get_cap_bound(self) -> "Cap":
        return self

    def get_cell_union_bound(self) -> list[CID]:
        """s2cap.cc:202-223: ≤4 vertex neighbors, or 6 faces for big caps."""
        level = metrics.MIN_WIDTH.get_level_for_min_value(self.radius_radians()) - 1
        if level < 0:
            return [CID.from_face(f) for f in range(6)]
        return _vertex_neighbors(self.center, level)


class LatLng:
    __slots__ = ("lat", "lng")

    def __init__(self, lat_rad: float, lng_rad: float):
        self.lat = lat_rad
        self.lng = lng_rad

    @staticmethod
    def from_degrees(lat: float, lng: float) -> "LatLng":
        return LatLng(math.radians(lat), math.radians(lng))

    def is_valid(self) -> bool:
        return abs(self.lat) <= PI / 2 and abs(self.lng) <= PI

    @staticmethod
    def invalid() -> "LatLng":
        """S2LatLng::Invalid (s2latlng.h): outside every valid range."""
        return LatLng(PI, 2 * PI)

    def normalized(self) -> "LatLng":
        """S2LatLng::Normalized (s2latlng.cc:56-65): clamp lat, wrap lng;
        non-finite coordinates PRESERVE invalidity (s2latlng_test.cc
        InfIsInvalid/NanIsInvalid)."""
        if not (math.isfinite(self.lat) and math.isfinite(self.lng)):
            return LatLng.invalid()
        return LatLng(
            max(-PI / 2, min(PI / 2, self.lat)),
            math.remainder(self.lng, 2 * PI),
        )

    def get_distance(self, o: "LatLng") -> float:
        """S2LatLng::GetDistance (s2latlng.cc): haversine, radians."""
        lat1, lat2 = self.lat, o.lat
        lng1, lng2 = self.lng, o.lng
        dlat = math.sin(0.5 * (lat2 - lat1))
        dlng = math.sin(0.5 * (lng2 - lng1))
        x = dlat * dlat + dlng * dlng * math.cos(lat1) * math.cos(lat2)
        return 2 * math.asin(math.sqrt(min(1.0, x)))

    def approx_equals(self, o: "LatLng", max_error: float = 1e-15) -> bool:
        return (abs(self.lat - o.lat) <= max_error
                and abs(self.lng - o.lng) <= max_error)

    def to_point(self) -> np.ndarray:
        return _ll_to_point(self.lat, self.lng)


class LatLngRect:
    """S2LatLngRect (s2latlng_rect.h/.cc) with S1Interval lng wraparound."""

    def __init__(self, lat: R1Interval, lng: S1Interval):
        self.lat = lat
        self.lng = lng

    @staticmethod
    def from_degrees(lat_lo, lng_lo, lat_hi, lng_hi) -> "LatLngRect":
        return LatLngRect(
            R1Interval(math.radians(lat_lo), math.radians(lat_hi)),
            S1Interval(math.radians(lng_lo), math.radians(lng_hi)),
        )

    @staticmethod
    def from_point_pair(a: LatLng, b: LatLng) -> "LatLngRect":
        return LatLngRect(
            R1Interval.from_point_pair(a.lat, b.lat),
            S1Interval.from_point_pair(a.lng, b.lng),
        )

    @staticmethod
    def empty() -> "LatLngRect":
        return LatLngRect(R1Interval.empty(), S1Interval.empty())

    @staticmethod
    def full() -> "LatLngRect":
        return LatLngRect(R1Interval(-PI / 2, PI / 2), S1Interval.full())

    def is_full(self) -> bool:
        return (
            self.lat.lo == -PI / 2 and self.lat.hi == PI / 2 and self.lng.is_full()
        )

    def is_empty(self) -> bool:
        return self.lat.is_empty()

    def get_center(self) -> LatLng:
        return LatLng(self.lat.get_center(), self.lng.get_center())

    def get_vertex(self, k: int) -> LatLng:
        i = (k >> 1) & 1
        lats = (self.lat.lo, self.lat.hi)
        lngs = (self.lng.lo, self.lng.hi)
        return LatLng(lats[i], lngs[i ^ (k & 1)])

    def contains_latlng(self, ll: LatLng) -> bool:
        return self.lat.contains(ll.lat) and self.lng.contains(ll.lng)

    def contains_point(self, p) -> bool:
        return self.contains_latlng(LatLng(_latitude(p), _longitude(p)))

    def contains_rect(self, o: "LatLngRect") -> bool:
        return self.lat.contains_interval(o.lat) and self.lng.contains_interval(o.lng)

    def intersects_rect(self, o: "LatLngRect") -> bool:
        return self.lat.intersects(o.lat) and self.lng.intersects(o.lng)

    def expanded_radians(self, lat_margin: float, lng_margin: float) -> "LatLngRect":
        lat = self.lat.expanded(lat_margin)
        lng = self.lng.expanded(lng_margin)
        if lat.is_empty() or lng.is_empty():
            return LatLngRect.empty()
        return LatLngRect(lat.intersection(R1Interval(-PI / 2, PI / 2)), lng)

    def polar_closure(self) -> "LatLngRect":
        if self.lat.lo == -PI / 2 or self.lat.hi == PI / 2:
            return LatLngRect(self.lat, S1Interval.full())
        return self

    def union(self, o: "LatLngRect") -> "LatLngRect":
        return LatLngRect(self.lat.union(o.lat), self.lng.union(o.lng))

    @staticmethod
    def from_center_size(center: LatLng, size: LatLng) -> "LatLngRect":
        """FromCenterSize (s2latlng_rect.cc:50-54)."""
        return LatLngRect.from_point(center).expanded_radians(
            0.5 * size.lat, 0.5 * size.lng
        )

    @staticmethod
    def from_point(p: LatLng) -> "LatLngRect":
        return LatLngRect(R1Interval(p.lat, p.lat), S1Interval(p.lng, p.lng))

    def is_valid(self) -> bool:
        """s2latlng_rect.h: |lat| ≤ π/2, |lng| ≤ π, both-or-neither empty."""
        return (
            abs(self.lat.lo) <= PI / 2
            and abs(self.lat.hi) <= PI / 2
            and self.lng.is_valid()
            and self.lat.is_empty() == self.lng.is_empty()
        )

    def is_point(self) -> bool:
        return self.lat.lo == self.lat.hi and self.lng.lo == self.lng.hi

    def get_size(self) -> LatLng:
        return LatLng(self.lat.get_length(), self.lng.get_length())

    def add_point_ll(self, ll: LatLng) -> None:
        self.lat.add_point(ll.lat)
        self.lng.add_point(ll.lng)

    def add_point(self, p) -> None:
        self.add_point_ll(LatLng(_latitude(p), _longitude(p)))

    def interior_contains_latlng(self, ll: LatLng) -> bool:
        return self.lat.interior_contains(ll.lat) and self.lng.interior_contains(
            ll.lng
        )

    def interior_contains_point(self, p) -> bool:
        return self.interior_contains_latlng(LatLng(_latitude(p), _longitude(p)))

    def interior_contains_rect(self, o: "LatLngRect") -> bool:
        return self.lat.interior_contains_interval(
            o.lat
        ) and self.lng.interior_contains_interval(o.lng)

    def interior_intersects_rect(self, o: "LatLngRect") -> bool:
        return self.lat.interior_intersects(o.lat) and self.lng.interior_intersects(
            o.lng
        )

    def boundary_intersects(self, v0, v1) -> bool:
        """BoundaryIntersects (s2latlng_rect.cc:194-209)."""
        if self.is_empty():
            return False
        if not self.lng.is_full():
            if _intersects_lng_edge(v0, v1, self.lat, self.lng.lo):
                return True
            if _intersects_lng_edge(v0, v1, self.lat, self.lng.hi):
                return True
        if self.lat.lo != -PI / 2 and _intersects_lat_edge(
            v0, v1, self.lat.lo, self.lng
        ):
            return True
        if self.lat.hi != PI / 2 and _intersects_lat_edge(
            v0, v1, self.lat.hi, self.lng
        ):
            return True
        return False

    def intersection(self, o: "LatLngRect") -> "LatLngRect":
        lat = self.lat.intersection(o.lat)
        lng = self.lng.intersection(o.lng)
        if lat.is_empty() or lng.is_empty():
            return LatLngRect.empty()
        return LatLngRect(lat, lng)

    def expanded_by_distance(self, distance_rad: float) -> "LatLngRect":
        """ExpandedByDistance (s2latlng_rect.cc:251-296)."""
        if distance_rad >= 0:
            r = self
            for k in range(4):
                cap = Cap.from_center_angle(
                    self.get_vertex(k).to_point(), distance_rad
                )
                r = r.union(_cap_get_rect_bound(cap))
            return r
        lat_lo = (
            -PI / 2
            if self.lat.lo <= -PI / 2 and self.lng.is_full()
            else self.lat.lo - distance_rad
        )
        lat_hi = (
            PI / 2
            if self.lat.hi >= PI / 2 and self.lng.is_full()
            else self.lat.hi + distance_rad
        )
        lat_result = R1Interval(lat_lo, lat_hi)
        if lat_result.is_empty():
            return LatLngRect.empty()
        max_abs_lat = max(-lat_result.lo, lat_result.hi)
        sin_a = math.sin(-distance_rad)
        sin_c = math.cos(max_abs_lat)
        max_lng_margin = math.asin(sin_a / sin_c) if sin_a < sin_c else PI / 2
        lng_result = self.lng.expanded(-max_lng_margin)
        if lng_result.is_empty():
            return LatLngRect.empty()
        return LatLngRect(lat_result, lng_result)

    def area(self) -> float:
        """Area (s2latlng_rect.cc:94-99)."""
        if self.is_empty():
            return 0.0
        return self.lng.get_length() * (
            math.sin(self.lat.hi) - math.sin(self.lat.lo)
        )

    def get_centroid(self) -> np.ndarray:
        """GetCentroid (s2latlng_rect.cc:101-155): area-scaled."""
        if self.is_empty():
            return np.zeros(3)
        z1, r1 = math.sin(self.lat.lo), math.cos(self.lat.lo)
        z2, r2 = math.sin(self.lat.hi), math.cos(self.lat.hi)
        alpha = 0.5 * self.lng.get_length()
        r = math.sin(alpha) * (r2 * z2 - r1 * z1 + self.lat.get_length())
        lng = self.lng.get_center()
        z = alpha * (z2 + z1) * (z2 - z1)
        return np.array([r * math.cos(lng), r * math.sin(lng), z])

    def get_directed_hausdorff_distance(self, other: "LatLngRect") -> float:
        """GetDirectedHausdorffDistance (s2latlng_rect.cc:593-605):
        max over p in self of min over q in other of d(p, q)."""
        if self.is_empty():
            return 0.0
        if other.is_empty():
            return PI
        lng_distance = self.lng.directed_hausdorff(other.lng)
        return _edge_pair_directed_hausdorff(
            lng_distance, self.lat, other.lat
        )

    def get_hausdorff_distance(self, other: "LatLngRect") -> float:
        """GetHausdorffDistance: max of the two directed distances."""
        return max(
            self.get_directed_hausdorff_distance(other),
            other.get_directed_hausdorff_distance(self),
        )

    def get_distance_rect(self, b: "LatLngRect") -> float:
        """GetDistance(S2LatLngRect) (s2latlng_rect.cc:507-560), radians."""
        from .distance import chord2_to_angle, point_edge_dist2

        a = self
        assert not a.is_empty() and not b.is_empty()
        if a.lng.intersects(b.lng):
            if a.lat.intersects(b.lat):
                return 0.0
            if a.lat.lo > b.lat.hi:
                lo, hi = b.lat.hi, a.lat.lo
            else:
                lo, hi = a.lat.hi, b.lat.lo
            return hi - lo
        lo_hi = S1Interval.from_point_pair(a.lng.lo, b.lng.hi)
        hi_lo = S1Interval.from_point_pair(a.lng.hi, b.lng.lo)
        if lo_hi.get_length() < hi_lo.get_length():
            a_lng, b_lng = a.lng.lo, b.lng.hi
        else:
            a_lng, b_lng = a.lng.hi, b.lng.lo
        a_lo = _ll_to_point(a.lat.lo, a_lng)
        a_hi = _ll_to_point(a.lat.hi, a_lng)
        b_lo = _ll_to_point(b.lat.lo, b_lng)
        b_hi = _ll_to_point(b.lat.hi, b_lng)
        X = np.array([a_lo, a_hi, b_lo, b_hi])
        d2 = min(
            float(point_edge_dist2(X[:2], b_lo[None], b_hi[None]).min()),
            float(point_edge_dist2(X[2:], a_lo[None], a_hi[None]).min()),
        )
        return float(chord2_to_angle(d2))

    def get_distance_latlng(self, p: LatLng) -> float:
        """GetDistance(S2LatLng) (s2latlng_rect.cc:562-586), radians."""
        from .distance import chord2_to_angle, point_edge_dist2

        a = self
        if a.lng.contains(p.lng):
            return max(0.0, max(p.lat - a.lat.hi, a.lat.lo - p.lat))
        # GetComplementCenter (s1interval.h): center of the complement
        comp_center = math.remainder(a.lng.get_center() + PI, 2 * PI)
        interval = S1Interval(a.lng.hi, comp_center)
        a_lng = a.lng.hi if interval.contains(p.lng) else a.lng.lo
        lo = _ll_to_point(a.lat.lo, a_lng)
        hi = _ll_to_point(a.lat.hi, a_lng)
        d2 = float(point_edge_dist2(p.to_point()[None], lo[None], hi[None])[0, 0])
        return float(chord2_to_angle(d2))

    def approx_equals(self, o: "LatLngRect", max_error: float = 1e-15) -> bool:
        """ApproxEquals (s2latlng_rect.cc:733-741): per-interval, where
        an empty interval approx-equals any interval of length
        ≤ 2·max_error (r1interval.h / s1interval.h semantics)."""
        def r1_eq(x: R1Interval, y: R1Interval) -> bool:
            if x.is_empty():
                return y.get_length() <= 2 * max_error
            if y.is_empty():
                return x.get_length() <= 2 * max_error
            return (abs(x.lo - y.lo) <= max_error
                    and abs(x.hi - y.hi) <= max_error)

        def s1_eq(x: S1Interval, y: S1Interval) -> bool:
            if x.is_empty():
                return y.get_length() <= 2 * max_error
            if y.is_empty():
                return x.get_length() <= 2 * max_error
            if x.is_full():
                return y.get_length() >= 2 * (PI - max_error)
            if y.is_full():
                return x.get_length() >= 2 * (PI - max_error)
            return (
                abs(math.remainder(y.lo - x.lo, 2 * PI)) <= max_error
                and abs(math.remainder(y.hi - x.hi, 2 * PI)) <= max_error
                and abs(x.get_length() - y.get_length()) <= 2 * max_error
            )

        return r1_eq(self.lat, o.lat) and s1_eq(self.lng, o.lng)

    # ---- region interface
    def contains_cell(self, cell: Cell) -> bool:
        return self.contains_rect(cell.get_rect_bound())

    def may_intersect_cell(self, cell: Cell) -> bool:
        """Exact Intersects(S2Cell) (s2latlng_rect.cc:300-357)."""
        if self.is_empty():
            return False
        if self.contains_point(cell.get_center_raw()):
            return True
        if cell.contains_point(self.get_center().to_point()):
            return True
        if not self.intersects_rect(cell.get_rect_bound()):
            return False
        cell_v = [cell.get_vertex(i) for i in range(4)]
        cell_ll = [LatLng(_latitude(v), _longitude(v)) for v in cell_v]
        for i in range(4):
            if self.contains_latlng(cell_ll[i]):
                return True
            if cell.contains_point(self.get_vertex(i).to_point()):
                return True
        for i in range(4):
            edge_lng = S1Interval.from_point_pair(
                cell_ll[i].lng, cell_ll[(i + 1) & 3].lng
            )
            if not self.lng.intersects(edge_lng):
                continue
            a = cell_v[i]
            b = cell_v[(i + 1) & 3]
            if edge_lng.contains(self.lng.lo):
                if _intersects_lng_edge(a, b, self.lat, self.lng.lo):
                    return True
            if edge_lng.contains(self.lng.hi):
                if _intersects_lng_edge(a, b, self.lat, self.lng.hi):
                    return True
            if _intersects_lat_edge(a, b, self.lat.lo, self.lng):
                return True
            if _intersects_lat_edge(a, b, self.lat.hi, self.lng):
                return True
        return False

    def get_cap_bound(self) -> Cap:
        """s2latlng_rect.cc GetCapBound: smaller of pole cap / mid cap."""
        if self.is_empty():
            return Cap.empty()
        if self.lat.lo + self.lat.hi < 0:
            pole_z, pole_angle = -1.0, PI / 2 + self.lat.hi
        else:
            pole_z, pole_angle = 1.0, PI / 2 - self.lat.lo
        pole_cap = Cap.from_center_angle(
            np.array([0.0, 0.0, pole_z]), (1 + 2 * DBL_EPSILON) * pole_angle
        )
        if self.lng.get_length() <= PI:
            mid_cap = Cap.from_point(self.get_center().to_point())
            for k in range(4):
                mid_cap.add_point(self.get_vertex(k).to_point())
            if mid_cap.height() < pole_cap.height():
                return mid_cap
        return pole_cap

    def get_cell_union_bound(self) -> list[CID]:
        return self.get_cap_bound().get_cell_union_bound()


def _intersects_lng_edge(a, b, lat: R1Interval, lng: float) -> bool:
    """s2latlng_rect.cc IntersectsLngEdge."""
    return (
        crossing_sign(
            a, b, _ll_to_point(lat.lo, lng), _ll_to_point(lat.hi, lng)
        )
        > 0
    )


def _intersects_lat_edge(a, b, lat: float, lng: S1Interval) -> bool:
    """s2latlng_rect.cc IntersectsLatEdge."""
    z = robust_cross_prod(np.asarray(a, float), np.asarray(b, float))
    z = z / np.linalg.norm(z)
    if z[2] < 0:
        z = -z
    y = robust_cross_prod(z, np.array([0.0, 0.0, 1.0]))
    y = y / np.linalg.norm(y)
    x = np.cross(y, z)
    sin_lat = math.sin(lat)
    if abs(sin_lat) >= x[2]:
        return False
    cos_theta = sin_lat / x[2]
    sin_theta = math.sqrt(1 - cos_theta * cos_theta)
    theta = math.atan2(sin_theta, cos_theta)
    ab_theta = S1Interval.from_point_pair(
        math.atan2(float(a @ y), float(a @ x)),
        math.atan2(float(b @ y), float(b @ x)),
    )
    if ab_theta.contains(theta):
        isect = x * cos_theta + y * sin_theta
        if lng.contains(math.atan2(isect[1], isect[0])):
            return True
    if ab_theta.contains(-theta):
        isect = x * cos_theta - y * sin_theta
        if lng.contains(math.atan2(isect[1], isect[0])):
            return True
    return False


class ShapeRegion:
    """Region over point/polyline/polygon geometry with
    S2ShapeIndexRegion-equivalent semantics (s2shape_index_region.h):

    may_intersect(cell) ⇔ some edge intersects the cell padded by
    kMaxError = kFaceClipErrorUVCoord + kIntersectsRectErrorUVDist
    (AnyEdgeIntersects), or the cell is entirely inside a polygon;
    contains(cell) ⇔ no edge intersects and the cell center is inside.
    """

    PAD = FACE_CLIP_ERROR_UV_COORD + INTERSECTS_RECT_ERROR_UV_DIST

    def __init__(
        self,
        points: np.ndarray | None = None,
        polylines: list[np.ndarray] | None = None,
        polygon: Polygon | None = None,
    ):
        self.points = (
            np.asarray(points, float).reshape(-1, 3)
            if points is not None and len(points)
            else np.zeros((0, 3))
        )
        self.polylines = [np.asarray(p, float) for p in (polylines or [])]
        self.polygon = polygon
        # edge list: (a, b) pairs from polylines + polygon loops
        edges = []
        for pl in self.polylines:
            for i in range(len(pl) - 1):
                edges.append((pl[i], pl[i + 1]))
        if polygon is not None:
            for loop in polygon.loops:
                v = loop.vertices
                if len(v) >= 3:
                    for i in range(len(v)):
                        edges.append((v[i], v[(i + 1) % len(v)]))
        self.edges = edges
        # Precomputed per-edge arrays for the vectorized AnyEdgeIntersects
        # fast path: endpoint faces once (instead of per cell probe), and
        # a per-face cache of same-face UV projections.  Same math, batch
        # form — the per-edge scalar clip survives only for edges that
        # straddle the probe face.
        if edges:
            self._E0 = np.array([a for a, _ in edges], dtype=float).reshape(-1, 3)
            self._E1 = np.array([b for _, b in edges], dtype=float).reshape(-1, 3)
            from .coords import get_face as _get_face

            self._efa = _get_face(self._E0[:, 0], self._E0[:, 1], self._E0[:, 2])
            self._efb = _get_face(self._E1[:, 0], self._E1[:, 1], self._E1[:, 2])
            self._chord2 = ((self._E0 - self._E1) ** 2).sum(-1)
        else:
            self._E0 = None
        self._face_cache: dict = {}

    def _face_data(self, face: int):
        """(A2, B2, rest) for one probe face: exact UV endpoints of the
        edges whose BOTH endpoints lie on `face` (identical quotients to
        the scalar clip's same-face branch), plus the indices of the
        remaining edges that could still clip onto the face — an edge
        whose endpoints both satisfy w ≤ 0 in the face frame and whose
        arc is shorter than π has w(t) ≤ 0 everywhere (positive slerp
        coefficients), so it can never project onto the face and is
        dropped here instead of per probe cell."""
        got = self._face_cache.get(face)
        if got is None:
            from .coords import valid_face_xyz_to_uv

            same = (self._efa == face) & (self._efb == face)
            idx = np.nonzero(same)[0]
            A, B = self._E0[idx], self._E1[idx]
            ua, va = valid_face_xyz_to_uv(face, A[:, 0], A[:, 1], A[:, 2])
            ub, vb = valid_face_xyz_to_uv(face, B[:, 0], B[:, 1], B[:, 2])
            A2 = np.stack([ua, va], -1)
            B2 = np.stack([ub, vb], -1)
            rest = np.nonzero(~same)[0]
            axis, sign = face % 3, (1.0 if face < 3 else -1.0)
            wa = sign * self._E0[rest, axis]
            wb = sign * self._E1[rest, axis]
            rest = rest[~((wa <= 0.0) & (wb <= 0.0) & (self._chord2[rest] < 2.0))]
            got = (A2, B2, rest)
            self._face_cache[face] = got
        return got

    def _any_edge_intersects(self, cell: Cell) -> bool:
        if self._E0 is None:
            return False
        bound = cell.get_bound_uv_expanded(self.PAD)
        face = cell.face
        A2, B2, rest = self._face_data(face)
        if len(A2):
            from .clipping import segs_intersect_rect

            if segs_intersect_rect(A2, B2, bound, 0.0).any():
                return True
        for k in rest:
            a, b = self.edges[k]
            clipped = clip_to_padded_face(a, b, face, self.PAD)
            if clipped is not None and intersects_rect(clipped[0], clipped[1], bound):
                return True
        return False

    def _any_point_in_cell(self, cell: Cell) -> bool:
        for p in self.points:
            if cell.contains_point(p):
                return True
        return False

    def contains_point(self, p) -> bool:
        return self.polygon is not None and bool(
            self.polygon.contains(np.asarray(p, float)[None])[0]
        )

    def contains_cell(self, cell: Cell) -> bool:
        # Only a polygon interior can contain a 2D cell; any point/polyline
        # edge crossing the cell boundary breaks containment only if it
        # exits — matching S2ShapeIndexRegion::Contains, we require no edge
        # intersections and the center inside.
        if self.points.size or self.polylines:
            return False
        if self.polygon is None:
            return False
        if self._any_edge_intersects(cell):
            return False
        return self.contains_point(cell.get_center())

    def may_intersect_cell(self, cell: Cell) -> bool:
        if self._any_point_in_cell(cell):
            return True
        if self._any_edge_intersects(cell):
            return True
        if self.polygon is not None and self.contains_point(cell.get_center()):
            return True
        return False

    def get_cap_bound(self) -> Cap:
        cap = Cap.empty()
        for p in self.points:
            cap.add_point(p)
        for a, b in self.edges:
            cap.add_point(a)
            cap.add_point(b)
        if cap.is_empty():
            return cap
        # grow slightly: the vertices bound the geometry for polylines and
        # polygon boundaries; polygon interiors are bounded since every loop
        # smaller than a hemisphere is inside its vertex cap... be safe and
        # expand to the full hemisphere when a polygon might exceed it.
        grown = Cap.from_center_angle(
            cap.center, min(math.pi, cap.radius_radians() * (1 + 1e-14) + 1e-15)
        )
        return grown

    def get_cell_union_bound(self) -> list[CID]:
        return self.get_cap_bound().get_cell_union_bound()


class CellUnionRegion:
    """S2CellUnion as a region (s2cell_union.cc): exact cell algebra."""

    def __init__(self, ids: list[CID]):
        self.ids = sorted(ids, key=lambda c: c.id)

    def contains_cid(self, cid: CID) -> bool:
        """Exact port of S2CellUnion::Contains(S2CellId)."""
        import bisect

        i = bisect.bisect_left(self.ids, cid)
        if i < len(self.ids) and self.ids[i].range_min().id <= cid.id:
            return True
        return i > 0 and self.ids[i - 1].range_max().id >= cid.id

    def intersects_cid(self, cid: CID) -> bool:
        """Exact port of S2CellUnion::Intersects(S2CellId)."""
        import bisect

        i = bisect.bisect_left(self.ids, cid)
        if i < len(self.ids) and self.ids[i].range_min().id <= cid.range_max().id:
            return True
        return i > 0 and self.ids[i - 1].range_max().id >= cid.range_min().id

    def contains_cell(self, cell: Cell) -> bool:
        return self.contains_cid(cell.id)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return self.intersects_cid(cell.id)

    def contains_point(self, p) -> bool:
        from . import cellid as K

        leaf = CID(
            int(K.from_point(np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))[0])
        )
        return self.contains_cid(leaf)

    def get_cap_bound(self) -> Cap:
        cap = Cap.empty()
        for cid in self.ids:
            cap.add_point(Cell(cid).get_center())
        if cap.is_empty():
            return cap
        # expand by max cell diag radius at each cell's level
        max_r = 0.0
        for cid in self.ids:
            c = Cell(cid)
            center = c.get_center()
            for k in range(4):
                d = 2 * math.asin(0.5 * math.sqrt(_chord_angle2(center, c.get_vertex(k))))
                max_r = max(max_r, d)
        return Cap.from_center_angle(
            cap.center, cap.radius_radians() + max_r
        )

    def get_cell_union_bound(self) -> list[CID]:
        return list(self.ids)


class RegionUnion:
    """S2RegionUnion (s2region_union.cc): lazy union of regions."""

    def __init__(self, regions: list):
        self.regions = regions

    def contains_point(self, p) -> bool:
        return any(r.contains_point(p) for r in self.regions)

    def contains_cell(self, cell: Cell) -> bool:
        # conservative like the reference: true if any member contains it
        return any(r.contains_cell(cell) for r in self.regions)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return any(r.may_intersect_cell(cell) for r in self.regions)

    def get_cap_bound(self) -> Cap:
        cap = Cap.empty()
        for r in self.regions:
            sub = r.get_cap_bound()
            if sub.is_empty():
                continue
            cap.add_point(sub.center)
            # grow to cover the member cap
            grow = _chord_angle2(cap.center, sub.center)
            cap.length2 = max(
                cap.length2,
                Cap.from_center_angle(
                    cap.center,
                    cap.radius_radians() + sub.radius_radians(),
                ).length2,
            )
        return cap

    def get_cell_union_bound(self) -> list[CID]:
        out: list[CID] = []
        for r in self.regions:
            out.extend(r.get_cell_union_bound())
        from . import cellunion

        return cellunion.normalize(out)


class RegionIntersection:
    """S2RegionIntersection (s2region_intersection.cc): lazy intersection."""

    def __init__(self, regions: list):
        self.regions = regions

    def contains_point(self, p) -> bool:
        return all(r.contains_point(p) for r in self.regions)

    def contains_cell(self, cell: Cell) -> bool:
        return all(r.contains_cell(cell) for r in self.regions)

    def may_intersect_cell(self, cell: Cell) -> bool:
        # conservative: a cell may intersect only if it may intersect all
        return all(r.may_intersect_cell(cell) for r in self.regions)

    def get_cap_bound(self) -> Cap:
        caps = [r.get_cap_bound() for r in self.regions]
        if not caps:
            return Cap.full()
        return min(caps, key=lambda c: c.length2)

    def get_cell_union_bound(self) -> list[CID]:
        return self.get_cap_bound().get_cell_union_bound()


def _cap_get_rect_bound(cap: Cap) -> LatLngRect:
    """S2Cap::GetRectBound (s2cap.cc:165-196)."""
    if cap.is_empty():
        return LatLngRect.empty()
    center_lat = _latitude(cap.center)
    center_lng = _longitude(cap.center)
    cap_angle = cap.radius_radians()
    all_longitudes = False
    lat_lo = center_lat - cap_angle
    lat_hi = center_lat + cap_angle
    lng_lo, lng_hi = -PI, PI
    if lat_lo <= -PI / 2:
        lat_lo = -PI / 2
        all_longitudes = True
    if lat_hi >= PI / 2:
        lat_hi = PI / 2
        all_longitudes = True
    if not all_longitudes:
        # sin(radius) from the squared chord: sin²(a) = l²(1 - l²/4)
        sin_a = math.sqrt(cap.length2 * (1 - 0.25 * cap.length2))
        sin_c = math.cos(center_lat)
        if sin_a <= sin_c:
            angle_a = math.asin(sin_a / sin_c)
            lng_lo = math.remainder(center_lng - angle_a, 2 * PI)
            lng_hi = math.remainder(center_lng + angle_a, 2 * PI)
    return LatLngRect(R1Interval(lat_lo, lat_hi), S1Interval(lng_lo, lng_hi))


def _cap_expanded(cap: Cap, distance_rad: float) -> Cap:
    """S2Cap::Expanded (s2cap.cc)."""
    if cap.is_empty():
        return Cap.empty()
    return Cap.from_center_angle(cap.center, cap.radius_radians() + distance_rad)


Cap.get_rect_bound = _cap_get_rect_bound
Cap.expanded = _cap_expanded


def cell_cap_bound(cell: Cell) -> Cap:
    """S2Cell::GetCapBound (s2cell.cc:159-175): uv-center axis + AddPoint
    of the 4 vertices."""
    from .cell import _face_uv_to_xyz

    c = _face_uv_to_xyz(
        cell.face, 0.5 * (cell.u_lo + cell.u_hi), 0.5 * (cell.v_lo + cell.v_hi)
    )
    c = c / np.linalg.norm(c)
    cap = Cap.from_point(c)
    for k in range(4):
        cap.add_point(cell.get_vertex(k))
    return cap


class ShapeIndexBufferedRegion:
    """S2ShapeIndexBufferedRegion (s2shape_index_buffered_region.h/.cc):
    the set of points within `radius` of any point of the indexed
    geometry (interiors included).  Distance predicates use
    radius.Successor() so that "≤ radius" semantics hold even at
    radius 0 (h:34-58)."""

    def __init__(self, shapes: list, radius_rad: float):
        from .closest_edge import Shape  # noqa: F401 (type of `shapes`)
        from .distance import angle_to_chord2, chord2_successor
        from .point_index import ShapeIndexTarget

        self.shapes = shapes
        self.radius_rad = radius_rad
        self.radius2 = float(angle_to_chord2(radius_rad))
        self.radius2_successor = float(chord2_successor(self.radius2))
        self._target = ShapeIndexTarget(shapes, include_interiors=True)
        # the unbuffered region, for the Contains fast path
        self._shape_regions = []
        for sh in shapes:
            if sh.dim == 0:
                self._shape_regions.append(ShapeRegion(points=sh.edges_c))
            elif sh.dim == 1:
                v = np.concatenate([sh.edges_c, sh.edges_d[-1:]])
                self._shape_regions.append(ShapeRegion(polylines=[v]))
            else:
                self._shape_regions.append(ShapeRegion(polygon=sh.polygon))

    def contains_point(self, p) -> bool:
        d2 = self._target.dist2_to_points(np.asarray(p, float)[None])[0]
        return d2 < self.radius2_successor

    def contains_cell(self, cell: Cell) -> bool:
        """cc:90-115: unbuffered containment, else the cell's bounding
        cap must fit within radius of the center's closest point."""
        if self.radius2_successor > 4.0 or (
            self.radius2_successor == 4.0 and self.radius2 < 4.0
        ):
            # successor beyond Straight ⇒ covers the sphere
            return True
        if any(r.contains_cell(cell) for r in self._shape_regions):
            return True
        cap = cell_cap_bound(cell)
        cap_angle = cap.radius_radians()
        if self.radius_rad < cap_angle:
            return False
        from .distance import angle_to_chord2, chord2_to_angle

        limit_angle = float(chord2_to_angle(self.radius2_successor)) - cap_angle
        limit2 = float(angle_to_chord2(max(0.0, limit_angle)))
        d2 = self._target.dist2_to_points(cell.get_center()[None])[0]
        return d2 < limit2

    def may_intersect_cell(self, cell: Cell) -> bool:
        d2 = self._target.dist2_to_cell(cell)
        return d2 < self.radius2_successor

    def get_cap_bound(self) -> Cap:
        cap = Cap.empty()
        for r in self._shape_regions:
            orig = r.get_cap_bound()
            if not orig.is_empty():
                cap = cap.union(orig)
        if cap.is_empty():
            return cap
        return Cap.from_center_angle(
            cap.center, cap.radius_radians() + self.radius_rad
        )

    def get_cell_union_bound(self) -> list[CID]:
        """cc:60-88: expand each unbuffered bound cell with its vertex
        neighbors at a level sized to the buffer radius."""
        from .metrics import MIN_WIDTH

        max_level = MIN_WIDTH.get_level_for_min_value(self.radius_rad) - 1
        if max_level < 0:
            return [CID.from_face(f) for f in range(6)]
        orig: list[CID] = []
        for r in self._shape_regions:
            orig.extend(r.get_cell_union_bound())
        out: list[CID] = []
        for cid in orig:
            if cid.is_face():
                return [CID.from_face(f) for f in range(6)]
            lvl = min(max_level, cid.level() - 1)
            out.extend(_vertex_neighbors_of_cell(cid, lvl))
        return out


def _vertex_neighbors_of_cell(cid: CID, level: int) -> list[CID]:
    """S2CellId::AppendVertexNeighbors at `level` (cellid kernel)."""
    from . import cellid as _K

    rows = _K.vertex_neighbors(np.array([cid.id], dtype=np.uint64), level)
    return [CID(int(v)) for v in np.unique(rows[0])]


class PointRegion:
    """S2PointRegion (s2point_region.h): a region consisting of one
    point; contains only that exact point."""

    def __init__(self, point: np.ndarray):
        self.point = np.asarray(point, float).reshape(3)

    def contains_point(self, p) -> bool:
        return bool(np.array_equal(np.asarray(p, float).reshape(3), self.point))

    def contains_cell(self, cell: Cell) -> bool:
        return False  # a point never contains a 2D cell

    def may_intersect_cell(self, cell: Cell) -> bool:
        return cell.contains_point(self.point)

    def get_cap_bound(self) -> Cap:
        return Cap.from_point(self.point)

    def get_rect_bound(self) -> LatLngRect:
        ll = LatLng(_latitude(self.point), _longitude(self.point))
        return LatLngRect.from_point_pair(ll, ll)

    def get_cell_union_bound(self) -> list[CID]:
        return self.get_cap_bound().get_cell_union_bound()


def _region_union_rect_bound(self) -> LatLngRect:
    rect = LatLngRect.empty()
    for r in self.regions:
        rect = rect.union(r.get_rect_bound())
    return rect


RegionUnion.get_rect_bound = _region_union_rect_bound


# ------------------------------------------------- rect Hausdorff helpers


def _r1_directed_hausdorff(a: R1Interval, b: R1Interval) -> float:
    """R1Interval::GetDirectedHausdorffDistance (r1interval.h:145-149)."""
    if a.is_empty():
        return 0.0
    if b.is_empty():
        return math.inf
    return max(0.0, max(a.hi - b.hi, b.lo - a.lo))


def _ll_point(lat_rad: float, lng_rad: float) -> np.ndarray:
    x, y, z = latlng_to_xyz(
        np.array([math.degrees(lat_rad)]), np.array([math.degrees(lng_rad)])
    )
    return np.array([x[0], y[0], z[0]])


def _point_edge_angle(x, a, b) -> float:
    from .distance import chord2_to_angle, point_edge_dist2

    d2 = point_edge_dist2(np.asarray(x, float)[None],
                          np.asarray(a, float)[None],
                          np.asarray(b, float)[None])[0, 0]
    return float(chord2_to_angle(d2))


def _bisector_intersection(lat: R1Interval, lng: float) -> np.ndarray:
    """S2LatLngRect::GetBisectorIntersection (s2latlng_rect.cc:692-706):
    intersection of longitude 0 with the bisector of an edge on
    longitude `lng` spanning `lat`."""
    lng = abs(lng)
    lat_center = lat.get_center()
    if lat_center >= 0:
        ortho_bisector = _ll_point(lat_center - PI / 2, lng)
    else:
        ortho_bisector = _ll_point(-lat_center - PI / 2, lng - PI)
    ortho_lng = np.array([0.0, -1.0, 0.0])
    return robust_cross_prod(ortho_lng, ortho_bisector)


def _interior_max_distance(a_lat: R1Interval, b: np.ndarray) -> float:
    """S2LatLngRect::GetInteriorMaxDistance (s2latlng_rect.cc:711-727):
    max distance from b to the longitude-0 segment spanning a_lat, when
    attained in the interior (else -1)."""
    if a_lat.is_empty() or b[0] >= 0:
        return -1.0
    ip = np.array([-b[0], 0.0, -b[2]])
    ip = ip / np.linalg.norm(ip)
    ip_lat = math.asin(max(-1.0, min(1.0, ip[2])))
    if a_lat.interior_contains(ip_lat):
        bn = np.asarray(b, float)
        return math.atan2(
            float(np.linalg.norm(np.cross(bn, ip))), float(bn @ ip)
        )
    return -1.0


def _edge_pair_directed_hausdorff(
    lng_diff: float, a: R1Interval, b: R1Interval
) -> float:
    """The static GetDirectedHausdorffDistance over two longitudinal
    edges (s2latlng_rect.cc:610-688)."""
    assert 0 <= lng_diff <= PI
    if lng_diff == 0:
        return _r1_directed_hausdorff(a, b)

    b_lng = lng_diff
    b_lo = _ll_point(b.lo, b_lng)
    b_hi = _ll_point(b.hi, b_lng)

    a_lo = _ll_point(a.lo, 0)
    a_hi = _ll_point(a.hi, 0)
    max_distance = max(
        _point_edge_angle(a_lo, b_lo, b_hi),
        _point_edge_angle(a_hi, b_lo, b_hi),
    )

    if lng_diff <= PI / 2:
        if a.contains(0) and b.contains(0):
            max_distance = max(max_distance, lng_diff)
    else:
        p = _bisector_intersection(b, b_lng)
        p = p / np.linalg.norm(p)
        p_lat = math.asin(max(-1.0, min(1.0, p[2])))
        if a.contains(p_lat):
            d = math.atan2(
                float(np.linalg.norm(np.cross(p, b_lo))), float(p @ b_lo)
            )
            max_distance = max(max_distance, d)
        if p_lat > a.lo:
            max_distance = max(
                max_distance,
                _interior_max_distance(
                    R1Interval(a.lo, min(p_lat, a.hi)), b_lo
                ),
            )
        if p_lat < a.hi:
            max_distance = max(
                max_distance,
                _interior_max_distance(
                    R1Interval(max(p_lat, a.lo), a.hi), b_hi
                ),
            )
    return max_distance
