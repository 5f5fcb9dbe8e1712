"""S2 metrics — quadratic projection constants (s2metrics.cc:39-90) and
level↔physical-size helpers (s2metrics.h:169-205)."""

from __future__ import annotations

import math

MAX_LEVEL = 30


class Metric:
    def __init__(self, deriv: float, dim: int):
        self.deriv = deriv
        self.dim = dim

    def get_value(self, level: int) -> float:
        return math.ldexp(self.deriv, -self.dim * level)

    def get_level_for_max_value(self, value: float) -> int:
        """Minimum level such that the metric is ≤ value (s2metrics.h:169-183)."""
        if not value > 0:
            return MAX_LEVEL
        level = _ilogb(value / self.deriv)
        return max(0, min(MAX_LEVEL, -(level >> (self.dim - 1))))

    def get_level_for_min_value(self, value: float) -> int:
        """Maximum level such that the metric is ≥ value (s2metrics.h:186-200)."""
        if not value > 0:
            return MAX_LEVEL
        level = _ilogb(self.deriv / value)
        return max(0, min(MAX_LEVEL, level >> (self.dim - 1)))

    def get_closest_level(self, value: float) -> int:
        return self.get_level_for_max_value(
            (math.sqrt(2) if self.dim == 1 else 2) * value
        )


def _ilogb(x: float) -> int:
    """C ilogb: exponent e with |x| = m*2^e, m in [1,2)."""
    m, e = math.frexp(abs(x))
    return e - 1


# Quadratic-projection values (s2metrics.cc:39-90)
MIN_ANGLE_SPAN = Metric(4.0 / 3, 1)
MAX_ANGLE_SPAN = Metric(1.704897179199218452, 1)
AVG_ANGLE_SPAN = Metric(math.pi / 2, 1)
MIN_WIDTH = Metric(2 * math.sqrt(2) / 3, 1)
MAX_WIDTH = Metric(MAX_ANGLE_SPAN.deriv, 1)
AVG_WIDTH = Metric(1.434523672886099389, 1)
MIN_EDGE = Metric(2 * math.sqrt(2) / 3, 1)
MAX_EDGE = Metric(MAX_ANGLE_SPAN.deriv, 1)
AVG_EDGE = Metric(1.459213746386106062, 1)
MIN_DIAG = Metric(8 * math.sqrt(2) / 9, 1)
MAX_DIAG = Metric(2.438654594434021032, 1)
AVG_DIAG = Metric(2.060422738998471683, 1)
MIN_AREA = Metric(8 * math.sqrt(2) / 9, 2)
MAX_AREA = Metric(2.635799256963161491, 2)
AVG_AREA = Metric(4 * math.pi / 6, 2)

# S2Earth (s2earth.h:269)
EARTH_RADIUS_METERS = 6371010.0
EARTH_RADIUS_KM = EARTH_RADIUS_METERS / 1000.0


def meters_to_radians(meters: float) -> float:
    return meters / EARTH_RADIUS_METERS


def radians_to_meters(radians: float) -> float:
    return radians * EARTH_RADIUS_METERS


def km_to_radians(km: float) -> float:
    """S2Earth::KmToRadians (s2earth.h:219)."""
    return km / EARTH_RADIUS_KM


def radians_to_km(radians: float) -> float:
    """S2Earth::RadiansToKm (s2earth.h:223)."""
    return radians * EARTH_RADIUS_KM


def square_km_to_steradians(km2: float) -> float:
    """S2Earth::SquareKmToSteradians (s2earth.h:227)."""
    return km2 / (EARTH_RADIUS_KM * EARTH_RADIUS_KM)


def steradians_to_square_km(steradians: float) -> float:
    """S2Earth::SteradiansToSquareKm (s2earth.h:231)."""
    return steradians * EARTH_RADIUS_KM * EARTH_RADIUS_KM


def square_meters_to_steradians(m2: float) -> float:
    """S2Earth::SquareMetersToSteradians (s2earth.h:235)."""
    return m2 / (EARTH_RADIUS_METERS * EARTH_RADIUS_METERS)


def steradians_to_square_meters(steradians: float) -> float:
    """S2Earth::SteradiansToSquareMeters (s2earth.h:239)."""
    return steradians * EARTH_RADIUS_METERS * EARTH_RADIUS_METERS


def meters_to_longitude_radians(meters: float, latitude_radians: float) -> float:
    """S2Earth::MetersToLongitudeRadians (s2earth.h:183-200): radians of
    longitude spanning `meters` at the given latitude; 2*pi at (or within
    rounding of) the poles instead of dividing by ~0."""
    scalar = math.cos(latitude_radians)
    if scalar == 0:
        return math.pi * 2
    return min(meters_to_radians(meters) / scalar, math.pi * 2)


def get_initial_bearing(
    lat1_rad: float, lng1_rad: float, lat2_rad: float, lng2_rad: float
) -> float:
    """S2Earth::GetInitialBearing (s2earth.cc): compass bearing in
    radians (0 = north, pi/2 = east) at the start of the great-circle
    path from point 1 to point 2."""
    lat1 = lat1_rad
    cos_lat2 = math.cos(lat2_rad)
    lat_diff = lat2_rad - lat1_rad
    lng_diff = lng2_rad - lng1_rad
    x = math.sin(lat_diff) + math.sin(lat1) * cos_lat2 * 2 * _haversine(lng_diff)
    y = math.sin(lng_diff) * cos_lat2
    return math.atan2(y, x)


def _haversine(radians: float) -> float:
    sin_half = math.sin(radians / 2)
    return sin_half * sin_half


# cell aspect-ratio bounds (s2metrics.cc:115-123, quadratic projection)
MAX_EDGE_ASPECT = 1.442615274452682920
MAX_DIAG_ASPECT = math.sqrt(3)
