"""S2Fractal: random Koch-snowflake-like test loops (s2fractal.h/.cc).

A testing-geometry generator: builds fractal polylines/loops whose
fractal dimension is tunable in [1.0, 2.0).  Used by the reference's
query test suites (s2closest_point_query_test.cc, s2loop_test.cc,
s2polygon_test.cc) as a worst-case geometry source; we port it so the
same stress shapes drive our kernels.  Randomness comes from a
caller-supplied ``numpy.random.RandomState`` (the public analogue of
the reference's absl::BitGenRef) so every fixture is deterministic.

Reference: s2fractal.cc:31-154, s2fractal.h:40-132.
"""

from __future__ import annotations

import math

import numpy as np

from .contains import Loop


def from_frame(frame: np.ndarray, p: np.ndarray) -> np.ndarray:
    """S2::FromFrame (s2pointutil.h): frame columns (x,y,z) times p."""
    return frame @ np.asarray(p, dtype=np.float64)


def frame_at(rng: np.random.RandomState, z: np.ndarray) -> np.ndarray:
    """s2random::FrameAt: a right-handed frame with the given z axis and
    a random rotation about it."""
    from .polyline import _get_frame

    base = _get_frame(np.asarray(z, dtype=np.float64))
    theta = rng.uniform(0.0, 2 * math.pi)
    c, s = math.cos(theta), math.sin(theta)
    x = c * base[:, 0] + s * base[:, 1]
    y = -s * base[:, 0] + c * base[:, 1]
    return np.stack([x, y, base[:, 2]], axis=1)


def random_point(rng: np.random.RandomState) -> np.ndarray:
    """s2random::Point: uniform on the sphere."""
    z = rng.uniform(-1.0, 1.0)
    theta = rng.uniform(0.0, 2 * math.pi)
    r = math.sqrt(max(0.0, 1.0 - z * z))
    return np.array([r * math.cos(theta), r * math.sin(theta), z])


def sample_cap_point(rng: np.random.RandomState, center: np.ndarray,
                     radius_rad: float) -> np.ndarray:
    """s2random::SamplePoint(cap): uniform by area within the cap —
    height uniform in [cos(r), 1], azimuth uniform.  The height is
    parameterized by its DEFICIT 1−cos(r) = 2·sin²(r/2) so that caps
    far below the 1-ulp-of-cos threshold (r ≈ 1e-8) still sample the
    whole cap instead of collapsing to the center (the reference's
    S2Cap stores the height deficit for the same reason, s2cap.h)."""
    d = 2.0 * math.sin(0.5 * min(math.pi, radius_rad)) ** 2
    deficit = rng.uniform(0.0, 1.0) * d
    sin_t = math.sqrt(max(0.0, deficit * (2.0 - deficit)))
    h = 1.0 - deficit
    phi = rng.uniform(0.0, 2 * math.pi)
    frame = _default_frame(np.asarray(center, dtype=np.float64))
    local = np.array([sin_t * math.cos(phi), sin_t * math.sin(phi), h])
    p = from_frame(frame, local)
    return p / np.linalg.norm(p)


def _default_frame(z: np.ndarray) -> np.ndarray:
    from .polyline import _get_frame

    return _get_frame(z)


def make_regular_points(center: np.ndarray, radius_rad: float,
                        num_vertices: int) -> np.ndarray:
    """S2Testing::MakeRegularPoints (s2testing.cc): `num_vertices`
    points regularly spaced on the circle of the given angular radius
    around `center`, in CCW order."""
    frame = _default_frame(np.asarray(center, dtype=np.float64))
    z = math.cos(radius_rad)
    r = math.sin(radius_rad)
    theta = 2 * math.pi * np.arange(num_vertices) / num_vertices
    local = np.stack(
        [r * np.cos(theta), r * np.sin(theta), np.full(num_vertices, z)], -1
    )
    pts = local @ frame.T
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


class Fractal:
    """Port of S2Fractal (s2fractal.h:40-132).

    The fractal is a closed curve of 3·4^n edges built by recursively
    subdividing the edges of an equilateral triangle; `dimension`
    controls the edge-shrink factor 4^(-1/dimension) (dimension 1 =
    smooth triangle-ish, →2 = space-filling).  min_level < max_level
    stops subdivision early on a random fraction of edges, yielding
    mixed-resolution curves.
    """

    def __init__(self, rng: np.random.RandomState):
        self._rng = rng
        self.max_level_ = -1
        self._min_level_arg = -1
        self.min_level_ = -1
        self.dimension = math.log(4) / math.log(3)  # classic Koch, h:63
        self._compute_offsets()

    # ---- parameters (s2fractal.cc:35-66)
    def set_max_level(self, max_level: int) -> None:
        assert max_level >= 0
        self.max_level_ = max_level
        self._compute_min_level()

    def set_min_level(self, min_level: int) -> None:
        assert min_level >= -1
        self._min_level_arg = min_level
        self._compute_min_level()

    def _compute_min_level(self) -> None:
        if 0 <= self._min_level_arg <= self.max_level_:
            self.min_level_ = self._min_level_arg
        else:
            self.min_level_ = self.max_level_

    def set_fractal_dimension(self, dimension: float) -> None:
        assert 1.0 <= dimension < 2.0
        self.dimension = dimension
        self._compute_offsets()

    def _compute_offsets(self) -> None:
        self.edge_fraction = math.pow(4.0, -1.0 / self.dimension)
        self.offset_fraction = math.sqrt(self.edge_fraction - 0.25)

    def set_level_for_approx_min_edges(self, min_edges: int) -> None:
        # values in [3*4^n/2, 3*4^n*2) map to level n (s2fractal.cc:67-70)
        self.set_min_level(round(0.5 * math.log2(min_edges / 3)))

    def set_level_for_approx_max_edges(self, max_edges: int) -> None:
        self.set_max_level(round(0.5 * math.log2(max_edges / 3)))

    # ---- radius envelope (s2fractal.cc:77-105)
    def min_radius_factor(self) -> float:
        k_min_dim = 1.0852230903040407
        if self.dimension >= k_min_dim:
            return math.sqrt(1 + 3 * self.edge_fraction * (self.edge_fraction - 1))
        return 0.5

    def max_radius_factor(self) -> float:
        return max(1.0, self.offset_fraction * math.sqrt(3) + 0.5)

    # ---- vertex generation (s2fractal.cc:107-142)
    def _r2_vertices(self) -> np.ndarray:
        v0 = np.array([1.0, 0.0])
        v1 = np.array([-0.5, math.sqrt(3) / 2])
        v2 = np.array([-0.5, -math.sqrt(3) / 2])
        out: list[np.ndarray] = []
        self._subdivide(v0, v1, 0, out)
        self._subdivide(v1, v2, 0, out)
        self._subdivide(v2, v0, 0, out)
        return np.asarray(out)

    def _subdivide(self, v0: np.ndarray, v4: np.ndarray, level: int,
                   out: list[np.ndarray]) -> None:
        levels_remaining = self.max_level_ - level + 1
        if level >= self.min_level_ and (
            self._rng.uniform() < 1.0 / levels_remaining
        ):
            out.append(v0)
            return
        d = v4 - v0
        ortho = np.array([-d[1], d[0]])  # Vector2::Ortho, vector.h:412
        v1 = v0 + self.edge_fraction * d
        v2 = 0.5 * (v0 + v4) - self.offset_fraction * ortho
        v3 = v4 - self.edge_fraction * d
        self._subdivide(v0, v1, level + 1, out)
        self._subdivide(v1, v2, level + 1, out)
        self._subdivide(v2, v3, level + 1, out)
        self._subdivide(v3, v4, level + 1, out)

    def make_vertices(self, frame: np.ndarray, nominal_radius_rad: float
                      ) -> np.ndarray:
        """The loop vertices on the sphere (s2fractal.cc:144-154): each
        R2 vertex v maps to FromFrame(frame, (v.x*r, v.y*r, 1))."""
        r2 = self._r2_vertices()
        r = nominal_radius_rad
        local = np.concatenate(
            [r2 * r, np.ones((len(r2), 1))], axis=1
        )
        pts = local @ frame.T
        return pts / np.linalg.norm(pts, axis=1, keepdims=True)

    def make_loop(self, frame: np.ndarray, nominal_radius_rad: float) -> Loop:
        return Loop(self.make_vertices(frame, nominal_radius_rad))
