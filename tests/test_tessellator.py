"""Port of s2edge_tessellator_test.cc over kernel/tessellator
(EdgeTessellator + PlateCarree/Mercator projections).

Random-harness iteration counts are reduced from the reference's
(100k/5k/500) to keep Python runtime sane; every deterministic case is
ported verbatim.  IsAssignable is a C++ value-semantics test (N/A)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.distance import update_min_distance
from s2geometry_spark.kernel.tessellator import (
    MIN_TOLERANCE_RAD,
    EdgeTessellator,
    MercatorProjection,
    PlateCarreeProjection,
    Projection,
    _slerp,
)

EARTH_RADIUS_M = 6371010.0


def ll(lat_deg: float, lng_deg: float) -> np.ndarray:
    lat, lng = math.radians(lat_deg), math.radians(lng_deg)
    return np.array(
        [
            math.cos(lat) * math.cos(lng),
            math.cos(lat) * math.sin(lng),
            math.sin(lat),
        ]
    )


def lng_deg(p: np.ndarray) -> float:
    return math.degrees(math.atan2(p[1], p[0]))


def meters_to_rad(m: float) -> float:
    return m / EARTH_RADIUS_M


def angle(x: np.ndarray, y: np.ndarray) -> float:
    return math.atan2(float(np.linalg.norm(np.cross(x, y))), float(x @ y))


class Stats:
    def __init__(self):
        self.max = -math.inf
        self.sum = 0.0
        self.count = 0

    def tally(self, v: float):
        assert not math.isnan(v)
        self.max = max(self.max, v)
        self.sum += v
        self.count += 1


def _unproject_batch(proj, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized Unproject for the two projection types (same math as
    the scalar methods; IEEE remainder = x - round(x/w)*w)."""
    wrap = proj._x_wrap
    rem = xs - np.round(xs / wrap) * wrap
    lng = proj._to_radians * rem
    if isinstance(proj, PlateCarreeProjection):
        lat = proj._to_radians * ys
    else:
        with np.errstate(over="ignore"):
            k = np.exp(2 * proj._to_radians * ys)
        lat = np.where(
            np.isinf(k), math.pi / 2, np.arcsin((k - 1) / (k + 1))
        )
    return np.stack(
        [np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng), np.sin(lat)],
        axis=-1,
    )


def get_max_distance(proj, px, x, py, y, parametric: bool = False) -> float:
    """GetMaxDistance (test.cc:85-109) in radians, vectorized over the
    100 sample fractions."""
    from s2geometry_spark.kernel.distance import point_edge_dist2

    num_steps = 100
    f = (np.arange(num_steps) + 0.5) / num_steps
    xs = (1 - f) * px[0] + f * py[0]
    ys = (1 - f) * px[1] + f * py[1]
    P = _unproject_batch(proj, xs, ys)
    if parametric:
        M = np.stack([_slerp(x, y, t) for t in f])
        dist2 = ((P - M) ** 2).sum(-1)
        max_dist2 = float(dist2.max())
    else:
        max_dist2 = float(
            point_edge_dist2(P, x[None], y[None]).max()
        )
    return 2 * math.asin(0.5 * math.sqrt(min(max_dist2, 4.0)))


MAX_PROJ_ERROR = 3e-14  # kMaxProjError (test.cc:116)


def run_test_unprojected(proj, tolerance, pa, pb_in) -> Stats:
    """TestUnprojected (test.cc:120-153)."""
    tess = EdgeTessellator(proj, tolerance)
    vertices: list = []
    tess.append_unprojected(pa, pb_in, vertices)
    pb = proj.wrap_destination(pa, pb_in)
    assert angle(proj.unproject(pa), vertices[0]) <= MAX_PROJ_ERROR
    assert angle(proj.unproject(pb), vertices[-1]) <= MAX_PROJ_ERROR
    stats = Stats()
    if pa == pb:
        assert len(vertices) == 1
        return stats
    dxy = (pb[0] - pa[0], pb[1] - pa[1])
    nrm = math.hypot(*dxy)
    norm = (-dxy[1] / nrm, dxy[0] / nrm)  # Ortho().Normalize()
    x = vertices[0]
    px = proj.project(x)
    for y in vertices[1:]:
        py = proj.wrap_destination(px, proj.project(y))
        # every vertex lies on the projected edge
        assert abs(
            (py[0] - pa[0]) * norm[0] + (py[1] - pa[1]) * norm[1]
        ) <= 5e-13 * math.hypot(*py)
        stats.tally(get_max_distance(proj, px, x, py, y) / tolerance)
        x, px = y, py
    return stats


def run_test_projected(proj, tolerance, a, b) -> Stats:
    """TestProjected (test.cc:157-195)."""
    tess = EdgeTessellator(proj, tolerance)
    vertices: list = []
    tess.append_projected(a, b, vertices)
    assert angle(a, proj.unproject(vertices[0])) <= MAX_PROJ_ERROR
    assert angle(b, proj.unproject(vertices[-1])) <= MAX_PROJ_ERROR
    stats = Stats()
    if np.array_equal(a, b):
        assert len(vertices) == 1
        return stats
    px = vertices[0]
    x = proj.unproject(px)
    for py in vertices[1:]:
        y = proj.unproject(py)
        # every vertex lies on the geodesic edge
        d2 = update_min_distance(y, a, b)
        assert d2 <= (1e-11) ** 2, math.sqrt(d2)
        stats.tally(get_max_distance(proj, px, x, py, y) / tolerance)
        x, px = y, py
    return stats


def test_tolerance_too_small():
    proj = PlateCarreeProjection(180)
    with pytest.raises(ValueError):
        EdgeTessellator(proj, 0.5 * MIN_TOLERANCE_RAD)


def test_projected_no_tessellation():
    """test.cc:205-211."""
    proj = PlateCarreeProjection(180)
    tess = EdgeTessellator(proj, math.radians(0.01))
    vertices: list = []
    tess.append_projected(np.array([1.0, 0, 0]), np.array([0.0, 1, 0]), vertices)
    assert len(vertices) == 2


def test_unprojected_no_tessellation():
    """test.cc:213-219."""
    proj = PlateCarreeProjection(180)
    tess = EdgeTessellator(proj, math.radians(0.01))
    vertices: list = []
    tess.append_unprojected((0, 30), (0, 50), vertices)
    assert len(vertices) == 2


def test_unprojected_wrapping():
    """test.cc:221-232: edges crossing 180° go the short way."""
    proj = PlateCarreeProjection(180)
    tess = EdgeTessellator(proj, math.radians(0.01))
    vertices: list = []
    tess.append_unprojected((-170, 0), (170, 80), vertices)
    for v in vertices:
        assert abs(lng_deg(v)) >= 170


def test_projected_wrapping():
    """test.cc:234-247: projected vertices may be non-canonical but
    don't jump."""
    proj = PlateCarreeProjection(180)
    tess = EdgeTessellator(proj, math.radians(0.01))
    vertices: list = []
    tess.append_projected(ll(0, -170), ll(0, 170), vertices)
    for v in vertices:
        assert v[0] <= -170


def test_unprojected_wrapping_multiple_crossings():
    """test.cc:249-265."""
    proj = PlateCarreeProjection(180)
    tess = EdgeTessellator(proj, math.radians(0.01))
    vertices: list = []
    lat = 1.0
    while lat <= 60:
        tess.append_unprojected(
            (180 - 0.03 * lat, lat), (-180 + 0.07 * lat, lat), vertices
        )
        tess.append_unprojected(
            (-180 + 0.07 * lat, lat), (180 - 0.03 * (lat + 1), lat + 1),
            vertices,
        )
        lat += 1
    for v in vertices:
        assert abs(lng_deg(v)) >= 175


def test_projected_wrapping_multiple_crossings():
    """test.cc:267-290: loop crossing 180° four times; lng range is
    exactly [160, 640]."""
    pts = [
        ll(*p)
        for p in (
            (0, 160),
            (0, -40),
            (0, 120),
            (0, -80),
            (10, 120),
            (10, -40),
            (0, 160),
        )
    ]
    proj = PlateCarreeProjection(180)
    tess = EdgeTessellator(proj, math.radians(1e-7))
    vertices: list = []
    for i in range(len(pts) - 1):
        tess.append_projected(pts[i], pts[i + 1], vertices)
    assert vertices[0] == vertices[-1]
    lngs = [v[0] for v in vertices]
    assert min(lngs) == 160
    assert max(lngs) == 640


def test_infinite_recursion_bug():
    """test.cc:292-300: terminates with a bounded vertex count (the
    reference's exact count is 36; ulp-level interpolation differences
    can shift the split points by one)."""
    proj = PlateCarreeProjection(180)
    one_micron = 1e-6 / 6371.0
    tess = EdgeTessellator(proj, one_micron)
    vertices: list = []
    tess.append_projected(ll(3, 21), ll(1, -159), vertices)
    assert 30 <= len(vertices) <= 40
    # and the chain meets the tolerance
    stats = run_test_projected(proj, one_micron, ll(3, 21), ll(1, -159))
    assert stats.max <= 1.0


def test_unprojected_accuracy():
    """test.cc:302-308."""
    proj = MercatorProjection(180)
    stats = run_test_unprojected(
        proj, math.radians(1e-5), (0, 0), (89.999999, 179)
    )
    assert stats.max <= 1.0


def test_unprojected_accuracy_cross_equator():
    """test.cc:311-317."""
    proj = MercatorProjection(180)
    stats = run_test_unprojected(
        proj, math.radians(1e-5), (-10, -10), (10, 10)
    )
    assert stats.max < 1.0


def test_projected_accuracy():
    """test.cc:319-326."""
    proj = PlateCarreeProjection(180)
    stats = run_test_projected(
        proj, math.radians(1e-7), ll(-89.999, -170), ll(50, 100)
    )
    assert stats.max <= 1.0


def test_unprojected_accuracy_midpoint_equator():
    """test.cc:328-334."""
    proj = PlateCarreeProjection(180)
    stats = run_test_unprojected(
        proj, meters_to_rad(1), (80, 50), (-80, -50)
    )
    assert stats.max <= 1.0


def test_projected_accuracy_midpoint_equator():
    """test.cc:336-343."""
    proj = PlateCarreeProjection(180)
    stats = run_test_projected(
        proj, meters_to_rad(1), ll(50, 80), ll(-50, -80)
    )
    assert stats.max <= 1.0


def test_projected_accuracy_cross_equator():
    """test.cc:346-353."""
    proj = PlateCarreeProjection(180)
    stats = run_test_projected(
        proj, math.radians(1e-7), ll(-20, -20), ll(20, 20)
    )
    assert stats.max < 1.0


def test_projected_accuracy_seattle_to_new_york():
    """test.cc:355-362."""
    proj = PlateCarreeProjection(180)
    stats = run_test_projected(
        proj,
        meters_to_rad(1),
        ll(47.6062, -122.3321),
        ll(40.7128, -74.0059),
    )
    assert stats.max <= 1.0


def _random_point(rng) -> np.ndarray:
    p = rng.standard_normal(3)
    return p / np.linalg.norm(p)


def run_test_edge_error(proj, t: float, iters: int, seed: int):
    """TestEdgeError (test.cc:379-442), reduced iterations."""
    x = 1 - 2 * t
    dlat = math.sin(0.5 * math.pi / 4 * (1 - x))
    dlng = math.sin(math.pi / 4 * (1 - x))
    dsin2 = dlat * dlat + dlng * dlng * math.sin(math.pi / 4 * x) * math.sqrt(0.5)
    dsin2_max = 0.5 * (1 - math.sqrt(0.5))
    scale_factor = max(
        (2 * math.sqrt(3) / 9) / (x * (1 - x * x)),
        math.asin(math.sqrt(dsin2_max)) / math.asin(math.sqrt(dsin2)),
    )
    rng = np.random.default_rng(seed)
    stats_g = Stats()
    for _ in range(iters):
        a = _random_point(rng)
        b = _random_point(rng)
        if float(a @ b) < -1e-14:
            continue
        pa = proj.project(a)
        pb = proj.wrap_destination(pa, proj.project(b))
        max_dist_g = get_max_distance(proj, pa, a, pb, b)
        if max_dist_g <= MIN_TOLERANCE_RAD:
            continue
        d1 = angle(_slerp(a, b, t), proj.unproject(Projection.interpolate(t, pa, pb)))
        d2 = angle(
            _slerp(a, b, 1 - t),
            proj.unproject(Projection.interpolate(1 - t, pa, pb)),
        )
        dist = scale_factor * max(1e-300, max(d1, d2))
        stats_g.tally(max_dist_g / dist)
    assert stats_g.max <= scale_factor


BEST_FRACTION = 0.31215691082248312


def test_max_edge_error_plate_carree():
    run_test_edge_error(PlateCarreeProjection(180), BEST_FRACTION, 2000, 11)


def test_max_edge_error_mercator():
    run_test_edge_error(MercatorProjection(180), BEST_FRACTION, 2000, 12)


def run_test_random_edges(proj, tolerance, seed: int, iters: int = 50):
    """TestRandomEdges (test.cc:469-484)."""
    rng = np.random.default_rng(seed)
    max_r2 = 0.0
    max_s2 = 0.0
    for _ in range(iters):
        a = _random_point(rng)
        b = _random_point(rng)
        max_r2 = max(max_r2, run_test_projected(proj, tolerance, a, b).max)
        pa = proj.project(a)
        pb = proj.project(b)
        max_s2 = max(
            max_s2, run_test_unprojected(proj, tolerance, pa, pb).max
        )
    assert max_r2 <= 1.0
    assert max_s2 <= 1.0


def test_random_edges_plate_carree():
    run_test_random_edges(PlateCarreeProjection(180), meters_to_rad(100), 21)


def test_random_edges_mercator():
    run_test_random_edges(MercatorProjection(180), meters_to_rad(100), 22)


def test_unprojected_accuracy_random_check():
    """test.cc:504-519, 300 iterations."""
    rng = np.random.default_rng(31)
    proj = PlateCarreeProjection(180)
    tolerance = math.radians(1e-3)
    for _ in range(300):
        alat = rng.uniform(-89.99, 89.99)
        blat = rng.uniform(-89.99, 89.99)
        blon = rng.uniform(0.0, 179.0)
        stats = run_test_unprojected(proj, tolerance, (0, alat), (blon, blat))
        assert stats.max < 1.0


def test_projected_accuracy_random_check():
    """test.cc:522-538, 300 iterations."""
    rng = np.random.default_rng(32)
    proj = PlateCarreeProjection(180)
    tolerance = math.radians(1e-3)
    for _ in range(300):
        alat = rng.uniform(-89.99, 89.99)
        blat = rng.uniform(-89.99, 89.99)
        blon = rng.uniform(-180.0, 180.0)
        stats = run_test_projected(proj, tolerance, ll(alat, 0), ll(blat, blon))
        assert stats.max < 1.0


def test_unwrapping_dcheck_regression():
    """test.cc:540-575: no tessellation and no chain-assert failures on
    a chain hugging the antimeridian."""
    points = [
        (-16.876721435218865253, -179.986547984808964884),
        (-16.874909244632696925, -179.991889238369623172),
        (-16.880241814330226191, -179.990858688466971671),
        (-16.883762104047619346, -179.995169553755403058),
        (-16.881949690252106677, +179.999489074621124018),
        (-16.876617071405430437, +179.998458788144517939),
        (-16.880137137875717457, +179.994147804931060364),
        (-16.878324446969305228, +179.988806637264332267),
        (-16.872991774409559440, +179.987776672537478362),
        (-16.869471841739493101, +179.992087611973005323),
        (-16.867659097232969856, +179.986746766061799008),
        (-16.862326415537093993, +179.985716917832945683),
        (-16.858806527326652969, +179.990027652027180238),
        (-16.860619186956174786, +179.995368278278732532),
        (-16.855286549828541354, +179.994338224830613626),
        (-16.851766483129139829, +179.998648636203512297),
        (-16.849953908374558864, +179.993308229628894424),
    ]
    proj = MercatorProjection(0.5)
    tess = EdgeTessellator(proj, math.radians(1e-7))
    vertices: list = []
    for i in range(len(points) - 1):
        tess.append_projected(
            ll(*points[i]), ll(*points[i + 1]), vertices
        )
    assert len(vertices) == 17
