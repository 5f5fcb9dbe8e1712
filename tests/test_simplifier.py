"""PolylineSimplifier kernel tests — port of s2polyline_simplifier_test.cc
(Src, Reuse, NoConstraints, TargetOnePoint, AvoidOnePoint,
AvoidSeveralPoints, TargetAndAvoid at :58-158, Precision property at
:160-230 with our own rng per FIXTURES.md policy)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.simplifier import (
    PolylineSimplifier,
    angle_to_chord2,
    simplify_polyline_indices,
)


def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
    return np.array([x, y, z], dtype=float)


def _parse(spec: str) -> list[np.ndarray]:
    """s2textformat "lat:lng, lat:lng" point list."""
    pts = []
    for tok in spec.split(","):
        tok = tok.strip()
        if not tok:
            continue
        lat, lng = tok.split(":")
        pts.append(_pt(float(lat), float(lng)))
    return pts


def _check_simplify(src, dst, target, avoid, disc_on_left, radius_degrees, expected):
    """CheckSimplify (s2polyline_simplifier_test.cc:41-57)."""
    r2 = angle_to_chord2(math.radians(radius_degrees))
    s = PolylineSimplifier()
    s.init(_parse(src)[0])
    for p in _parse(target):
        s.target_disc(p, r2)
    for i, p in enumerate(_parse(avoid)):
        s.avoid_disc(p, r2, disc_on_left[i])
    assert s.extend(_parse(dst)[0]) == expected, (src, dst, target, avoid)


def test_src():
    # s2polyline_simplifier_test.cc:58-62
    s = PolylineSimplifier()
    s.init(np.array([1.0, 0.0, 0.0]))
    assert np.all(s.src == np.array([1.0, 0.0, 0.0]))


def test_reuse():
    # s2polyline_simplifier_test.cc:64-77: init() can be called again
    def norm(v):
        v = np.asarray(v, float)
        return v / np.linalg.norm(v)

    r2 = angle_to_chord2(math.radians(10))
    s = PolylineSimplifier()
    s.init(np.array([1.0, 0.0, 0.0]))
    assert s.target_disc(norm([1, 1, 0]), r2)
    assert s.target_disc(norm([1, 1, 0.1]), r2)
    assert not s.extend(norm([1, 1, 0.4]))

    s.init(np.array([0.0, 1.0, 0.0]))
    assert s.target_disc(norm([1, 1, 0.3]), r2)
    assert s.target_disc(norm([1, 1, 0.2]), r2)
    assert not s.extend(norm([1, 1, 0]))


def test_no_constraints():
    # s2polyline_simplifier_test.cc:79-88
    _check_simplify("0:1", "0:1", "", "", [], 0, True)
    _check_simplify("0:1", "1:0", "", "", [], 0, True)
    # edges longer than 90 degrees are not supported
    _check_simplify("0:0", "0:91", "", "", [], 0, False)


def test_target_one_point():
    # s2polyline_simplifier_test.cc:90-103
    _check_simplify("0:0", "0:2", "0:1", "", [], 1e-10, True)
    _check_simplify("0:0", "0:2", "1:1", "", [], 0.9, False)
    # target disc containing the source vertex
    _check_simplify("0:0", "0:2", "0:0.1", "", [], 1.0, True)
    # target disc containing the destination vertex
    _check_simplify("0:0", "0:2", "0:2.1", "", [], 1.0, True)


def test_avoid_one_point():
    # s2polyline_simplifier_test.cc:105-122
    _check_simplify("0:0", "0:2", "", "0:1", [True], 1e-10, False)
    _check_simplify("0:0", "0:2", "", "1:1", [True], 0.9, True)
    # middle point on the left but required on the right
    _check_simplify("0:0", "0:2", "", "1:1", [False], 1e-10, False)
    # disc behind the source vertex: disc_on_left must not matter
    _check_simplify("0:0", "0:2", "", "1:-1", [False], 1.4, True)
    _check_simplify("0:0", "0:2", "", "1:-1", [True], 1.4, True)
    _check_simplify("0:0", "0:2", "", "-1:-1", [False], 1.4, True)
    _check_simplify("0:0", "0:2", "", "-1:-1", [True], 1.4, True)


def test_avoid_several_points():
    # s2polyline_simplifier_test.cc:124-142: three tiny discs 120° apart,
    # all disc_on_left=True → three ~30° gaps remain; with
    # disc_on_left=False every gap direction is prohibited.
    for dst in ("0:2", "1.732:-1", "-1.732:-1"):
        _check_simplify(
            "0:0", dst, "", "0.01:2, 1.732:-1.01, -1.732:-0.99",
            [True, True, True], 0.00001, True,
        )
        _check_simplify(
            "0:0", dst, "", "0.01:2, 1.732:-1.01, -1.732:-0.99",
            [False, False, False], 0.00001, False,
        )


def test_target_and_avoid():
    # s2polyline_simplifier_test.cc:144-158
    _check_simplify(
        "0:0", "10:10", "2:3, 4:3, 7:8", "4:2, 7:5, 7:9",
        [True, True, False], 1.0, True,
    )
    # one targeted point 1.4 degrees away
    _check_simplify(
        "0:0", "10:10", "2:3, 4:6, 7:8", "4:2, 7:5, 7:9",
        [True, True, False], 1.0, False,
    )
    # one avoided point 0.7 degrees away
    _check_simplify(
        "0:0", "10:10", "2:3, 4:3, 7:8", "4:2, 6:5, 7:9",
        [True, True, False], 1.0, False,
    )


def _point_on_line(a: np.ndarray, toward: np.ndarray, angle_rad: float) -> np.ndarray:
    """S2::GetPointOnLine semantics: the point at `angle_rad` from `a`
    along the great circle towards `toward`."""
    d = toward - (toward @ a) * a
    nd = np.linalg.norm(d)
    if nd == 0:
        return a.copy()
    d = d / nd
    return math.cos(angle_rad) * a + math.sin(angle_rad) * d


def test_precision_property():
    """Precision (s2polyline_simplifier_test.cc:160-230) as a seeded
    property: target discs centered on a random edge with a generous
    margin must all be accepted and keep extend(dst) true; avoid discs
    that clearly miss the edge on a known side must likewise be
    accepted; and a target disc whose center is clearly farther from
    the edge than its radius must make the final extend(dst) fail."""
    rng = np.random.default_rng(42)
    margin = 1e-6  # radians — far above the 25*DBL_EPSILON error budget
    s = PolylineSimplifier()
    n_good = n_bad = 0
    for _ in range(200):
        src = rng.normal(size=3)
        src /= np.linalg.norm(src)
        toward = rng.normal(size=3)
        toward /= np.linalg.norm(toward)
        edge_len = rng.uniform(0.1, 1.0)
        dst = _point_on_line(src, toward, edge_len)
        n = np.cross(src, dst)
        nn = np.linalg.norm(n)
        if nn < 1e-6:
            continue
        n /= nn

        # Phase 1: constraints the edge truly satisfies, with margin.
        s.init(src)
        ok = True
        for _d in range(4):
            f = rng.uniform(0.05, 0.95)
            a = (1 - f) * src + f * dst
            a /= np.linalg.norm(a)
            if rng.integers(0, 2):
                # disc centered ON the edge, radius >> error → must accept
                r = rng.uniform(margin, 0.05)
                ok = s.target_disc(a, angle_to_chord2(r)) and ok
            else:
                # disc separated from the edge by 2*r → must accept
                on_left = bool(rng.integers(0, 2))
                sep = rng.uniform(0.02, 0.2)
                x = _point_on_line(a, a + (n if on_left else -n), sep)
                ok = s.avoid_disc(x, angle_to_chord2(sep / 2), on_left) and ok
        assert ok
        assert s.extend(dst)
        n_good += 1

        # Phase 2: a clearly-violated target makes extend(dst) fail.
        s.init(src)
        f = rng.uniform(0.3, 0.9)
        a = (1 - f) * src + f * dst
        a /= np.linalg.norm(a)
        off = rng.uniform(0.1, 0.3)
        x = _point_on_line(a, a + n, off)
        accepted = s.target_disc(x, angle_to_chord2(off / 4))
        assert (not accepted) or (not s.extend(dst))
        n_bad += 1
    assert n_good > 150 and n_bad > 150


def test_simplify_polyline_indices_straight_line():
    """Driver walk (header usage sketch s2polyline_simplifier.h:28-41):
    a polyline of 11 nearly-collinear vertices collapses to its
    endpoints, while a 1°-amplitude zigzag at a tight tolerance keeps
    interior vertices."""
    line = np.array([_pt(0, i * 0.5) for i in range(11)])
    kept = simplify_polyline_indices(line, math.radians(0.01))
    assert kept == [0, 10]

    zig = np.array([_pt((i % 2) * 1.0, i * 0.5) for i in range(11)])
    kept = simplify_polyline_indices(zig, math.radians(0.01))
    assert kept[0] == 0 and kept[-1] == 10
    assert len(kept) == 11  # every vertex is load-bearing at 0.01°

    # generous tolerance swallows the zigzag
    kept = simplify_polyline_indices(zig, math.radians(5.0))
    assert len(kept) < 11


def test_simplify_polyline_indices_avoid():
    """Avoid discs force extra breakpoints: simplifying a straight line
    that passes near an avoided point keeps a vertex to route around
    it (AvoidDisc contract, s2polyline_simplifier.h:88-114)."""
    line = np.array([_pt(0, i * 1.0) for i in range(6)])
    plain = simplify_polyline_indices(line, math.radians(0.5))
    assert plain == [0, 5]
    avoid = np.array([_pt(0.05, 2.5)])
    kept = simplify_polyline_indices(
        line, math.radians(0.5), avoid=avoid, avoid_on_left=np.array([True])
    )
    assert kept[0] == 0 and kept[-1] == 5
    assert len(kept) >= 3


class TestSimplifyEdgeChains:
    """simplify_snapped_polylines vs the reference's
    simplify_edge_chains outputs (s2builder_test.cc:866-1020) — expected
    vertex lists are the reference tests' pinned outputs."""

    @staticmethod
    def _run(polyline_lls, snap):
        from s2geometry_spark.kernel.builder import simplify_snapped_polylines
        from s2geometry_spark.kernel.coords import xyz_to_latlng

        polys = [
            np.array([_pt(lat, lng) for lat, lng in ll]) for ll in polyline_lls
        ]
        out = simplify_snapped_polylines(polys, snap)
        res = []
        for c in out:
            lat, lng = xyz_to_latlng(c[:, 0], c[:, 1], c[:, 2])
            res.append([(round(a, 6), round(b, 6)) for a, b in zip(lat, lng)])
        return res

    def test_simplify_one_edge(self):
        # s2builder_test.cc:866-874
        from s2geometry_spark.kernel.builder import IdentitySnapFunction

        out = self._run(
            [[(0, 0), (1, 0.5), (2, -0.5), (3, 0.5), (4, -0.5), (5, 0)]],
            IdentitySnapFunction(math.radians(1)),
        )
        assert out == [[(0, 0), (5, 0)]]

    def test_simplify_nearly_antipodal(self):
        # s2builder_test.cc:876-885: nothing goes wrong on a nearly
        # antipodal edge (result unchanged)
        from s2geometry_spark.kernel.builder import IdentitySnapFunction

        out = self._run(
            [[(0, 180), (0, 1e-09), (32, 32)]], IdentitySnapFunction(math.radians(1))
        )
        assert len(out[0]) == 3
        assert out[0][0] == (0, 180) and out[0][2] == (32, 32)

    def test_simplify_one_loop_closed_polyline(self):
        # s2builder_test.cc:901-929 adapted to a closed polyline: a
        # 1000-vertex regular loop of radius 20° simplifies to ~10-12
        # vertices at snap radius 1° (vs ~95 for snapping alone),
        # because simplify targets input *edges* not just vertices.
        from s2geometry_spark.kernel.builder import IdentitySnapFunction

        n = 1000
        radius = math.radians(20)
        # regular loop around the z axis at colatitude 20°
        ring = []
        for i in range(n + 1):  # closed: last vertex == first
            theta = 2 * math.pi * (i % n) / n
            ring.append(
                (
                    90 - math.degrees(radius),
                    math.degrees(theta) - 180,
                )
            )
        # build directly in xyz to make a true spherical circle
        pts = []
        for i in range(n + 1):
            theta = 2 * math.pi * (i % n) / n
            pts.append(
                np.array(
                    [
                        math.sin(radius) * math.cos(theta),
                        math.sin(radius) * math.sin(theta),
                        math.cos(radius),
                    ]
                )
            )
        from s2geometry_spark.kernel.builder import simplify_snapped_polylines

        out = simplify_snapped_polylines(
            [np.asarray(pts)], IdentitySnapFunction(math.radians(1))
        )
        n_out = len(out[0])
        assert 10 <= n_out <= 14, n_out

    def test_simplify_opposite_directions(self):
        # s2builder_test.cc:931-945: two polylines following the same arc
        # in opposite directions snap identically (long edge + short edge)
        from s2geometry_spark.kernel.builder import IdentitySnapFunction

        out = self._run(
            [
                [(-4, 0.83), (-3, 0.46), (-2, 0.2), (-1, 0.05), (0, 0),
                 (1, 0.5), (2, 0.2), (3, 0.46), (4, 0.83)],
                [(4, 0.83), (3, 0.46), (2, 0.2), (1, 0.05), (0, 0),
                 (-1, 0.5), (-2, 0.2), (-3, 0.46), (-4, 0.83)],
            ],
            IdentitySnapFunction(math.radians(0.5)),
        )
        assert out[0] == [(-4, 0.83), (-2, 0.2), (4, 0.83)]
        assert out[1] == [(4, 0.83), (-2, 0.2), (-4, 0.83)]

    def test_simplify_keeps_edge_vertex_separation(self):
        # s2builder_test.cc:947-958: polyline 1 cannot straighten because
        # it would approach polyline 2 too closely
        from s2geometry_spark.kernel.builder import IdentitySnapFunction

        out = self._run(
            [
                [(0, -10), (0.99, 0), (0, 10)],
                [(-5, -5), (-0.2, 0), (-5, 5)],
            ],
            IdentitySnapFunction(math.radians(1.0)),
        )
        assert out[0] == [(0, -10), (0.99, 0), (0, 10)]
        assert out[1] == [(-5, -5), (-0.2, 0), (-5, 5)]

    def test_simplify_backtracking_edge_chain(self):
        # s2builder_test.cc:960-972: backtracking prevents simplification
        # across the turn vertices (parametric, not geometric,
        # approximation)
        from s2geometry_spark.kernel.builder import IdentitySnapFunction

        out = self._run(
            [[(0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (4, 0),
              (3, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (7, 0)]],
            IdentitySnapFunction(math.radians(0.5)),
        )
        assert out[0] == [(0, 0), (2, 0), (5, 0), (2, 0), (5, 0), (7, 0)]

    def test_simplify_avoids_backtracking_vertices(self):
        # s2builder_test.cc:974-995: vertex D of the second polyline must
        # be avoided when edge BC is added (AD > AB), so ABC cannot
        # simplify to AC
        from s2geometry_spark.kernel.builder import IdentitySnapFunction

        out = self._run(
            [
                [(0, 0), (1, 0.1), (1, 2)],
                [(0, 1.05), (-10, 1.05)],
            ],
            IdentitySnapFunction(math.radians(1.0)),
        )
        assert out[0] == [(0, 0), (1, 0.1), (1, 2)]
        assert out[1] == [(0, 1.05), (-10, 1.05)]

    def test_simplify_limits_edge_deviation(self):
        # s2builder_test.cc:997-1019: the deviation-split site at the
        # midpoint must NOT be simplified away (max-length check)
        from s2geometry_spark.kernel.builder import IntLatLngSnapFunction

        out = self._run(
            [[(-30.49, -29.51), (29.51, 30.49)]], IntLatLngSnapFunction(0)
        )
        assert out[0] == [(-30, -30), (-1, 1), (30, 30)]


def test_simplify_keeps_forced_vertices():
    """SimplifyKeepsForcedVertices (s2builder_test.cc): a forced vertex
    is never an interior chain vertex, so 0:1 survives while 0:2 is
    simplified away."""
    from s2geometry_spark.kernel.builder import (
        IdentitySnapFunction,
        simplify_snapped_polylines,
    )
    from s2geometry_spark.kernel.contains import format_point, parse_points

    v = parse_points("0:0, 0:1, 0:2, 0:3")
    out = simplify_snapped_polylines(
        [v], IdentitySnapFunction(1e-15), forced=[parse_points("0:1")[0]]
    )
    got = ", ".join(format_point(p) for p in out[0])
    assert got == "0:0, 0:1, 0:3"


def test_simplify_preserves_topology():
    """SimplifyPreservesTopology (s2builder_test.cc): concentric loops
    simplified JOINTLY stay nested and near their inputs.  (Reference:
    20 loops x 1000 vertices; 10 x 250 here with the same ~0.125-degree
    vertex spacing and the same radius schedule.)"""
    from s2geometry_spark.kernel.builder import (
        IdentitySnapFunction,
        init_to_simplified_polygon,
        simplify_snapped_polylines,
    )
    from s2geometry_spark.kernel.contains import Loop, Polygon
    from s2geometry_spark.kernel.fractal import make_regular_points
    from s2geometry_spark.kernel.looprel import boundary_near

    num_loops = 10
    num_vertices = 250
    base_radius = math.radians(5.0)
    snap_radius = math.radians(0.1)
    center = np.array([1.0, 0.0, 0.0])
    inputs = []
    for j in range(num_loops):
        radius = base_radius + 0.7 * j * j / num_loops * snap_radius
        inputs.append(
            np.asarray(make_regular_points(center, radius, num_vertices))
        )
    closed = [np.concatenate([v, v[:1]]) for v in inputs]
    out = simplify_snapped_polylines(closed, IdentitySnapFunction(snap_radius))
    loops = []
    for v in out:
        if len(v) > 1 and np.all(v[0] == v[-1]):
            v = v[:-1]
        assert len(v) >= 3
        loops.append(v.copy())
    from s2geometry_spark.kernel import booleans as B

    for j in range(num_loops):
        assert boundary_near(loops[j], inputs[j], snap_radius), j
        if j > 0:
            # adjacent rings may have snapped onto SHARED sites (their
            # separation is far below the snap radius), so containment
            # uses polygon semantics like the reference's
            # S2Polygon::Contains: inner \ outer must be empty
            assert B.approx_contains(
                Polygon([Loop(loops[j])]), Polygon([Loop(loops[j - 1])]),
                1e-15,
            ), j
