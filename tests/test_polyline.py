"""S2Polyline Project/UnInterpolate/Intersects/SubsampleVertices —
fixtures ported from s2polyline_test.cc (lines 278-510)."""

import math

import numpy as np

from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.polyline import (
    polylines_intersect,
    project,
    subsample_vertices,
    uninterpolate,
)


def _pts(s: str) -> np.ndarray:
    return parse_points(s)


def _pt(lat, lng) -> np.ndarray:
    x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
    return np.array([float(x), float(y), float(z)])


def test_project():
    # s2polyline_test.cc:305-336
    line = _pts("0:0, 0:1, 0:2, 1:2")
    cases = [
        ((0.5, -0.5), (0, 0), 1),
        ((0.5, 0.5), (0, 0.5), 1),
        ((0.5, 1), (0, 1), 2),
        ((-0.5, 2.5), (0, 2), 3),
        ((2, 2), (1, 2), 4),
    ]
    for (plat, plng), (elat, elng), env in cases:
        got, nxt = project(line, _pt(plat, plng))
        exp = _pt(elat, elng)
        assert float(((got - exp) ** 2).sum()) < 1e-20, (plat, plng, got)
        assert nxt == env, (plat, plng, nxt, env)


def test_uninterpolate():
    # s2polyline_test.cc:278-303
    from s2geometry_spark.kernel.measures import polyline_interpolate

    one = np.array([[1.0, 0.0, 0.0]])
    assert uninterpolate(one, np.array([0.0, 1.0, 0.0]), 1) == 0.0

    v = np.array(
        [
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 1.0, 1.0] / np.sqrt(2.0),
            [0.0, 0.0, 1.0],
        ]
    )
    for frac, expect in [(0.0, 0.0), (0.5, 0.5), (0.75, 0.75), (1.1, 1.0)]:
        p = polyline_interpolate(v, frac)
        # next_vertex: index of vertex after p along the line
        seg = [0.0]
        from s2geometry_spark.kernel.measures import stable_angle

        acc = 0.0
        total = float(stable_angle(v[:-1], v[1:]).sum())
        target = min(max(frac, 0.0), 1.0) * total
        nxt = 1
        for i in range(len(v) - 1):
            d = float(stable_angle(v[i], v[i + 1]))
            if acc + d >= target or i == len(v) - 2:
                nxt = i + 1
                break
            acc += d
        # match the reference convention: next_vertex in [1, n-1]
        got = uninterpolate(v, p, max(1, nxt))
        assert abs(got - expect) < 1e-12, (frac, got)
    assert uninterpolate(v, np.array([0.0, 1.0, 0.0]), len(v) - 1) <= 1.0


def test_intersects():
    # s2polyline_test.cc:376-420
    line1 = _pts("1:1, 4:4")
    assert polylines_intersect(line1, _pts("1:2, 2:1"))
    assert not polylines_intersect(line1, _pts("1:2, 2:3"))
    assert polylines_intersect(line1, _pts("1:2, 2:3, 4:3"))
    assert not polylines_intersect(line1, _pts("1:1"))
    # at a shared vertex
    l1 = _pts("1:1, 4:4, 4:6")
    assert polylines_intersect(l1, _pts("1:1, 1:2"))
    assert polylines_intersect(l1, _pts("5:1, 4:4, 2:2"))
    # vertex on edge
    hlr = _pts("0:1, 0:3")
    vbt = _pts("-1:2, 0:2, 1:2")
    hrl = _pts("0:3, 0:1")
    vtb = _pts("1:2, 0:2, -1:2")
    assert polylines_intersect(hlr, vbt)
    assert polylines_intersect(hlr, vtb)
    assert polylines_intersect(hrl, vbt)
    assert polylines_intersect(hrl, vtb)


def _check_subsample(s: str, tol_deg: float, expected: str):
    v = _pts(s) if s else np.zeros((0, 3))
    got = subsample_vertices(v, math.radians(tol_deg))
    assert ",".join(str(i) for i in got) == expected, (s, tol_deg, got)


def test_subsample_trivial():
    # s2polyline_test.cc:455-476
    _check_subsample("", 1.0, "")
    _check_subsample("0:1", 1.0, "0")
    _check_subsample("10:10, 11:11", 5.0, "0,1")
    _check_subsample("-1:0, 0:0, 1:0", 1e-15, "0,2")
    _check_subsample("-1:0, 0:0, 1:1", 0.0, "0,1,2")
    _check_subsample("-1:0, 0:0, 1:1", -1.0, "0,1,2")
    _check_subsample("0:1, 0:2, 0:3, 0:4, 0:5", 1.0, "0,4")
    _check_subsample("0:1, 0:1, 0:1, 0:2", 0.0, "0,3")


def test_subsample_simple_example():
    # s2polyline_test.cc:478-485
    s = "0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4"
    _check_subsample(s, 3.0, "0,9")
    _check_subsample(s, 2.0, "0,6,9")
    _check_subsample(s, 0.9, "0,2,6,9")
    _check_subsample(s, 0.4, "0,1,2,3,4,6,9")
    _check_subsample(s, 0, "0,1,2,3,4,5,6,7,8,9")


def test_subsample_guarantees():
    # s2polyline_test.cc:487-508
    _check_subsample("10:10, 12:12, 10:10", 5.0, "0")
    _check_subsample("0:0, 1:1, 0:0, 0:120, 0:130", 5.0, "0,3,4")
    _check_subsample(
        "90:0, 50:180, 20:180, -20:180, -50:180, -90:0, 30:0, 90:0",
        5.0, "0,2,4,5,6,7",
    )
    _check_subsample("10:10, 10:20, 10:30, 10:15, 10:40", 5.0, "0,2,3,4")
    _check_subsample("10:10, 10:20, 10:30, 10:10, 10:30, 10:40", 5.0, "0,2,3,5")
    _check_subsample("10:10, 12:12, 9:9, 10:20, 10:30", 5.0, "0,4")


def test_get_length_and_centroid():
    """s2polyline_test.cc GetLengthAndCentroid: random great circles
    split into random segments."""
    import math

    from s2geometry_spark.kernel.fractal import frame_at, random_point
    from s2geometry_spark.kernel.polyline import get_centroid, get_length

    rng = np.random.RandomState(81)
    for _ in range(50):
        frame = frame_at(rng, random_point(rng))
        x, y = frame[:, 0], frame[:, 1]
        vertices = []
        theta = 0.0
        while theta < 2 * math.pi:
            p = math.cos(theta) * x + math.sin(theta) * y
            if not vertices or not np.array_equal(p, vertices[-1]):
                vertices.append(p)
            theta += rng.uniform() ** 10
        vertices.append(vertices[0])
        v = np.asarray(vertices)
        assert abs(get_length(v) - 2 * math.pi) <= 2e-14
        assert np.linalg.norm(get_centroid(v)) <= 2e-14


def test_interpolate():
    """s2polyline_test.cc Interpolate incl. fraction-near-1 rounding."""
    import math

    from s2geometry_spark.kernel.polyline import get_suffix, interpolate

    def norm(v):
        v = np.asarray(v, float)
        return v / np.linalg.norm(v)

    vertices = np.array([
        [1.0, 0, 0], [0.0, 1, 0], norm([0, 1, 1]), [0.0, 0, 1],
    ])
    assert np.array_equal(interpolate(vertices, -0.1), vertices[0])
    assert np.allclose(
        interpolate(vertices, 0.1),
        norm([1, math.tan(0.2 * math.pi / 2), 0]), atol=1e-14,
    )
    assert np.allclose(interpolate(vertices, 0.25), norm([1, 1, 0]),
                       atol=1e-14)
    assert np.allclose(interpolate(vertices, 0.5), vertices[1], atol=1e-15)
    assert np.allclose(interpolate(vertices, 0.75), vertices[2], atol=1e-14)
    p, nxt = get_suffix(vertices, -0.1)
    assert np.array_equal(p, vertices[0]) and nxt == 1
    p, nxt = get_suffix(vertices, 0.75)
    assert np.allclose(p, vertices[2], atol=1e-14) and nxt == 3
    p, nxt = get_suffix(vertices, 1.1)
    assert np.array_equal(p, vertices[3]) and nxt == 4

    short = np.array([
        norm([1, 1, 1]), norm([1, 1, 1 + 1e-15]), norm([1, 1, 1 + 2e-15]),
    ])
    p, nxt = get_suffix(short, 1.0 - 2e-16)
    assert np.array_equal(p, short[2]) and nxt == 3


def test_is_on_right():
    """s2polyline_test.cc IsOnRight incl. interior-vertex case."""
    from s2geometry_spark.kernel.contains import parse_points
    from s2geometry_spark.kernel.polyline import is_on_right

    line = parse_points("0:0, 0:1, 0:2, 1:2")
    pt = lambda s: parse_points(s)[0]
    assert is_on_right(line, pt("-0.5:0.5"))
    assert not is_on_right(line, pt("0.5:-0.5"))
    assert not is_on_right(line, pt("0.5:0.5"))
    assert not is_on_right(line, pt("0.5:1"))
    assert is_on_right(line, pt("-0.5:2.5"))
    assert is_on_right(line, pt("1.5:2.5"))

    line2 = parse_points("0:0, 0:1, -1:0")
    assert not is_on_right(line2, pt("-0.5:5"))
    assert not is_on_right(line2, pt("5.5:5"))


# ----------------------------- NearlyCovers (S2PolylineCoveringTest)


def _nc(a_str: str, b_str: str, max_error_deg: float,
        b_covers_a: bool, a_covers_b: bool):
    """TestNearlyCovers (s2polyline_test.cc:667-678)."""
    import math

    from s2geometry_spark.kernel.contains import parse_points
    from s2geometry_spark.kernel.polyline import nearly_covers

    a = parse_points(a_str) if a_str else np.zeros((0, 3))
    b = parse_points(b_str) if b_str else np.zeros((0, 3))
    e = math.radians(max_error_deg)
    assert nearly_covers(b, a, e) == b_covers_a, (a_str, b_str)
    assert nearly_covers(a, b, e) == a_covers_b, (a_str, b_str)


def test_polyline_overlaps_self():
    _nc("1:1, 2:2, -1:10", "1:1, 2:2, -1:10", 1e-10, True, True)


def test_polyline_does_not_overlap_reverse():
    _nc("1:1, 2:2, -1:10", "-1:10, 2:2, 1:1", 1e-10, False, False)


def test_polyline_overlaps_equivalent():
    _nc("1:1, 2:1", "1:1, 1.5:1, 2:1", 1e-10, True, True)


def test_short_covered_by_long():
    _nc("-5:1, 10:1, 10:5, 5:10", "9:1, 9.9995:1, 10.0005:5",
        1e-3, False, True)


def test_partial_overlap_only():
    _nc("-5:1, 10:1", "0:1, 20:1", 1.0, False, False)


def test_short_backtracking():
    t1 = "0:0, 0:2, 0:1, 0:4, 0:5"
    t2 = "0:0, 0:2, 0:4, 0:3, 0:5"
    _nc(t1, t2, 1.5, True, True)
    _nc(t1, t2, 0.5, False, False)


def test_long_backtracking():
    _nc("5:1, -5:1", "1:1, 3:1", 1.0, False, False)
    _nc("5:1, -5:1", "1:1, 3:1", 2.5, False, True)


def test_is_resilient_to_duplicate_points():
    _nc("0:1, 0:2, 0:2, 0:3", "0:1, 0:1, 0:1, 0:3", 1e-10, True, True)


def test_can_choose_between_two_potential_starting_points():
    _nc("0:11, 0:0, 0:9, 0:20", "0:10, 0:15", 1.5, False, True)


def test_straight_and_wiggly_polylines_cover_each_other():
    _nc("40:1, 20:1",
        "39.9:0.9, 40:1.1, 30:1.15, 29:0.95, 28:1.1, 27:1.15, "
        "26:1.05, 25:0.85, 24:1.1, 23:0.9, 20:0.99",
        0.2, True, True)


def test_match_starts_at_last_vertex():
    _nc("0:0, 0:2", "0:2, 0:3", 1.5, False, True)


def test_match_starts_at_duplicated_last_vertex():
    _nc("0:0, 0:2, 0:2, 0:2", "0:2, 0:3", 1.5, False, True)


def test_empty_polylines_covering():
    _nc("0:1, 0:2", "", 0.0, False, True)
    _nc("", "", 0.0, True, True)


def test_approx_equals():
    """ApproxEquals (s2polyline_test.cc TEST ApproxEquals): all four
    reference cases."""
    import math

    from s2geometry_spark.kernel.contains import parse_points
    from s2geometry_spark.kernel.polyline import approx_equals

    def ae(a, b, deg):
        return approx_equals(parse_points(a), parse_points(b),
                             math.radians(deg))

    # close lines, differences within / outside max_error
    assert ae("0:0, 0:10, 5:5", "0:0.1, -0.1:9.9, 5:5.2", 0.5)
    assert not ae("0:0, 0:10, 5:5", "0:0.1, -0.1:9.9, 5:5.2", 0.01)
    # same line, different number of vertices
    assert not ae("0:0, 0:10, 0:20", "0:0, 0:20", 0.1)
    # same vertices in a different order
    assert not ae("0:0, 5:5, 0:10", "5:5, 0:10, 0:0", 0.1)


def test_get_snap_level():
    """GetSnapLevel (s2polyline_test.cc): same-level cell centers report
    that level; mixed levels or unsnapped vertices report -1."""
    from s2geometry_spark.kernel import cellid as cid_np
    from s2geometry_spark.kernel.cid import CID
    from s2geometry_spark.kernel.polyline import get_snap_level

    def center(lat, lng, level):
        leaf = cid_np.from_point(*[np.array([c]) for c in _pts(f"{lat}:{lng}")[0]])
        cid = CID(int(leaf[0])).parent(level)
        x, y, z = cid_np.to_point(np.array([cid.id], dtype=np.uint64))
        return np.array([x[0], y[0], z[0]])

    assert get_snap_level(
        np.stack([center(10, 10, 20), center(20, 20, 20)])) == 20
    assert get_snap_level(
        np.stack([center(10, 10, 20), center(20, 20, 22)])) == -1
    assert get_snap_level(_pts("10:10, 20:20")) == -1


def test_init_to_simplified():
    """InitToSimplified (s2polyline_test.cc): leaf-level snap +
    simplify keeps all 4 vertices, stays within E7(1), and reports
    snap level kMaxLevel."""
    from s2geometry_spark.kernel.builder import S2CellIdSnapFunction
    from s2geometry_spark.kernel.polyline import (
        approx_equals,
        get_snap_level,
        init_to_simplified,
    )

    original = _pts("10:10, 20:20, 20:30, 10:40")
    snapped = init_to_simplified(original, S2CellIdSnapFunction(30))
    assert len(snapped) == len(original)
    assert approx_equals(snapped, original, math.radians(1e-7))
    assert get_snap_level(snapped) == 30
