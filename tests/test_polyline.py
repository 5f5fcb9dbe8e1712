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
