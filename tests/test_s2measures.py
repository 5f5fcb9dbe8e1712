"""s2measures_test.cc port: Angle/TurnAngle identities and the Area
stress matrix (relative accuracy at 1e-30 scale, GirardArea robustness
via RobustCrossProd, quarter/hemisphere summation, the zero-area
regression B229644268).
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.fractal import random_point
from s2geometry_spark.kernel.measures import girard_area, triangle_area, turn_angle

PZ = np.array([0.0, 0.0, 1.0])
P000 = np.array([1.0, 0.0, 0.0])
P045 = np.array([1.0, 1.0, 0.0]) / math.sqrt(2)
P090 = np.array([0.0, 1.0, 0.0])
P180 = np.array([-1.0, 0.0, 0.0])


def _norm(v):
    v = np.asarray(v, float)
    return v / np.linalg.norm(v)


def angle(a, b, c) -> float:
    """S2::Angle at vertex b."""
    u = np.cross(np.asarray(a, float), np.asarray(b, float))
    v = np.cross(np.asarray(c, float), np.asarray(b, float))
    return math.atan2(float(np.linalg.norm(np.cross(u, v))), float(u @ v))


def area(a, b, c) -> float:
    return float(triangle_area(a, b, c))


def test_angle_methods():
    assert abs(angle(P000, PZ, P045) - math.pi / 4) < 1e-14
    assert abs(turn_angle(P000, PZ, P045) - (-3 * math.pi / 4)) < 1e-14
    assert abs(angle(P045, PZ, P180) - 3 * math.pi / 4) < 1e-14
    assert abs(angle(P000, PZ, P180) - math.pi) < 1e-14
    assert abs(turn_angle(P000, PZ, P180)) < 1e-14
    assert abs(angle(PZ, P000, P045) - math.pi / 2) < 1e-14
    assert abs(turn_angle(PZ, P000, P045) - math.pi / 2) < 1e-14
    assert angle(PZ, P000, PZ) == 0
    assert abs(abs(turn_angle(PZ, P000, PZ)) - math.pi) < 1e-14


def test_area_methods():
    assert abs(area(P000, P090, PZ) - math.pi / 2) < 1e-14
    assert abs(area(P045, PZ, P180) - 3 * math.pi / 4) < 1e-13

    eps = 1e-10
    pepsx = _norm([eps, 0, 1])
    pepsy = _norm([0, eps, 1])
    expected1 = 0.5 * eps * eps
    assert abs(area(pepsx, pepsy, PZ) - expected1) <= 1e-14 * expected1

    pr = _norm([0.257, -0.5723, 0.112])
    pq = _norm([-0.747, 0.401, 0.2235])
    assert area(pr, pr, pr) == 0
    assert abs(area(pr, pq, pr)) <= 1e-15
    assert area(P000, P045, P090) == 0

    rng = np.random.RandomState(131)
    max_girard = 0.0
    for _ in range(2000):
        p0 = random_point(rng)
        p1 = _norm(p0 + 1e-15 * random_point(rng))
        p2 = _norm(p0 + 1e-15 * random_point(rng))
        assert area(p0, p1, p2) <= 0.7e-30
        max_girard = max(max_girard, float(girard_area(p0, p1, p2)))
    # only passes when GirardArea uses RobustCrossProd
    assert max_girard <= 1e-14

    p045eps = _norm([1, 1, eps])
    expected2 = 5.8578643762690495119753e-11
    assert abs(area(P000, p045eps, P090) - expected2) <= 1e-9 * expected2

    eps2 = 1e-14
    p000eps2 = _norm([1, 0.1 * eps2, eps2])
    quarter1 = (area(p000eps2, P000, P045) + area(p000eps2, P045, P180)
                + area(p000eps2, P180, PZ) + area(p000eps2, PZ, P000))
    assert abs(quarter1 - math.pi) < 4e-15

    p045eps2 = _norm([1, 1, eps2])
    quarter2 = (area(p045eps2, P000, P045) + area(p045eps2, P045, P180)
                + area(p045eps2, P180, PZ) + area(p045eps2, PZ, P000))
    assert abs(quarter2 - math.pi) < 4e-15

    def ll(lat, lng):
        return _norm([
            math.cos(lat) * math.cos(lng),
            math.cos(lat) * math.sin(lng),
            math.sin(lat),
        ])

    for _ in range(100):
        lng = rng.uniform(0, 2 * math.pi)
        p0 = ll(1e-20, lng)
        p1 = ll(0, lng)
        p2 = ll(0, lng + rng.uniform())
        p3 = ll(0, lng + math.pi)
        p4 = ll(0, lng + 5.0)
        total = (area(p0, p1, p2) + area(p0, p2, p3)
                 + area(p0, p3, p4) + area(p0, p4, p1))
        assert abs(total - 2 * math.pi) <= 2e-15

    a = ll(math.radians(-45), math.radians(-170))
    b = ll(math.radians(45), math.radians(-170))
    c = ll(math.radians(0), math.radians(-170))
    assert area(a, b, c) == 0.0


def test_get_area_regression_b229644268():
    a = np.array([-1.705424004316021258e-01, -8.242696197922716461e-01,
                  5.399026611737816062e-01])
    b = np.array([-1.706078905422188652e-01, -8.246067119418969416e-01,
                  5.393669607095969987e-01])
    c = np.array([-1.705800600596222294e-01, -8.244634596153025408e-01,
                  5.395947061167500891e-01])
    assert area(a, b, c) == 0
