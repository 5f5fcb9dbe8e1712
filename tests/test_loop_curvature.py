"""S2Loop curvature fixture ports (s2loop_test.cc:468-508 GetCurvature,
AreaConsistentWithCurvature) over the named reference loops, including
the 20k-vertex spiral that stresses Kahan-summation error linearity.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.measures import (
    curvature_max_error,
    loop_area,
    loop_curvature,
    prune_degeneracies,
)

NORTH_HEMI3 = parse_points("0:-180, 0:-60, 0:60")
WEST_HEMI = parse_points("0:-180, -90:0, 0:0, 90:0")
CANDY_CANE = parse_points("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
LINE_TRIANGLE = parse_points("0:1, 0:2, 0:3")
SKINNY_CHEVRON = parse_points("0:0, -1e-320:80, 0:1e-320, 1e-320:80")


def check_curvature_invariants(loop: np.ndarray):
    """CheckCurvatureInvariants (s2loop_test.cc:455-466): invariant
    under rotation, negated under inversion."""
    expected = loop_curvature(loop)
    v = loop.copy()
    for _ in range(len(loop)):
        assert loop_curvature(v[::-1]) == -expected
        v = np.roll(v, -1, axis=0)
        assert loop_curvature(v) == expected


def test_get_curvature():
    assert loop_curvature(np.zeros((0, 3))) == -2 * math.pi  # full span
    assert abs(loop_curvature(NORTH_HEMI3)) < 1e-15
    check_curvature_invariants(NORTH_HEMI3)
    assert abs(loop_curvature(WEST_HEMI)) < 1e-15
    check_curvature_invariants(WEST_HEMI)
    check_curvature_invariants(CANDY_CANE)
    assert abs(loop_curvature(LINE_TRIANGLE) - 2 * math.pi) < 1e-12
    check_curvature_invariants(LINE_TRIANGLE)
    assert abs(loop_curvature(SKINNY_CHEVRON) - 2 * math.pi) < 1e-12
    check_curvature_invariants(SKINNY_CHEVRON)


def test_get_curvature_spiral():
    """The narrow two-armed spiral (test.cc:488-508): curvature error
    stays linear in vertex count."""
    k_arm_points = 10000
    k_arm_radius = 0.01
    vertices = np.zeros((2 * k_arm_points, 3))
    vertices[k_arm_points] = [0, 0, 1]
    for i in range(k_arm_points):
        angle = (2 * math.pi / 3) * i
        x, y = math.cos(angle), math.sin(angle)
        r1 = i * k_arm_radius / k_arm_points
        r2 = (i + 1.5) * k_arm_radius / k_arm_points
        v1 = np.array([r1 * x, r1 * y, 1.0])
        v2 = np.array([r2 * x, r2 * y, 1.0])
        vertices[k_arm_points - i - 1] = v1 / np.linalg.norm(v1)
        vertices[k_arm_points + i] = v2 / np.linalg.norm(v2)
    area = loop_area(vertices)
    curvature = loop_curvature(vertices)
    assert abs((2 * math.pi - area) - curvature) <= \
        0.01 * curvature_max_error(vertices)


def test_area_consistent_with_curvature():
    """Gauss-Bonnet (test.cc AreaConsistentWithCurvature): area =
    2π − curvature for every fixture loop."""
    for loop in (NORTH_HEMI3, WEST_HEMI, CANDY_CANE, LINE_TRIANGLE,
                 SKINNY_CHEVRON):
        area = loop_area(loop)
        gauss = 2 * math.pi - loop_curvature(loop)
        assert abs(area - gauss) <= 1e-14, loop


def test_prune_degeneracies():
    """Degenerate patterns collapse (s2loop_measures semantics)."""
    a, b, c = parse_points("0:0, 0:1, 1:0")
    # AA -> A
    assert len(prune_degeneracies(np.array([a, a, b, c]))) == 3
    # ABA whisker
    assert len(prune_degeneracies(np.array([a, b, a, b, c]))) == 3
    # fully degenerate
    assert len(prune_degeneracies(np.array([a, b, a]))) == 0
    assert len(prune_degeneracies(np.array([a, b]))) == 0
