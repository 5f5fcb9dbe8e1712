"""S2Fractal fixture ports (s2fractal_test.cc:46-158).

Verifies the generated curve IS a fractal: vertex counts, total length
(which grows exponentially with level at rate 4^(1-1/d)), and the
min/max tangent-plane radius envelope all match the analytic factors.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.fractal import Fractal, frame_at, random_point


def num_vertices_at_level(level: int) -> int:
    return 3 * (4 ** level)  # sanity-checked in the reference, test.cc:40


def run_fractal(min_level: int, max_level: int, dimension: float, seed: int):
    nominal_radius = 0.001
    k_distortion_error = 1e-5
    rng = np.random.RandomState(seed)
    fractal = Fractal(rng)
    fractal.set_min_level(min_level)
    fractal.set_max_level(max_level)
    fractal.set_fractal_dimension(dimension)
    frame = frame_at(rng, random_point(rng))
    v = fractal.make_vertices(frame, nominal_radius)

    num_levels = max_level - min_level + 1
    min_vertices = num_vertices_at_level(min_level)
    relative_error = 2 * math.sqrt((num_levels - 1.0) / min_vertices)
    expansion_factor = math.pow(4, 1 - 1 / dimension)
    triangle_perim = 3 * math.sqrt(3) * math.tan(nominal_radius)
    min_length_sum = triangle_perim * expansion_factor ** min_level
    expected_num_vertices = sum(
        num_vertices_at_level(lv) for lv in range(min_level, max_level + 1)
    ) / num_levels
    expected_length_sum = (
        sum(expansion_factor ** lv for lv in range(min_level, max_level + 1))
        * triangle_perim / num_levels
    )

    n = len(v)
    assert n >= min_vertices
    assert n <= num_vertices_at_level(max_level)
    assert abs(expected_num_vertices - n) <= relative_error * (
        expected_num_vertices - min_vertices
    )

    # S2Point::Angle is atan2(|a×b|, a·b) — far more accurate than
    # arccos for the sub-milliradian angles here
    center = frame[:, 2]
    cross = np.cross(v, center[None, :])
    radii = np.tan(
        np.arctan2(np.linalg.norm(cross, axis=1), v @ center)
    )
    nxt = np.roll(v, -1, axis=0)
    ecross = np.linalg.norm(np.cross(v, nxt), axis=1)
    edots = (v * nxt).sum(1)
    length_sum = float(np.arctan2(ecross, edots).sum())

    k_vertex_error = 1e-14
    min_radius, max_radius = float(radii.min()), float(radii.max())
    if dimension == 1.0 or dimension >= 1.09:
        assert abs(
            min_radius - fractal.min_radius_factor() * nominal_radius
        ) <= k_vertex_error
    else:
        assert min_radius >= (
            fractal.min_radius_factor() * nominal_radius - k_vertex_error
        )
    assert abs(
        max_radius - fractal.max_radius_factor() * nominal_radius
    ) <= k_vertex_error
    assert abs(expected_length_sum - length_sum) <= (
        relative_error * (expected_length_sum - min_length_sum)
        + k_distortion_error * length_sum
    )


def test_triangle_fractal():
    run_fractal(7, 7, 1.0, seed=11)


def test_triangle_multi_fractal():
    run_fractal(2, 6, 1.0, seed=12)


def test_space_filling_fractal():
    run_fractal(4, 4, 1.999, seed=13)


def test_koch_curve_fractal():
    run_fractal(7, 7, math.log(4) / math.log(3), seed=14)


def test_koch_curve_multi_fractal():
    run_fractal(4, 8, math.log(4) / math.log(3), seed=15)


def test_cesaro_fractal():
    run_fractal(7, 7, 1.8, seed=16)


def test_cesaro_multi_fractal():
    run_fractal(3, 6, 1.8, seed=17)
