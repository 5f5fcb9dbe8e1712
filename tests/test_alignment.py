"""S2Polyline vertex alignment (DTW / medoid / DBA consensus) —
fixtures ported from s2polyline_alignment_test.cc."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.alignment import (
    approx_alignment,
    consensus_polyline,
    dilate_window,
    dynamic_timewarp,
    exact_alignment,
    exact_alignment_cost,
    half_resolution,
    medoid_polyline,
    polylines_approx_equal,
    upsample_window,
    validate_window,
    window_debug_string,
    window_from_warp_path,
)
from s2geometry_spark.kernel.contains import parse_points

S = np.array


def _norm_cost(a, b, path):
    return sum(
        float(np.linalg.norm(a[i] - b[j])) for i, j in path
    )


def brute_force_cost(a, b, i=None, j=None, memo=None):
    """Recursive brute-force DP from the reference test
    (s2polyline_alignment_test.cc:322-337)."""
    if i is None:
        i, j, memo = len(a) - 1, len(b) - 1, {}
    if (i, j) in memo:
        return memo[i, j]
    t = float(np.linalg.norm(a[i] - b[j]))
    if i == 0 and j == 0:
        r = t
    elif i == 0:
        r = brute_force_cost(a, b, i, j - 1, memo) + t
    elif j == 0:
        r = brute_force_cost(a, b, i - 1, j, memo) + t
    else:
        r = (
            min(
                brute_force_cost(a, b, i - 1, j - 1, memo),
                brute_force_cost(a, b, i - 1, j, memo),
                brute_force_cost(a, b, i, j - 1, memo),
            )
            + t
        )
    memo[i, j] = r
    return r


def verify_path(a_s, b_s, correct_path):
    a, b = parse_points(a_s), parse_points(b_s)
    correct = _norm_cost(a, b, correct_path)
    cost_only = exact_alignment_cost(a, b)
    cost, path = exact_alignment(a, b)
    assert cost == pytest.approx(correct, rel=1e-12, abs=1e-15)
    assert cost_only == pytest.approx(correct, rel=1e-12, abs=1e-15)
    assert path == correct_path


def verify_cost(a, b):
    brute = brute_force_cost(a, b)
    assert exact_alignment_cost(a, b) == pytest.approx(brute, rel=1e-12)
    assert exact_alignment(a, b)[0] == pytest.approx(brute, rel=1e-12)


# ------------------------------------------------------------- windows


def test_creates_window_from_strides():
    # s2polyline_alignment_test.cc:56-70
    strides = S([[0, 3], [1, 4], [2, 4], [3, 6], [4, 6]])
    assert validate_window(strides, 6)


def test_creates_window_from_warp_path():
    # s2polyline_alignment_test.cc:71-92
    path = [(0, 0), (1, 0), (1, 1), (2, 1), (3, 1), (3, 2), (3, 3), (4, 4), (4, 5)]
    w = window_from_warp_path(path)
    assert w.tolist() == [[0, 1], [0, 2], [1, 2], [1, 4], [4, 6]]


def test_generates_window_debug_string():
    # s2polyline_alignment_test.cc:93-104
    strides = S([[0, 4]] * 4)
    assert window_debug_string(strides) == " * * * *\n" * 4


def test_upsamples_window_by_factor_of_two():
    # s2polyline_alignment_test.cc:105-129
    strides = S([[0, 3], [1, 4], [2, 4], [3, 6], [4, 6]])
    up = upsample_window(strides, 10, 12)
    assert up.tolist() == [
        [0, 6], [0, 6], [2, 8], [2, 8], [4, 8],
        [4, 8], [6, 12], [6, 12], [8, 12], [8, 12],
    ]


def test_upsamples_window_x_axis_by_factor_of_three():
    # s2polyline_alignment_test.cc:130-148
    strides = S([[0, 3], [1, 4], [2, 4], [3, 6], [4, 6]])
    up = upsample_window(strides, 5, 18)
    assert up.tolist() == [[0, 9], [3, 12], [6, 12], [9, 18], [12, 18]]


def test_upsamples_window_y_axis_by_factor_of_three():
    # s2polyline_alignment_test.cc:149-178
    strides = S([[0, 3], [1, 4], [2, 4], [3, 6], [4, 6]])
    up = upsample_window(strides, 15, 6)
    assert up.tolist() == (
        [[0, 3]] * 3 + [[1, 4]] * 3 + [[2, 4]] * 3 + [[3, 6]] * 3 + [[4, 6]] * 3
    )


def test_upsamples_window_by_non_integer():
    # s2polyline_alignment_test.cc:179-211
    strides = S([[0, 3], [1, 4], [2, 4], [3, 6], [4, 6]])
    up = upsample_window(strides, 19, 23)
    assert up.tolist() == (
        [[0, 12]] * 4 + [[4, 15]] * 4 + [[8, 15]] * 3
        + [[12, 23]] * 4 + [[15, 23]] * 4
    )


DILATE_BASE = S([[0, 3], [2, 3], [2, 3], [2, 4], [3, 6]])


def test_dilates_window_by_radius_zero():
    # s2polyline_alignment_test.cc:214-233
    assert dilate_window(DILATE_BASE, 0).tolist() == DILATE_BASE.tolist()


def test_dilates_window_by_radius_one():
    # s2polyline_alignment_test.cc:234-253
    assert dilate_window(DILATE_BASE, 1).tolist() == [
        [0, 4], [0, 4], [1, 5], [1, 6], [1, 6],
    ]


def test_dilates_window_by_radius_two():
    # s2polyline_alignment_test.cc:254-272
    assert dilate_window(DILATE_BASE, 2).tolist() == [
        [0, 5], [0, 6], [0, 6], [0, 6], [0, 6],
    ]


def test_dilates_window_by_very_large_radius():
    # s2polyline_alignment_test.cc:273-286
    assert dilate_window(DILATE_BASE, 100).tolist() == [[0, 6]] * 5


def test_halves_polylines():
    # s2polyline_alignment_test.cc:287-306
    even = parse_points("0:0, 0:1, 0:2, 1:2")
    np.testing.assert_array_equal(
        half_resolution(even), parse_points("0:0, 0:2")
    )
    odd = parse_points("0:0, 0:1, 0:2, 1:2, 3:5")
    np.testing.assert_array_equal(
        half_resolution(odd), parse_points("0:0, 0:2, 3:5")
    )


# --------------------------------------------------------- exact DTW


def test_exact_length_zero_inputs_raise():
    # s2polyline_alignment_test.cc:409-429 (death tests)
    empty = np.zeros((0, 3))
    line = parse_points("0:0, 1:1, 2:2")
    for a, b in [(empty, empty), (empty, line), (line, empty)]:
        with pytest.raises(ValueError):
            exact_alignment(a, b)
        with pytest.raises(ValueError):
            exact_alignment_cost(a, b)


def test_exact_length_one_inputs():
    # s2polyline_alignment_test.cc:431-438
    verify_path("1:1", "2:2", [(0, 0)])


def test_exact_length_one_input_a():
    # s2polyline_alignment_test.cc:439-446
    verify_path("0:0", "0:0, 1:1, 2:2", [(0, 0), (0, 1), (0, 2)])


def test_exact_length_one_input_b():
    # s2polyline_alignment_test.cc:447-454
    verify_path("0:0, 1:1, 2:2", "0:0", [(0, 0), (1, 0), (2, 0)])


def test_exact_header_file_example():
    # s2polyline_alignment_test.cc:455-462
    verify_path(
        "1:0, 5:0, 6:0, 9:0", "2:0, 7:0, 8:0",
        [(0, 0), (1, 1), (2, 1), (3, 2)],
    )


def test_different_path_for_distance_versus_squared_distance():
    # s2polyline_alignment_test.cc:463-485: right-angle polylines whose
    # optimal path differs between |d| and |d|^2 costs.
    verify_path(
        "0.1:-0.1, 0.1:0, 0.1:0.1, -0.1:0.1",
        "0.1:-0.1, -0.1:-0.1, -0.1:0.1",
        [(0, 0), (1, 0), (2, 1), (3, 2)],
    )


def _gen_polylines(rng, num_polylines, num_vertices, perturbation):
    """Deterministic analogue of GenPolylines
    (s2polyline_alignment_test.cc:368-407): a regular loop of radius
    0.01 rad, each copy's vertices uniformly perturbed in a cap of
    radius perturbation * edge_length."""
    radius = 0.01
    edge_len = 2 * math.pi * radius / num_vertices
    pr = perturbation * edge_len
    center = rng.standard_normal(3)
    center /= np.linalg.norm(center)
    # orthonormal frame at center
    up = np.array([0.0, 0.0, 1.0])
    if abs(center @ up) > 0.9:
        up = np.array([1.0, 0.0, 0.0])
    e1 = np.cross(center, up)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(center, e1)
    ang = 2 * math.pi * np.arange(num_vertices) / num_vertices
    base = (
        math.cos(radius) * center[None]
        + math.sin(radius) * (np.cos(ang)[:, None] * e1 + np.sin(ang)[:, None] * e2)
    )
    lines = []
    for _ in range(num_polylines):
        theta = rng.uniform(0, 2 * math.pi, num_vertices)
        r = pr * np.sqrt(rng.uniform(0, 1, num_vertices))
        # perturb each base point within a tangent disc of radius r
        tang1 = np.cross(base, center[None])
        tang1 /= np.linalg.norm(tang1, axis=1, keepdims=True)
        tang2 = np.cross(base, tang1)
        tang2 /= np.linalg.norm(tang2, axis=1, keepdims=True)
        p = base + r[:, None] * (
            np.cos(theta)[:, None] * tang1 + np.sin(theta)[:, None] * tang2
        )
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        lines.append(p)
    return lines


def test_fuzzed_with_brute_force():
    # s2polyline_alignment_test.cc:486-503: all-pairs DP == brute force.
    rng = np.random.default_rng(20260817)
    lines = _gen_polylines(rng, 10, 8, 1.5)
    for i in range(10):
        for j in range(i + 1, 10):
            verify_cost(lines[i], lines[j])


def test_windowed_equals_exact_on_full_window():
    a = parse_points("0:0, 0:1, 0:2, 0:3, 1:3")
    b = parse_points("0:0, 0:2, 1:3")
    strides = np.tile(S([[0, 3]]), (5, 1))
    cost_w, path_w = dynamic_timewarp(a, b, strides)
    cost_e, path_e = exact_alignment(a, b)
    assert cost_w == cost_e and path_w == path_e


# ------------------------------------------------------------- approx


def test_approx_alignment_small_inputs_fall_back_to_exact():
    # Below the size switchover (32) FastDTW terminates at exact
    # (s2polyline_alignment.cc:316-321).
    a = parse_points("1:0, 5:0, 6:0, 9:0")
    b = parse_points("2:0, 7:0, 8:0")
    assert approx_alignment(a, b) == exact_alignment(a, b)


def test_approx_alignment_near_exact_on_large_correlated_lines():
    rng = np.random.default_rng(7)
    lines = _gen_polylines(rng, 2, 256, 0.4)
    exact = exact_alignment_cost(lines[0], lines[1])
    cost, path = approx_alignment(lines[0], lines[1])
    assert path[0] == (0, 0) and path[-1] == (255, 255)
    assert cost >= exact - 1e-15
    assert cost <= 1.1 * exact  # FastDTW approximation quality


# --------------------------------------------------- medoid / consensus


def _lines(*specs):
    return [parse_points(s) for s in specs]


def test_medoid_no_polylines_raises():
    with pytest.raises(ValueError):
        medoid_polyline([])


def test_medoid_one_polyline():
    # s2polyline_alignment_test.cc:512-519
    assert medoid_polyline(_lines("5:0, 5:1, 5:2")) == 0


def test_medoid_two_polylines_tie_breaks_low_index():
    # s2polyline_alignment_test.cc:520-531
    assert medoid_polyline(_lines("5:0, 5:1, 5:2", "1:0, 1:1, 1:2")) == 0


def test_medoid_few_small_polylines():
    # s2polyline_alignment_test.cc:532-542
    assert (
        medoid_polyline(_lines("5:0, 5:1, 5:2", "3:0, 3:1, 3:2", "1:0, 1:1, 1:2"))
        == 1
    )


def test_medoid_overlapping_polylines():
    # s2polyline_alignment_test.cc:543-553
    assert medoid_polyline(_lines("1:0, 1:1, 1:2", "1:0, 1:1, 1:2")) == 0


def test_medoid_different_length_polylines():
    # s2polyline_alignment_test.cc:554-566
    assert (
        medoid_polyline(
            _lines(
                "5:0, 5:1, 5:2",
                "3:0, 3:0.5, 3:1, 3:2",
                "1:0, 1:0.5, 1:1, 1:1.5, 1:2",
            )
        )
        == 1
    )


def test_medoid_few_large_polylines_exact_vs_approx():
    # s2polyline_alignment_test.cc:567-616: medoid under each cost mode
    # equals the argmin of independently computed summed costs.
    rng = np.random.default_rng(99)
    lines = _gen_polylines(rng, 3, 1024, 0.9)
    exact_costs = [
        exact_alignment_cost(lines[0], lines[1])
        + exact_alignment_cost(lines[0], lines[2]),
        exact_alignment_cost(lines[1], lines[0])
        + exact_alignment_cost(lines[1], lines[2]),
        exact_alignment_cost(lines[2], lines[0])
        + exact_alignment_cost(lines[2], lines[1]),
    ]
    approx_costs = [
        approx_alignment(lines[0], lines[1])[0]
        + approx_alignment(lines[0], lines[2])[0],
        approx_alignment(lines[1], lines[0])[0]
        + approx_alignment(lines[1], lines[2])[0],
        approx_alignment(lines[2], lines[0])[0]
        + approx_alignment(lines[2], lines[1])[0],
    ]
    assert medoid_polyline(lines, approx=False) == int(np.argmin(exact_costs))
    assert medoid_polyline(lines, approx=True) == int(np.argmin(approx_costs))


def test_consensus_no_polylines_raises():
    with pytest.raises(ValueError):
        consensus_polyline([])


def test_consensus_one_polyline():
    # s2polyline_alignment_test.cc:624-633
    res = consensus_polyline(_lines("3:0, 3:1, 3:2"))
    assert polylines_approx_equal(res, parse_points("3:0, 3:1, 3:2"), 1e-10)


def test_consensus_two_polylines():
    # s2polyline_alignment_test.cc:634-644: DBA average converges to the
    # midline 2:0, 2:1, 2:2 (within interpolation error).
    res = consensus_polyline(_lines("3:0, 3:1, 3:2", "1:0, 1:1, 1:2"))
    exp = parse_points("2:0, 2:1, 2:2")
    assert polylines_approx_equal(res, exp, 1e-3)


def test_consensus_overlapping_polylines():
    # s2polyline_alignment_test.cc:645-655
    res = consensus_polyline(_lines("1:0, 1:1, 1:2", "1:0, 1:1, 1:2"))
    assert polylines_approx_equal(res, parse_points("1:0, 1:1, 1:2"), 1e-10)
