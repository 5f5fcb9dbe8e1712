"""s2polyline_alignment_test.cc closing tranche: HalfResolution,
zero-length death tests, and the Medoid/Consensus polyline suites.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.alignment import (
    approx_alignment,
    consensus_polyline,
    exact_alignment,
    exact_alignment_cost,
    half_resolution,
    medoid_polyline,
    polylines_approx_equal,
)
from s2geometry_spark.kernel.contains import parse_points


def _pl(s):
    if not s.strip():
        return np.zeros((0, 3))
    return parse_points(s)


# --- HalfResolution (cc:287-306) -------------------------------------------


def test_halves_zero_length_polyline():
    assert len(half_resolution(_pl(""))) == 0


def test_halves_even_length_polyline():
    got = half_resolution(_pl("0:0, 0:1, 0:2, 1:2"))
    assert np.array_equal(got, _pl("0:0, 0:2"))


def test_halves_odd_length_polyline():
    got = half_resolution(_pl("0:0, 0:1, 0:2, 1:2, 3:5"))
    assert np.array_equal(got, _pl("0:0, 0:2, 3:5"))


# --- zero-length inputs (cc:408-429, death tests) --------------------------


def test_exact_length_zero_inputs():
    with pytest.raises(Exception):
        exact_alignment(_pl(""), _pl(""))


def test_exact_length_zero_input_a():
    with pytest.raises(Exception):
        exact_alignment(_pl(""), _pl("0:0, 1:1, 2:2"))


def test_exact_length_zero_input_b():
    with pytest.raises(Exception):
        exact_alignment(_pl("0:0, 1:1, 2:2"), _pl(""))


# --- GetMedoidPolyline (cc:656-724) ----------------------------------------


def test_medoid_polyline_no_polylines():
    with pytest.raises(Exception):
        medoid_polyline([])


def test_medoid_polyline_one_polyline():
    assert medoid_polyline([_pl("5:0, 5:1, 5:2")]) == 0


def test_medoid_polyline_two_polylines():
    # ties break to the smallest index
    lines = [_pl("5:0, 5:1, 5:2"), _pl("1:0, 1:1, 1:2")]
    assert medoid_polyline(lines) == 0


def test_medoid_polyline_few_small_polylines():
    lines = [
        _pl("5:0, 5:1, 5:2"),
        _pl("3:0, 3:1, 3:2"),
        _pl("1:0, 1:1, 1:2"),
    ]
    assert medoid_polyline(lines) == 1


def test_medoid_polyline_overlapping_polylines():
    lines = [_pl("1:0, 1:1, 1:2"), _pl("1:0, 1:1, 1:2")]
    assert medoid_polyline(lines) == 0


def test_medoid_polyline_different_length_polylines():
    lines = [
        _pl("5:0, 5:1, 5:2"),
        _pl("3:0, 3:0.5, 3:1, 3:2"),
        _pl("1:0, 1:0.5, 1:1, 1:1.5, 1:2"),
    ]
    assert medoid_polyline(lines) == 1


def _gen_polylines(rng, num_polylines, num_vertices, perturbation_deg):
    """GenPolylines analogue: perturbations of one base great-circle
    walk, deterministic via the given RandomState."""
    base_lat = rng.uniform(-30, 30)
    lls = [
        (base_lat + 0.01 * i, 0.02 * i) for i in range(num_vertices)
    ]
    out = []
    for _ in range(num_polylines):
        pts = []
        for lat, lng in lls:
            pts.append((
                lat + rng.uniform(-perturbation_deg, perturbation_deg),
                lng + rng.uniform(-perturbation_deg, perturbation_deg),
            ))
        s = ", ".join(f"{a}:{b}" for a, b in pts)
        out.append(_pl(s))
    return out


def test_medoid_polyline_few_large_polylines():
    """Exact and approx medoids each match the argmin of their own
    pairwise cost sums (cc:567-614), on inputs large enough that the
    two solvers can disagree."""
    rng = np.random.RandomState(20260819)
    lines = _gen_polylines(rng, 3, 256, 0.9)

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
    assert medoid_polyline(lines, approx=False) == int(
        np.argmin(exact_costs)
    )
    assert medoid_polyline(lines, approx=True) == int(
        np.argmin(approx_costs)
    )


# --- GetConsensusPolyline (cc:617-655) -------------------------------------


def test_consensus_polyline_no_polylines():
    with pytest.raises(Exception):
        consensus_polyline([])


def test_consensus_polyline_one_polyline():
    got = consensus_polyline([_pl("3:0, 3:1, 3:2")])
    assert polylines_approx_equal(got, _pl("3:0, 3:1, 3:2"), 1e-10)


def test_consensus_polyline_two_polylines():
    got = consensus_polyline([
        _pl("3:0, 3:1, 3:2"),
        _pl("1:0, 1:1, 1:2"),
    ])
    # midway polyline, to within the great-circle-vs-chord difference
    # of a 1-degree separation
    assert polylines_approx_equal(got, _pl("2:0, 2:1, 2:2"),
                                  math.radians(0.01))


def test_consensus_polyline_overlapping_polylines():
    got = consensus_polyline([
        _pl("1:0, 1:1, 1:2"),
        _pl("1:0, 1:1, 1:2"),
    ])
    assert polylines_approx_equal(got, _pl("1:0, 1:1, 1:2"), 1e-10)
