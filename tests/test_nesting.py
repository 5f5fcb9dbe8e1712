"""S2ShapeNestingQuery — fixtures ported from
s2shape_nesting_query_test.cc."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.nesting import shape_nesting


def _ll(lat, lng):
    x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
    return np.array([float(x), float(y), float(z)])


def ring_shape(vertices_per_loop, ring_specs):
    """RingShape (s2shape_nesting_query_test.cc:67-95): CCW rings of
    (center_lat, center_lng, radius_deg, reverse)."""
    loops = []
    for clat, clng, radius_deg, reverse in ring_specs:
        radius = abs(radius_deg)
        ang = 2 * math.pi * np.arange(vertices_per_loop) / vertices_per_loop
        lat = clat + radius * np.sin(ang)
        lng = clng + radius * np.cos(ang)
        x, y, z = latlng_to_xyz(lat, lng)
        v = np.stack([x, y, z], -1)
        if reverse:
            v = v[::-1]
        loops.append(v)
    return loops


def arc_shape(vertices_per_loop, specs):
    """ArcShape (s2shape_nesting_query_test.cc:120-181): C-shaped arc
    bands of (center_lat, center_lng, radius_deg, thickness, start_deg,
    end_deg, offset, reverse)."""
    loops = []
    for clat, clng, radius_deg, thickness, start_deg, end_deg, offset, reverse in specs:
        assert vertices_per_loop % 2 == 0
        start_rad, end_rad = math.radians(start_deg), math.radians(end_deg)
        r_in, r_out = radius_deg - thickness, radius_deg + thickness
        step = (end_rad - start_rad) / (vertices_per_loop // 2 - 1)
        v = np.empty((vertices_per_loop, 3))
        for i in range(vertices_per_loop // 2):
            angle = start_rad + i * step
            sina, cosa = math.sin(angle), math.cos(angle)
            v[i] = _ll(clat + r_out * sina, clng + r_out * cosa)
            v[vertices_per_loop - i - 1] = _ll(
                clat + r_in * sina, clng + r_in * cosa
            )
        if offset:
            v = np.roll(v, -(offset % vertices_per_loop), axis=0)
        if reverse:
            v = v[::-1]
        loops.append(v)
    return loops


def test_one_chain_always_shell():
    # s2shape_nesting_query_test.cc:183-199
    rel = shape_nesting(ring_shape(100, [(0.0, 0.0, 1.0, False)]))
    assert len(rel) == 1
    assert rel[0].is_shell and not rel[0].is_hole
    assert rel[0].parent_id < 0 and rel[0].holes == []


def test_two_chains_form_pair():
    # s2shape_nesting_query_test.cc:200-280
    # Nested rings, like a donut.
    rel = shape_nesting(
        ring_shape(100, [(0, 0, 1.0, False), (0, 0, 0.5, True)])
    )
    assert rel[0].is_shell and rel[1].is_hole
    assert rel[0].parent_id < 0 and rel[0].holes == [1]
    assert rel[1].parent_id == 0 and rel[1].holes == []

    # Swapping ring ordering shouldn't change anything.
    rel = shape_nesting(
        ring_shape(100, [(0, 0, 0.5, True), (0, 0, 1.0, False)])
    )
    assert rel[0].is_shell and rel[1].is_hole
    assert rel[0].parent_id < 0 and rel[0].holes == [1]
    assert rel[1].parent_id == 0 and rel[1].holes == []

    # Reversed orientations: shell and hole don't face each other, so
    # both chains are shells.
    rel = shape_nesting(
        ring_shape(100, [(0, 0, 1.0, True), (0, 0, 0.5, False)])
    )
    for r in rel:
        assert r.is_shell and r.parent_id < 0 and r.holes == []


def test_two_chains_with_shared_vertex():
    # s2shape_nesting_query_test.cc:281-324: quadrangle + pentagon
    # sharing a vertex, all rotations -> two shells.
    loop1 = [(0, 0), (0, -1), (-1, -1), (-1, 0)]
    loop2 = [(0, 0), (0, 1), (1, 2), (2, 1), (1, 0)]
    for i in range(len(loop1)):
        for j in range(len(loop2)):
            chains = [
                np.array([_ll(*p) for p in loop1]),
                np.array([_ll(*p) for p in loop2]),
            ]
            rel = shape_nesting(chains)
            assert rel[0].is_shell and rel[1].is_shell, (i, j)
            loop2 = loop2[1:] + loop2[:1]
        loop1 = loop1[1:] + loop1[:1]


def test_can_set_datum_shell_option():
    # s2shape_nesting_query_test.cc:325-349
    rel = shape_nesting(
        ring_shape(100, [(0, 0, 1.0, False), (0, 0, 0.5, True)]), datum=1
    )
    assert rel[1].is_shell and rel[0].is_hole


def test_shell_can_have_multiple_holes():
    # s2shape_nesting_query_test.cc:350-384: button with four holes.
    rel = shape_nesting(
        ring_shape(
            16,
            [
                (0.5, 0.5, 2.0, False),
                (1.0, 0.5, 0.25, True),
                (0.0, 0.5, 0.25, True),
                (0.5, 1.0, 0.25, True),
                (0.5, 0.0, 0.25, True),
            ],
        )
    )
    assert len(rel) == 5
    assert rel[0].is_shell and rel[0].parent_id < 0
    assert rel[0].holes == [1, 2, 3, 4]
    for i in range(1, 5):
        assert rel[i].is_hole and rel[i].parent_id == 0
        assert rel[i].holes == []


@pytest.mark.parametrize("offset0", range(0, 32, 4))
@pytest.mark.parametrize("offset1", range(0, 32, 4))
def test_exact_path_is_irrelevant(offset0, offset1):
    # s2shape_nesting_query_test.cc:385-428: highly concave C-shaped
    # rings; the segment path between datum and target must not affect
    # classification.  (Offset sweep strided 4; the reference sweeps 1.)
    chains = arc_shape(
        32,
        [
            (0, 0, 0.3, 0.15, -240.0, 60.0, offset0, False),
            (0, 0, 0.3, 0.05, -230.0, 50.0, offset1, True),
            (0, 0, 1.0, 0.15, -85.0, 265.0, offset1, False),
            (0, 0, 1.0, 0.05, -80.0, 260.0, offset1, True),
        ],
    )
    rel = shape_nesting(chains)
    assert len(rel) == 4
    assert rel[0].is_shell
    assert rel[1].is_hole and rel[1].parent_id == 0
    assert rel[2].is_shell
    assert rel[3].is_hole and rel[3].parent_id == 2


@pytest.mark.parametrize(
    "depth,first_chain,shuffle",
    [
        (31, 0, False),
        (32, 0, False),
        (31, 0, True),
        (32, 0, True),
        (31, 30, True),
        (32, 31, True),
        (31, 15, True),
        (32, 15, True),
    ],
)
def test_nested_chains_partition_correctly(depth, first_chain, shuffle):
    # s2shape_nesting_query_test.cc:429-520: concentric rings with
    # alternating orientation partition into shell/hole pairs.
    rings = [(0.0, 0.0, 2.0 / (first_chain + 1), first_chain % 2 == 1)]
    for i in range(depth):
        if i == first_chain:
            continue
        rings.append((0.0, 0.0, 2.0 / (i + 1), i % 2 == 1))
    if shuffle:
        rng = np.random.default_rng(depth * 1000 + first_chain)
        tail = rings[1:]
        rng.shuffle(tail)
        rings = rings[:1] + tail
    rel = shape_nesting(ring_shape(16, rings))
    assert len(rel) == depth

    if first_chain == 0 and not shuffle:
        assert rel[0].is_shell and rel[0].holes == [1]
        for chain in range(1, depth):
            if chain % 2 == 1:
                assert rel[chain].is_hole and rel[chain].parent_id == chain - 1
            else:
                assert rel[chain].is_shell and rel[chain].parent_id == -1

    num_shells = num_holes = 0
    for chain in range(depth):
        if rel[chain].is_shell:
            num_shells += 1
            for child in rel[chain].holes:
                assert rel[child].parent_id == chain
        else:
            num_holes += 1
            assert chain in rel[rel[chain].parent_id].holes
    assert num_holes + num_shells == depth
