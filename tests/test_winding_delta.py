"""GetSnappedWindingDelta fixture ports
(s2builderutil_get_snapped_winding_delta_test.cc:141-200): collapsing
shells/holes, external loops, crossing edges, and forced-vertex snaps
with a 10° identity snap radius.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.builder import IdentitySnapFunction
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.graph import DIRECTED, KEEP, MERGE, GraphOptions
from s2geometry_spark.kernel.layers import Builder
from s2geometry_spark.kernel.winding_delta import (
    find_first_vertex_id,
    get_snapped_winding_delta,
)


class WindingDeltaLayer:
    """WindingNumberComparingLayer analog: captures the graph."""

    def __init__(self):
        self.graph = None

    def graph_options(self) -> GraphOptions:
        return GraphOptions(DIRECTED, KEEP, MERGE, KEEP)

    def build(self, g) -> None:
        self.graph = g


def expect_winding_delta(loops_str, forced_str, snap_radius_degrees,
                         ref_input_edge_id, expected):
    b = Builder(snap=IdentitySnapFunction(math.radians(snap_radius_degrees)))
    layer = WindingDeltaLayer()
    b.start_layer(layer)
    if forced_str.strip():
        for v in parse_points(forced_str):
            b.force_vertex(v)
    for loop_str in loops_str.split(";"):
        pts = parse_points(loop_str.strip())
        if len(pts) == 1:
            # degenerate LaxPolygon loop: one edge (v, v)
            b.add_edge(pts[0], pts[0])
        else:
            b.add_loop(pts)
    a, bb = b.input_edge(ref_input_edge_id)
    assert np.array_equal(a, bb), "reference edge not degenerate"
    err = b.build()
    assert err is None, err
    g = layer.graph
    ref_in = b.input_edge(ref_input_edge_id)[0]
    ref_v = find_first_vertex_id(ref_input_edge_id, g)
    assert ref_v >= 0
    got = get_snapped_winding_delta(ref_in, ref_v, b, g)
    assert got == expected, (got, expected)


def test_no_other_edges():
    expect_winding_delta("0:0", "0:0", 10.0, 0, 0)


def test_degenerate_input_loops():
    expect_winding_delta("0:0; 1:1; 2:2", "0:0", 10.0, 0, 0)


def test_duplicate_degenerate_input_loops():
    expect_winding_delta("0:0; 0:0; 1:1; 1:1", "0:0", 10.0, 0, 0)


def test_collapsing_shell():
    expect_winding_delta("0:0; 1:1, 1:-2, -2:1", "0:0", 10.0, 0, -1)


def test_collapsing_hole():
    expect_winding_delta("0:0; 1:1, -2:1, 1:-2", "0:0", 10.0, 0, +1)


def test_collapsing_double_shell():
    expect_winding_delta(
        "0:0; 1:1, 1:-2, -2:1, 2:2, 2:-3, -3:2", "0:0", 10.0, 0, -2
    )


def test_external_loop_ref_vertex_stays_outside():
    expect_winding_delta("0:0; 20:0, 0:0, 0:20", "0:0", 10.0, 0, 0)


def test_external_loop_ref_vertex_stays_inside():
    expect_winding_delta("0:0; 0:-20, 0:0, 20:0", "0:0", 10.0, 0, 0)


def test_external_loop_ref_vertex_moves_inside():
    expect_winding_delta("1:1; 0:-20, 1:-1, 20:0", "0:0", 10.0, 0, +1)


def test_crossing_edge_ref_vertex_stays_outside():
    expect_winding_delta("-1:-1; 20:-20, -20:20, 20:20", "0:0", 10.0, 0, 0)


def test_crossing_edge_ref_vertex_moves_outside():
    expect_winding_delta("1:1; 20:-20, -20:20, 20:20", "0:0", 10.0, 0, -1)


def test_external_loop_double_hole_to_single_hole():
    expect_winding_delta(
        "4:4; 0:20, 3:3, 6:3, 2:7, 2:2, 2:20", "0:0", 10.0, 0, +1
    )


def test_external_loop_double_hole_to_single_shell():
    expect_winding_delta(
        "4:4; 0:-20, 6:2, 2:6, 2:2, 6:2, 2:6, 2:2, 20:0", "0:0", 10.0, 0, +3
    )


def test_external_edges_cross_snap_to_same_vertex():
    expect_winding_delta(
        "1:1; -5:30, 7:-3, -7:-3, 5:30", "0:0, 0:15", 10.0, 0, -1
    )


def test_external_edges_cross_snap_to_different_vertices():
    expect_winding_delta(
        "1:1; -5:40, 7:-3, -7:-3, 5:40", "0:0, 6:10, -6:10", 10.0, 0, -1
    )


def test_reference_point_winding_numbers_change():
    # test.cc:253-269: the anchor points Za/Zb themselves change winding
    expect_winding_delta("1:1; 70:-179.99, 5:0, 0:5, -0.01:110",
                         "0:0, 1:90", 10.0, 0, 0)
    expect_winding_delta("1:1; 70:-179.99, 5:0, 0:5, -0.01:110",
                         "0:0, 89:90", 10.0, 0, 0)
    expect_winding_delta("1:1; 70:-179.99, 5:0, 0:5, -0.01:110",
                         "0:0, 1:90, 89:90", 10.0, 0, 0)
    expect_winding_delta("1:1; 70:179.99, 5:0, 0:5, 0:110",
                         "0:0, -1:20, 1:90", 10.0, 0, 0)


def test_reference_loops_topologically_consistent():
    # test.cc:277-293: connecting vertices keep the L/L' loops within
    # the snap radius when a chain exceeds 180 degrees
    expect_winding_delta("-45:24; 0:148, 0:0, -31:-48, 44:-39, -59:0",
                         "-31:-48, 44:-39", 60.0, 0, -1)
    expect_winding_delta("-45:24;  -59:0, 44:-39, -31:-48, 0:0, 0:148",
                         "-31:-48, 44:-39", 60.0, 0, 1)


def test_complex_example():
    # test.cc:295-306
    expect_winding_delta("1:1; "
                         "70:179.99, 5:0, 0:5, 0:110; "
                         "70:179.99, 0:0, 0:3, 3:0, 0:-1, 0:110; "
                         "10:-10, -10:10, 10:10; "
                         "2:2, 1:-2, -1:2, 2:2, 1:-2, -1:2 ",
                         "0:0, -1:90, 1:90, 45:-5", 10.0, 0, -5)


def test_ensure_za_zb_not_in_voronoi_region():
    # test.cc:308-313
    expect_winding_delta(
        "30:42, 30:42; -27:52, 66:131, 30:-93", "", 67.0, 0, -1)


def test_ensure_chain_diff_loop_is_closed():
    # test.cc:315-320
    expect_winding_delta(
        "8:26, 8:26; -36:70, -64:-35, -41:48", "", 66, 0, 0)


def test_voronoi_exclusion_bug():
    # test.cc:322-329: long edges (near 180 degrees) + large snap radii
    expect_winding_delta(
        "24.97:102.02, 24.97:102.02; "
        "25.84:131.46, -29.23:-166.58, 29.40:173.03, -18.02:-5.83",
        "", 64.83, 0, -1)


def test_random_loops():
    """test.cc:430-505 RandomLoops: for random loop soups (vertices
    mostly within a random snap radius of a reference vertex), the
    locally-computed GetSnappedWindingDelta must equal the globally
    measured winding change (signed crossings along isolated→ref, input
    vs output graph with input-edge multiplicities).  100 pinned-seed
    iterations (reference runs 1000 with a per-run seed)."""
    from s2geometry_spark.kernel import predicates as P
    from s2geometry_spark.kernel.fractal import (
        random_point,
        sample_cap_point,
    )

    max_snap = math.radians(70)  # SnapFunction::kMaxSnapRadius
    rng = np.random.RandomState(20260819)
    n_done = 0
    n_not_isolated = 0
    for _ in range(100):
        snap_radius = rng.uniform(0.0, 1.0) * max_snap
        b = Builder(snap=IdentitySnapFunction(snap_radius))
        layer = WindingDeltaLayer()
        b.start_layer(layer)
        ref = random_point(rng)
        t = np.cross(ref, [0.0, 0.0, 1.0])
        n = np.linalg.norm(t)
        if n < 1e-9:
            t = np.cross(ref, [1.0, 0.0, 0.0])
            n = np.linalg.norm(t)
        iso = -ref + 1e-12 * (t / n)
        iso = iso / np.linalg.norm(iso)
        b.add_edge(ref, ref)
        b.add_edge(iso, iso)
        used, loop = [], []
        for _k in range(int(rng.randint(1, 6))):
            for _v in range(int(rng.randint(1, 10))):
                if used and rng.rand() < 0.25:
                    loop.append(used[int(rng.randint(0, len(used)))])
                elif rng.rand() < 1.0 / 3:
                    v = sample_cap_point(rng, ref, math.pi - snap_radius)
                    loop.append(v)
                    used.append(v)
                else:
                    v = sample_cap_point(rng, ref, snap_radius)
                    loop.append(v)
                    used.append(v)
            if len(loop) == 1:
                b.add_edge(loop[0], loop[0])
            else:
                b.add_loop(np.asarray(loop))
            loop = []
        err = b.build()
        assert err is None, err
        g = layer.graph
        ref_in = b.input_edge(0)[0]
        iso_in = b.input_edge(1)[0]
        ref_v = find_first_vertex_id(0, g)
        iso_v = find_first_vertex_id(1, g)
        assert ref_v >= 0 and iso_v >= 0
        # isolation check: exactly one output edge (the degenerate II)
        # at I', carrying exactly one input edge
        iso_edges = [e for e in range(g.num_edges())
                     if g.edge(e)[0] == iso_v]
        if len(iso_edges) != 1 or len(g.input_edge_ids(iso_edges[0])) != 1:
            n_not_isolated += 1
            continue
        ref_out = g.vertex(ref_v)
        iso_out = g.vertex(iso_v)
        winding_in = 0
        for e in range(len(b._edges)):
            v0, v1 = b.input_edge(e)
            winding_in += P.signed_edge_or_vertex_crossing(
                iso_in, ref_in, v0, v1)
        winding_out = 0
        for e in range(g.num_edges()):
            a, c = g.edge(e)
            winding_out += len(g.input_edge_ids(e)) * (
                P.signed_edge_or_vertex_crossing(
                    iso_out, ref_out, g.vertex(a), g.vertex(c)))
        got = get_snapped_winding_delta(ref_in, ref_v, b, g)
        assert got == winding_out - winding_in, (
            got, winding_out - winding_in)
        n_done += 1
    assert n_done >= 80, (n_done, n_not_isolated)
