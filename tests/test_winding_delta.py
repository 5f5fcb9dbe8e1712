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
