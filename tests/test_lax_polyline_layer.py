"""s2builderutil_lax_polyline_layer_test.cc port: LaxPolylineLayer
assembles snapped edges into one lax polyline (degenerate edges KEPT,
no validation — antipodal/duplicate vertices are admitted)."""

from __future__ import annotations

import numpy as np

from s2geometry_spark.kernel.builder import IntLatLngSnapFunction
from s2geometry_spark.kernel.contains import format_points, parse_points
from s2geometry_spark.kernel.graph import DIRECTED, UNDIRECTED
from s2geometry_spark.kernel.layers import Builder, LaxPolylineLayer


def _build(input_strs, edge_type, snap=None, split=False):
    b = Builder(snap=snap, split_crossing_edges=split)
    layer = LaxPolylineLayer(edge_type=edge_type)
    b.start_layer(layer)
    for s in input_strs:
        b.add_polyline(parse_points(s))
    err = b.build()
    assert err is None, err
    return format_points(layer.polyline) if len(layer.polyline) else ""


def check(input_strs, expected, snap=None, split=False):
    for et in (DIRECTED, UNDIRECTED):
        assert _build(input_strs, et, snap, split) == expected, et


def check_unchanged(s):
    check([s], s)


class TestLaxPolylineLayer:
    # s2builderutil_lax_polyline_layer_test.cc:93-200
    def test_no_edges(self):
        check([], "")

    def test_one_edge(self):
        check_unchanged("3:4, 1:1")
        check_unchanged("1:1, 3:4")

    def test_straight_line_with_backtracking(self):
        check_unchanged("0:0, 1:0, 2:0, 3:0, 2:0, 1:0, 2:0, 3:0, 4:0")

    def test_early_walk_termination_with_end_loop1(self):
        check(["0:0, 0:2, 0:1"], "0:0, 0:1, 0:2, 0:1",
              snap=IntLatLngSnapFunction(2))

    def test_early_walk_termination_with_end_loop2(self):
        check(["0:0, 0:1", "0:2, 0:1", "0:1, 0:2"], "0:0, 0:1, 0:2, 0:1")

    def test_simple_loop(self):
        check_unchanged("0:0, 0:5, 5:5, 5:0, 0:0")

    def test_many_loops(self):
        check_unchanged(
            "0:0, 2:2, 2:4, 2:2, 2:4, 4:4, 4:2, 2:2, 4:4, 4:2, 2:2, 2:0, "
            "2:2, 2:0, 4:0, 2:2, 4:2, 2:2, 0:2, 0:4, 2:2, 0:4, 0:2, 2:2, "
            "0:4, 2:2, 0:2, 2:2, 0:0, 0:2, 2:2, 0:0"
        )

    def test_unordered_loops(self):
        check(
            [
                "3:3, 3:2, 2:2, 2:3, 3:3",
                "1:0, 0:0, 0:1, 1:1, 1:0",
                "3:1, 3:0, 2:0, 2:1, 3:1",
                "1:3, 1:2, 0:2, 0:1, 1:3",
                "1:1, 1:2, 2:2, 2:1, 1:1",
            ],
            "3:3, 3:2, 2:2, 2:1, 3:1, 3:0, 2:0, 2:1, 1:1, 1:0, 0:0, "
            "0:1, 1:1, 1:2, 0:2, 0:1, 1:3, 1:2, 2:2, 2:3, 3:3",
        )

    def test_split_edges(self):
        check(
            ["0:10, 0:0, 1:0, -1:2, 1:4, -1:6, 1:8, -1:10, -5:0, 0:0, 0:10"],
            "0:10, 0:9, 0:7, 0:5, 0:3, 0:1, 0:0, 1:0, 0:1, -1:2, 0:3, 1:4, "
            "0:5, -1:6, 0:7, 1:8, 0:9, -1:10, -5:0, 0:0, 0:1, 0:3, 0:5, "
            "0:7, 0:9, 0:10",
            snap=IntLatLngSnapFunction(7), split=True,
        )

    def test_simple_edge_labels(self):
        b = Builder()
        layer = LaxPolylineLayer(edge_type=UNDIRECTED, with_labels=True)
        b.start_layer(layer)
        b.set_label(5)
        b.add_polyline(parse_points("0:0, 0:1, 0:2"))
        b.push_label(7)
        b.add_polyline(parse_points("0:3, 0:2"))
        b.clear_labels()
        b.add_polyline(parse_points("0:3, 0:4, 0:5"))
        b.set_label(11)
        b.add_polyline(parse_points("0:6, 0:5"))
        assert b.build() is None
        expected = [[5], [5], [5, 7], [], [], [11]]
        got = [sorted(layer.label_set_lexicon.id_set(i))
               for i in layer.label_set_ids]
        assert got == expected

    def test_antipodal_vertices(self):
        # PolylineLayer.validate would reject this; lax admits it.
        b = Builder()
        layer = LaxPolylineLayer()
        b.start_layer(layer)
        b.add_edge(np.array([1.0, 0, 0]), np.array([-1.0, 0, 0]))
        assert b.build() is None
        assert layer.polyline.shape == (2, 3)
        assert np.all(layer.polyline[0] == [1, 0, 0])
        assert np.all(layer.polyline[1] == [-1, 0, 0])

    def test_degenerate_edge_kept(self):
        # DegenerateEdges::KEEP is the one GraphOptions difference from
        # S2PolylineLayer: a point along the walk survives.
        b = Builder()
        layer = LaxPolylineLayer()
        b.start_layer(layer)
        b.add_polyline(parse_points("0:0, 0:1"))
        p = parse_points("0:1")[0]
        b.add_edge(p, p)
        b.add_polyline(parse_points("0:1, 0:2"))
        assert b.build() is None
        assert format_points(layer.polyline) == "0:0, 0:1, 0:1, 0:2"
