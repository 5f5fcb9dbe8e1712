"""S2Builder output-layer fixture ports:
s2builderutil_s2polyline_layer_test.cc (assembly + labels + validation),
s2builderutil_s2polyline_vector_layer_test.cc (PATH/WALK idempotency),
s2builderutil_s2point_vector_layer_test.cc (MERGE/KEEP duplicates).
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.builder import IntLatLngSnapFunction
from s2geometry_spark.kernel.contains import format_points, parse_points
from s2geometry_spark.kernel.graph import DIRECTED, DISCARD, MERGE, UNDIRECTED, WALK
from s2geometry_spark.kernel.layers import (
    Builder,
    PointVectorLayer,
    PolylineLayer,
    PolylineVectorLayer,
)


def _build_polyline(input_strs, edge_type, snap=None, split=False):
    b = Builder(snap=snap, split_crossing_edges=split)
    layer = PolylineLayer(edge_type=edge_type)
    b.start_layer(layer)
    for s in input_strs:
        b.add_polyline(parse_points(s))
    err = b.build()
    assert err is None, err
    return format_points(layer.polyline) if len(layer.polyline) else ""


def check_polyline(input_strs, expected, snap=None, split=False):
    for et in (DIRECTED, UNDIRECTED):
        assert _build_polyline(input_strs, et, snap, split) == expected, et


def check_unchanged(s):
    check_polyline([s], s)


class TestS2PolylineLayer:
    def test_no_edges(self):
        check_polyline([], "")

    def test_one_edge(self):
        check_unchanged("3:4, 1:1")
        check_unchanged("1:1, 3:4")

    def test_straight_line_with_backtracking(self):
        check_unchanged("0:0, 1:0, 2:0, 3:0, 2:0, 1:0, 2:0, 3:0, 4:0")

    def test_early_walk_termination_with_end_loop1(self):
        check_polyline(
            ["0:0, 0:2, 0:1"], "0:0, 0:1, 0:2, 0:1",
            snap=IntLatLngSnapFunction(2),
        )

    def test_early_walk_termination_with_end_loop2(self):
        check_polyline(
            ["0:0, 0:1", "0:2, 0:1", "0:1, 0:2"], "0:0, 0:1, 0:2, 0:1"
        )

    def test_simple_loop(self):
        check_unchanged("0:0, 0:5, 5:5, 5:0, 0:0")

    def test_many_loops(self):
        check_unchanged(
            "0:0, 2:2, 2:4, 2:2, 2:4, 4:4, 4:2, 2:2, 4:4, 4:2, 2:2, 2:0, 2:2, "
            "2:0, 4:0, 2:2, 4:2, 2:2, 0:2, 0:4, 2:2, 0:4, 0:2, 2:2, 0:4, 2:2, "
            "0:2, 2:2, 0:0, 0:2, 2:2, 0:0"
        )

    def test_unordered_loops(self):
        check_polyline(
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
        check_polyline(
            ["0:10, 0:0, 1:0, -1:2, 1:4, -1:6, 1:8, -1:10, -5:0, 0:0, 0:10"],
            "0:10, 0:9, 0:7, 0:5, 0:3, 0:1, 0:0, 1:0, 0:1, -1:2, 0:3, 1:4, "
            "0:5, -1:6, 0:7, 1:8, 0:9, -1:10, -5:0, 0:0, 0:1, 0:3, 0:5, 0:7, "
            "0:9, 0:10",
            snap=IntLatLngSnapFunction(7),
            split=True,
        )

    def test_simple_edge_labels(self):
        b = Builder()
        layer = PolylineLayer(edge_type=UNDIRECTED, with_labels=True)
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
        got = [
            list(layer.label_set_lexicon.id_set(sid))
            for sid in layer.label_set_ids
        ]
        assert got == expected

    def test_invalid_polyline(self):
        b = Builder()
        layer = PolylineLayer(validate=True)
        b.start_layer(layer)
        b.add_edge([1.0, 0.0, 0.0], [-1.0, 0.0, 0.0])
        assert b.build() == "ANTIPODAL_VERTICES"


def _build_vector(input_strs, edge_type, layer_kwargs, snap=None):
    b = Builder(snap=snap)
    layer = PolylineVectorLayer(edge_type=edge_type, **layer_kwargs)
    b.start_layer(layer)
    for s in input_strs:
        b.add_polyline(parse_points(s))
    err = b.build()
    assert err is None, err
    return [format_points(p) for p in layer.polylines]


def check_vector(input_strs, expected, edge_types=(DIRECTED, UNDIRECTED),
                 snap=None, **layer_kwargs):
    for et in edge_types:
        got = _build_vector(input_strs, et, layer_kwargs, snap)
        assert got == list(expected), et


class TestS2PolylineVectorLayer:
    def test_no_edges(self):
        check_vector([], [])

    def test_two_polylines(self):
        check_vector(["0:0, 1:1, 2:2", "4:4, 3:3"],
                     ["0:0, 1:1, 2:2", "4:4, 3:3"])

    def test_joining_polylines(self):
        check_vector(
            ["1:1, 2:2", "3:3, 2:2", "0:0, 1:1"],
            ["3:3, 2:2", "0:0, 1:1, 2:2"], edge_types=(DIRECTED,),
        )
        check_vector(
            ["1:1, 2:2", "3:3, 2:2", "0:0, 1:1"],
            ["3:3, 2:2, 1:1, 0:0"], edge_types=(UNDIRECTED,),
        )

    def test_segment_network(self):
        inputs = [
            "0:0, 1:1, 2:2",
            "2:2, 2:3, 2:4",
            "2:4, 3:4, 4:4",
            "2:2, 3:2, 4:2",
            "4:2, 4:3, 4:4",
            "1:0, 2:2",
            "0:1, 2:2",
            "5:4, 4:4",
            "4:5, 4:4",
            "2:4, 2:5, 1:5, 1:4, 2:4",
            "4:2, 6:1, 5:0",
            "4:2, 7:0, 6:-1",
            "11:1, 11:0, 10:0, 10:1, 11:1",
        ]
        check_vector(inputs, inputs)

    def test_multiple_intersecting_walks(self):
        inputs = [
            "5:5, 5:6, 6:5, 5:5, 5:4, 5:3",
            "4:4, 5:5, 6:5, 5:6, 5:5, 5:6, 6:5, 5:5, 4:5",
            "3:5, 5:5, 5:6, 6:5, 5:5, 5:6, 6:6, 7:7",
        ]
        check_vector(inputs, inputs, polyline_type=WALK)

    def test_early_walk_termination(self):
        inputs = ["0:1, 1:1", "1:0, 1:1, 1:2", "0:2, 1:2, 2:2",
                  "2:1, 2:2, 2:3"]
        check_vector(inputs, inputs, polyline_type=WALK)

    def test_input_edge_starts_multiple_loops(self):
        inputs = [
            "0:10, 0:0",
            "0:6, 1:6, 1:7, 0:7, 0:8",
            "0:8, 1:8, 1:9, 0:9, 0:10",
            "0:2, 1:2, 1:3, 0:3, 0:4",
            "0:0, 1:0, 1:1, 0:1, 0:2",
            "0:4, 1:4, 1:5, 0:5, 0:6",
        ]
        expected = [
            "0:1, 0:0, 1:0, 1:1, 0:1",
            "0:3, 0:2, 1:2, 1:3, 0:3",
            "0:5, 0:4, 1:4, 1:5, 0:5",
            "0:7, 0:6, 1:6, 1:7, 0:7",
            "0:9, 0:8, 1:8, 1:9, 0:9",
        ]
        check_vector(
            inputs, expected, polyline_type=WALK, sibling_pairs=DISCARD,
            snap=IntLatLngSnapFunction(7),
        )

    def test_validate_true(self):
        b = Builder()
        layer = PolylineVectorLayer(validate=True)
        b.start_layer(layer)
        b.add_edge([1.0, 0.0, 0.0], [-1.0, 0.0, 0.0])
        assert b.build() == "ANTIPODAL_VERTICES"

    def test_simple_edge_labels(self):
        b = Builder()
        layer = PolylineVectorLayer(
            edge_type=UNDIRECTED, duplicate_edges=MERGE, with_labels=True
        )
        b.start_layer(layer)
        b.set_label(1)
        b.add_polyline(parse_points("0:0, 0:1, 0:2"))
        b.set_label(2)
        b.add_polyline(parse_points("0:3, 0:2, 0:1"))
        b.clear_labels()
        b.add_polyline(parse_points("0:4, 0:5"))
        assert b.build() is None
        expected = [[[1], [1, 2], [2]], [[]]]
        got = [
            [list(layer.label_set_lexicon.id_set(sid)) for sid in pl]
            for pl in layer.label_set_ids
        ]
        assert got == expected


class TestS2PointVectorLayer:
    def _run(self, duplicate_edges):
        b = Builder()
        layer = PointVectorLayer(duplicate_edges=duplicate_edges,
                                 with_labels=True)
        b.start_layer(layer)
        b.set_label(1)
        b.add_point(parse_points("0:1")[0])
        b.add_point(parse_points("0:2")[0])
        b.set_label(2)
        b.add_point(parse_points("0:1")[0])
        b.add_point(parse_points("0:4")[0])
        b.add_point(parse_points("0:5")[0])
        b.clear_labels()
        b.add_point(parse_points("0:5")[0])
        b.add_point(parse_points("0:6")[0])
        err = b.build()
        assert err is None, err
        pts = format_points(np.asarray(layer.points))
        labels = [
            list(layer.label_set_lexicon.id_set(sid))
            for sid in layer.label_set_ids
        ]
        return pts, labels

    def test_merge_duplicates(self):
        pts, labels = self._run("MERGE")
        assert pts == "0:1, 0:2, 0:4, 0:5, 0:6"
        assert labels == [[1, 2], [1], [2], [2], []]

    def test_keep_duplicates(self):
        pts, labels = self._run("KEEP")
        assert pts == "0:1, 0:1, 0:2, 0:4, 0:5, 0:5, 0:6"
        assert labels == [[1], [2], [1], [2], [2], [], []]

    def test_error_on_nondegenerate_edges(self):
        b = Builder()
        layer = PointVectorLayer()
        b.start_layer(layer)
        b.add_point(parse_points("0:1")[0])
        b.add_edge(parse_points("0:0")[0], parse_points("1:1")[0])
        b.add_point(parse_points("0:2")[0])
        err = b.build()
        assert err is not None and "non-degenerate" in err
        assert len(layer.points) == 2
