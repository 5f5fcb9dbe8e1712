"""S2PolygonLayer fixture ports (s2builderutil_s2polygon_layer_test.cc).

Polygon comparisons are canonical-multiset over normalized loops (the
reference compares normalized S2Polygon strings; loop ORDER there comes
from S2Polygon::InitNested, which is a container detail — the loop SET
plus orientations is the layer contract being tested).
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.graph import DIRECTED, UNDIRECTED
from s2geometry_spark.kernel.layers import Builder, PolygonLayer
from s2geometry_spark.kernel.measures import loop_signed_area


def _canon_loop(v: np.ndarray) -> tuple:
    v = np.asarray(v, float).reshape(-1, 3)
    if loop_signed_area(v) < 0:
        v = v[::-1]
    rows = [tuple(np.round(r, 12)) for r in v]
    k = rows.index(min(rows))
    return tuple(rows[k:] + rows[:k])


def _canon_polygon(loops) -> tuple:
    return tuple(sorted(_canon_loop(lv) for lv in loops))


def _parse_polygon(s: str):
    if not s.strip():
        return []
    return [parse_points(part) for part in s.split(";") if part.strip()]


def build_polygon(input_strs, edge_type, is_full=False, validate=False):
    b = Builder()
    layer = PolygonLayer(edge_type=edge_type, validate=validate)
    b.start_layer(layer)
    for s in input_strs:
        if s == "full":
            continue
        b.add_polygon(_parse_polygon(s))
    b.add_is_full_polygon_predicate(is_full)
    err = b.build()
    return layer, err


def check_polygon(input_strs, expected_str):
    is_full = any(s == "full" for s in input_strs)
    for et in (DIRECTED, UNDIRECTED):
        layer, err = build_polygon(input_strs, et, is_full=is_full)
        assert err is None, (et, err)
        if expected_str == "full":
            assert layer.is_full and not layer.loops
        elif expected_str == "":
            assert not layer.is_full and not layer.loops
        else:
            assert _canon_polygon(layer.loops) == _canon_polygon(
                _parse_polygon(expected_str)
            ), et


def check_unchanged(s):
    check_polygon([s], s)


def check_error(input_strs, expected_codes):
    for et in (DIRECTED, UNDIRECTED):
        b = Builder()
        layer = PolygonLayer(edge_type=et, validate=True)
        b.start_layer(layer)
        for s in input_strs:
            b.add_polyline(parse_points(s))
        err = b.build()
        assert err in expected_codes, (et, err)


def test_empty():
    check_unchanged("")


def test_full():
    check_polygon(["full"], "full")


def test_small_loop():
    check_unchanged("0:0, 0:1, 1:1")


def test_three_loops():
    check_unchanged(
        "0:1, 1:1, 0:0; "
        "3:3, 3:6, 6:6, 6:3; "
        "4:4, 4:5, 5:5, 5:4"
    )


def test_partial_loop():
    check_error(["0:1, 2:3, 4:5"], {"BUILDER_EDGES_DO_NOT_FORM_LOOPS"})


def test_invalid_polygon():
    check_error(
        ["0:0, 0:10, 10:0, 10:10, 0:0"],
        {"LOOP_SELF_INTERSECTION", "OVERLAPPING_GEOMETRY"},
    )


def test_duplicate_input_edges():
    for et in (DIRECTED,):
        b = Builder()
        layer = PolygonLayer(edge_type=et, validate=True)
        b.start_layer(layer)
        b.add_polyline(parse_points("0:0, 0:2, 2:2, 1:1, 0:2, 2:2, 2:0, 0:0"))
        err = b.build()
        assert err in {
            "POLYGON_LOOPS_SHARE_EDGE",
            "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS",
        }
        assert len(layer.loops) == 2
        got = _canon_polygon(layer.loops)
        want = _canon_polygon(
            [parse_points("0:0, 0:2, 2:2, 2:0"),
             parse_points("0:2, 2:2, 1:1")]
        )
        assert got == want


def _edge_labels_case(edge_type):
    b = Builder()
    layer = PolygonLayer(edge_type=edge_type, with_labels=True)
    b.start_layer(layer)
    pl = parse_points(
        "0:0, 9:1, 1:9, 0:0, 2:8, 8:2, 0:0, 0:10, 10:10, 10:0, 0:0"
    )
    edge_label_map: dict[tuple, set] = {}
    for i in range(len(pl) - 1):
        label = i
        b.set_label(label)
        d = 1 if edge_type == DIRECTED else (i & 1)
        b.add_edge(pl[i + (1 - d)], pl[i + d])
        key = tuple(np.round(pl[i] + pl[i + 1], 12))
        edge_label_map.setdefault(key, set()).add(label)
    assert b.build() is None
    assert sorted(len(x) for x in layer.label_set_ids) == [3, 3, 4]
    for li, loop in enumerate(layer.loops):
        n = len(loop)
        for j in range(n):
            key = tuple(np.round(loop[j] + loop[(j + 1) % n], 12))
            expected = edge_label_map[key]
            got = set(
                layer.label_set_lexicon.id_set(layer.label_set_ids[li][j])
            )
            assert got == expected, (li, j)


def test_directed_edge_labels():
    _edge_labels_case(DIRECTED)


def test_undirected_edge_labels():
    _edge_labels_case(UNDIRECTED)


def test_labels_requested_but_not_provided():
    b = Builder()
    layer = PolygonLayer(with_labels=True)
    b.start_layer(layer)
    b.add_polyline(parse_points("0:0, 0:1, 1:0, 0:0"))
    assert b.build() is None
    assert len(layer.label_set_ids) == 1
    assert len(layer.label_set_ids[0]) == 3
    for sid in layer.label_set_ids[0]:
        assert layer.label_set_lexicon.id_set(sid) == ()


def test_three_loops_into_one():
    check_polygon(
        ["10:0, 0:0, 0:10, 5:10, 10:10, 10:5",
         "0:10, 0:15, 5:15, 5:10",
         "10:10, 5:10, 5:5, 10:5"],
        "10:5, 10:0, 0:0, 0:10, 0:15, 5:15, 5:10, 5:5",
    )


def test_triangle_pyramid():
    check_polygon(
        ["0:0, 0:2, 0:4, 0:6, 1:5, 2:4, 3:3, 2:2, 1:1",
         "0:2, 1:1, 1:3",
         "0:4, 1:3, 1:5",
         "1:3, 2:2, 2:4"],
        "0:4, 0:6, 1:5; 2:4, 3:3, 2:2; 2:2, 1:1, 1:3; "
        "1:1, 0:0, 0:2; 1:3, 0:2, 0:4; 1:3, 1:5, 2:4",
    )


def test_complex_nesting():
    check_unchanged(
        "47:15, 47:5, 5:5, 5:15; "
        "35:12, 35:7, 27:7, 27:12; "
        "1:50, 50:50, 50:1, 1:1; "
        "42:22, 10:22, 10:25, 42:25; "
        "47:30, 47:17, 5:17, 5:30; "
        "7:27, 45:27, 45:20, 7:20; "
        "37:7, 37:12, 45:12, 45:7; "
        "47:47, 47:32, 5:32, 5:47; "
        "50:60, 50:55, 1:55, 1:60; "
        "25:7, 17:7, 17:12, 25:12; "
        "7:7, 7:12, 15:12, 15:7"
    )


def test_five_loops_touching_at_one_common_point():
    check_unchanged(
        "0:0, 0:10, 10:10, 10:0; "
        "0:0, 1:9, 9:9, 9:1; "
        "0:0, 2:8, 8:8, 8:2; "
        "0:0, 3:7, 7:7, 7:3; "
        "0:0, 4:6, 6:6, 6:4"
    )


def test_four_nested_diamonds_touching_at_two_points_per_pair():
    check_polygon(
        ["0:10, -10:0, 0:-10, 10:0",
         "0:-20, -10:0, 0:20, 10:0",
         "0:-10, -5:0, 0:10, 5:0",
         "0:5, -5:0, 0:-5, 5:0"],
        "10:0, 0:10, -10:0, 0:20; "
        "0:-20, -10:0, 0:-10, 10:0; "
        "5:0, 0:-10, -5:0, 0:-5; "
        "0:5, -5:0, 0:10, 5:0",
    )


def test_seven_diamonds_touching_at_one_point_per_pair():
    """S2PolygonLayer.SevenDiamondsTouchingAtOnePointPerPair
    (s2builderutil_s2polygon_layer_test.cc): seven nested diamonds,
    each touching its neighbor at exactly one vertex, survive the
    round trip unchanged."""
    check_unchanged(
        "0:-70, -70:0, 0:70, 70:0; "
        "0:-70, -60:0, 0:60, 60:0; "
        "0:-50, -60:0, 0:50, 50:0; "
        "0:-40, -40:0, 0:50, 40:0; "
        "0:-30, -30:0, 0:30, 40:0; "
        "0:-20, -20:0, 0:30, 20:0; "
        "0:-10, -20:0, 0:10, 10:0"
    )
