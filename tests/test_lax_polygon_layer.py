"""Port of s2builderutil_lax_polygon_layer_test.cc over
kernel/layers.LaxPolygonLayer (the DIRECTED surface; the reference's
UNDIRECTED path is itself unimplemented, test.cc:169, and the
IndexedLaxPolygonLayer wrappers are MutableS2ShapeIndex plumbing)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.contains import format_points, parse_points
from s2geometry_spark.kernel.graph import DIRECTED
from s2geometry_spark.kernel.layers import Builder, LaxPolygonLayer

ALL_DB = [
    LaxPolygonLayer.DISCARD,
    LaxPolygonLayer.DISCARD_HOLES,
    LaxPolygonLayer.DISCARD_SHELLS,
    LaxPolygonLayer.KEEP,
]


def parse_lax(s: str) -> list[np.ndarray]:
    loops = []
    for tok in s.split(";"):
        tok = tok.strip()
        if not tok:
            continue
        if tok == "full":
            loops.append(np.empty((0, 3)))
        else:
            loops.append(parse_points(tok))
    return loops


def lax_to_string(loops: list[np.ndarray]) -> str:
    out = []
    for loop in loops:
        out.append("full" if len(loop) == 0 else format_points(loop))
    return "; ".join(out)


def run_lax_polygon(input_str: str, expected_str: str, db: str):
    """TestLaxPolygon (test.cc:76-103), DIRECTED."""
    builder = Builder()
    layer = LaxPolygonLayer(edge_type=DIRECTED, degenerate_boundaries=db)
    builder.start_layer(layer)
    loops = parse_lax(input_str)
    has_full = any(len(l) == 0 for l in loops)
    for loop in loops:
        builder.add_loop(loop)
    builder.add_is_full_polygon_predicate(has_full)
    error = builder.build()
    assert error is None, error
    assert lax_to_string(layer.loops) == expected_str, db


def run_lax_polygon_unchanged(input_str: str, db: str):
    run_lax_polygon(input_str, input_str, db)


def test_empty():
    for db in ALL_DB:
        run_lax_polygon_unchanged("", db)


def test_full():
    for db in ALL_DB:
        run_lax_polygon_unchanged("full", db)


def test_one_normal_shell():
    for db in ALL_DB:
        run_lax_polygon_unchanged("0:0, 0:1, 1:1", db)


def test_two_normal_shells_one_normal_hole():
    for db in ALL_DB:
        run_lax_polygon_unchanged(
            "0:1, 1:1, 0:0; 3:3, 3:6, 6:6, 6:3; 4:4, 5:4, 5:5, 4:5", db
        )


def test_all_degenerate_shells():
    for db in (LaxPolygonLayer.KEEP, LaxPolygonLayer.DISCARD_HOLES):
        run_lax_polygon_unchanged("1:1; 2:2, 3:3", db)
    for db in (LaxPolygonLayer.DISCARD, LaxPolygonLayer.DISCARD_SHELLS):
        run_lax_polygon("1:1; 2:2, 3:3", "", db)


def test_all_degenerate_holes():
    for db in (LaxPolygonLayer.KEEP, LaxPolygonLayer.DISCARD_SHELLS):
        run_lax_polygon_unchanged("full; 1:1; 2:2, 3:3", db)
    for db in (LaxPolygonLayer.DISCARD, LaxPolygonLayer.DISCARD_HOLES):
        run_lax_polygon("full; 1:1; 2:2, 3:3", "full", db)


def test_some_degenerate_shells():
    normal = "0:0, 0:9, 9:0; 1:1, 7:1, 1:7"
    inp = normal + "; 3:2; 2:2, 2:3"
    run_lax_polygon_unchanged(inp, LaxPolygonLayer.KEEP)
    run_lax_polygon_unchanged(inp, LaxPolygonLayer.DISCARD_HOLES)
    run_lax_polygon(inp, normal, LaxPolygonLayer.DISCARD)
    run_lax_polygon(inp, normal, LaxPolygonLayer.DISCARD_SHELLS)


def test_some_degenerate_holes():
    for db in (LaxPolygonLayer.KEEP, LaxPolygonLayer.DISCARD_SHELLS):
        run_lax_polygon_unchanged("0:0, 0:9, 9:0; 1:1; 2:2, 3:3", db)
    for db in (LaxPolygonLayer.DISCARD, LaxPolygonLayer.DISCARD_HOLES):
        run_lax_polygon(
            "0:0, 0:9, 9:0; 1:1; 2:2, 3:3", "0:0, 0:9, 9:0", db
        )


def test_normal_and_degenerate_shells_and_holes():
    """NormalAndDegenerateShellsAndHoles (test.cc:222-253)."""
    normal = (
        "0:0, 0:9, 9:9, 9:0; "
        "0:10, 0:19, 9:19, 9:10; 1:11, 8:11, 8:18, 1:18"
    )
    normal_with_degen_holes = (
        "0:0, 0:9, 1:8, 1:7, 1:8, 0:9, 9:9, 9:0; "
        "0:10, 0:19, 9:19, 9:10, 0:10, 1:11, 8:11, 8:18, 1:18, 1:11"
    )
    degen_shells = "0:9, 0:10; 2:12; 3:13, 3:14; 20:20; 10:0, 10:1"
    degen_holes = "2:5; 3:6, 3:7; 8:8"
    inp = (
        normal_with_degen_holes + "; " + degen_shells + "; " + degen_holes
    )
    run_lax_polygon(inp, normal, LaxPolygonLayer.DISCARD)
    run_lax_polygon(
        inp, normal + "; " + degen_shells, LaxPolygonLayer.DISCARD_HOLES
    )
    run_lax_polygon(
        inp,
        normal_with_degen_holes + "; " + degen_holes,
        LaxPolygonLayer.DISCARD_SHELLS,
    )
    run_lax_polygon(inp, inp, LaxPolygonLayer.KEEP)


def test_partial_loop():
    """PartialLoop (test.cc:255-264): open chains are an error."""
    builder = Builder()
    layer = LaxPolygonLayer()
    builder.start_layer(layer)
    builder.add_polyline(parse_points("0:1, 2:3, 4:5"))
    error = builder.build()
    assert error is not None
    assert not layer.loops


def test_duplicate_input_edges():
    """DuplicateInputEdges (test.cc:283-302): duplicate edges removed
    without losing degeneracies."""
    builder = Builder()
    layer = LaxPolygonLayer(
        degenerate_boundaries=LaxPolygonLayer.KEEP
    )
    builder.start_layer(layer)
    builder.add_loop(parse_points("0:0, 0:5, 5:5, 5:0"))
    builder.add_point(parse_points("0:0")[0])
    builder.add_point(parse_points("1:1")[0])
    builder.add_point(parse_points("1:1")[0])
    builder.add_loop(parse_points("2:2, 2:3"))
    builder.add_loop(parse_points("2:2, 2:3"))
    error = builder.build()
    assert error is None, error
    assert lax_to_string(layer.loops) == "0:0, 0:5, 5:5, 5:0; 1:1; 2:2, 2:3"


def test_edge_labels():
    """EdgeLabels (test.cc:304-358), DIRECTED: every output edge carries
    exactly the labels of the matching input edges."""
    input_str = (
        "1:1, 1:2; 0:0, 0:9, 9:9, 9:0; 1:2, 1:1; "
        "3:3, 8:3, 8:8, 3:8; 4:4; 4:5, 5:5; 4:4"
    )
    label_begin = 1234
    for db in ALL_DB:
        builder = Builder()
        layer = LaxPolygonLayer(
            degenerate_boundaries=db, with_labels=True
        )
        builder.start_layer(layer)
        edge_label_map: dict = {}
        e = 0
        for loop in parse_lax(input_str):
            n = len(loop)
            for i in range(n):
                label = label_begin + e
                builder.set_label(label)
                v0, v1 = loop[i], loop[(i + 1) % n]
                builder.add_edge(v0, v1)
                edge_label_map.setdefault(
                    (tuple(v0), tuple(v1)), set()
                ).add(label)
                e += 1
        builder.add_is_full_polygon_predicate(False)
        error = builder.build()
        assert error is None, error
        for li, loop in enumerate(layer.loops):
            n = len(loop)
            for j in range(n):
                v0, v1 = loop[j], loop[(j + 1) % n]
                expected = edge_label_map[(tuple(v0), tuple(v1))]
                got = set(
                    layer.label_set_lexicon.id_set(
                        layer.label_set_ids[li][j]
                    )
                )
                assert got == expected, (db, li, j)
