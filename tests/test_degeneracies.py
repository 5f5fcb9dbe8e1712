"""FindPolygonDegeneracies fixtures — port of
s2builderutil_find_polygon_degeneracies_test.cc:155-215 (all 10
deterministic cases incl. the full-polygon variants)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.degeneracies import (
    find_polygon_degeneracies,
    is_fully_degenerate,
)


def _build_graph(spec: str):
    """Mini-DSL from the reference test: loops separated by ';', each a
    closed chain of 'lat:lng' vertices; a loop of one vertex is a
    degenerate self-edge; 'full' sets the IsFullPolygon predicate."""
    is_full = False
    vid: dict[tuple, int] = {}
    verts: list[np.ndarray] = []
    edges: list[tuple[int, int]] = []

    def vertex(lat, lng):
        x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
        p = np.array([x, y, z], float)
        key = tuple(p)
        if key not in vid:
            vid[key] = len(verts)
            verts.append(p)
        return vid[key]

    for loop_str in spec.split(";"):
        loop_str = loop_str.strip()
        if not loop_str:
            continue
        if loop_str == "full":
            is_full = True
            continue
        ids = []
        for tok in loop_str.split(","):
            lat, lng = tok.strip().split(":")
            ids.append(vertex(float(lat), float(lng)))
        if len(ids) == 1:
            edges.append((ids[0], ids[0]))
        else:
            for i in range(len(ids)):
                edges.append((ids[i], ids[(i + 1) % len(ids)]))
    return np.asarray(verts).reshape(-1, 3), edges, is_full


def _expect_degeneracies(spec: str, expected: list[tuple[str, bool]]):
    """ExpectDegeneracies: expected entries are ('lat:lng, lat:lng'
    edge, is_hole)."""
    verts, edges, is_full = _build_graph(spec)
    got = find_polygon_degeneracies(verts, edges, is_full=is_full)

    def edge_key(a, b):
        return (tuple(np.round(verts[a], 12)), tuple(np.round(verts[b], 12)))

    got_set = {(edge_key(*edges[e]), hole) for e, hole in got}
    want_set = set()
    for edge_str, hole in expected:
        a_s, b_s = edge_str.split(",")
        la, ga = a_s.strip().split(":")
        lb, gb = b_s.strip().split(":")
        xa, ya, za = latlng_to_xyz(np.float64(float(la)), np.float64(float(ga)))
        xb, yb, zb = latlng_to_xyz(np.float64(float(lb)), np.float64(float(gb)))
        want_set.add(
            (
                (
                    tuple(np.round(np.array([xa, ya, za]), 12)),
                    tuple(np.round(np.array([xb, yb, zb]), 12)),
                ),
                hole,
            )
        )
    assert got_set == want_set, (spec, got_set, want_set)
    # every degenerate edge is reported exactly once
    assert len(got) == len({e for e, _ in got})


def test_empty_polygon():
    _expect_degeneracies("", [])


def test_no_degeneracies():
    _expect_degeneracies("0:0, 0:1, 1:0", [])


def test_point_shell():
    _expect_degeneracies("0:0", [("0:0, 0:0", False)])


def test_sibling_pair_shells():
    _expect_degeneracies(
        "0:0, 0:1, 1:0; 1:0, 0:1, 0:0",
        [
            ("0:0, 0:1", False), ("0:1, 0:0", False), ("0:1, 1:0", False),
            ("1:0, 0:1", False), ("0:0, 1:0", False), ("1:0, 0:0", False),
        ],
    )


def test_attached_sibling_pair_shells():
    _expect_degeneracies(
        "0:0, 0:1, 1:0; 1:0, 2:0",
        [("1:0, 2:0", False), ("2:0, 1:0", False)],
    )


def test_attached_sibling_pair_holes():
    _expect_degeneracies(
        "0:0, 0:3, 3:0; 0:0, 1:1",
        [("0:0, 1:1", True), ("1:1, 0:0", True)],
    )


def test_attached_sibling_pair_shells_and_holes():
    _expect_degeneracies(
        "0:0, 0:3, 3:0; 3:0, 1:1; 3:0, 5:5",
        [
            ("3:0, 1:1", True), ("1:1, 3:0", True),
            ("3:0, 5:5", False), ("5:5, 3:0", False),
        ],
    )


def test_degenerate_shells_outside_loop():
    _expect_degeneracies(
        "0:0, 0:3, 3:3, 3:0; 4:4, 5:5; 6:6",
        [
            ("4:4, 5:5", False), ("5:5, 4:4", False), ("6:6, 6:6", False),
        ],
    )


def test_degenerate_holes_within_loop():
    _expect_degeneracies(
        "0:0, 0:5, 5:5, 5:0; 1:1, 2:2; 3:3",
        [
            ("1:1, 2:2", True), ("2:2, 1:1", True), ("3:3, 3:3", True),
        ],
    )


def test_point_hole_within_full():
    _expect_degeneracies("full; 0:0", [("0:0, 0:0", True)])


def test_sibling_pair_holes_within_full():
    _expect_degeneracies(
        "full; 0:0, 0:1, 1:0; 1:0, 0:1, 0:0",
        [
            ("0:0, 0:1", True), ("0:1, 0:0", True), ("0:1, 1:0", True),
            ("1:0, 0:1", True), ("0:0, 1:0", True), ("1:0, 0:0", True),
        ],
    )


def test_is_fully_degenerate():
    _, edges, _ = _build_graph("0:0, 0:1, 1:0; 1:0, 0:1, 0:0")
    assert is_fully_degenerate(edges)
    _, edges, _ = _build_graph("0:0, 0:1, 1:0")
    assert not is_fully_degenerate(edges)
