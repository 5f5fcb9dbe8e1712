"""ClosedSetNormalizer fixtures — port of
s2builderutil_closed_set_normalizer_test.cc:162-259 (all 11 Run cases
incl. the suppress_lower_dimensions=False variants and duplicate-edge
merging)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.closed_set import (
    merge_duplicate_edges,
    normalize_closed_set,
)
from s2geometry_spark.kernel.coords import latlng_to_xyz


class _GraphBuilder:
    def __init__(self):
        self.vid: dict[tuple, int] = {}
        self.verts: list[np.ndarray] = []

    def vertex(self, tok: str) -> int:
        lat, lng = tok.strip().split(":")
        x, y, z = latlng_to_xyz(np.float64(float(lat)), np.float64(float(lng)))
        p = np.array([x, y, z], float)
        key = tuple(p)
        if key not in self.vid:
            self.vid[key] = len(self.verts)
            self.verts.append(p)
        return self.vid[key]

    def parse(self, spec: str, polyline_undirected: bool = True):
        """MakeIndex DSL "points # polylines # polygons" into three edge
        lists (the GraphAppendingLayer construction: undirected polyline
        graphs store both edge directions)."""
        sections = spec.split("#")
        while len(sections) < 3:
            sections.append("")
        edges0 = []
        for tok in sections[0].replace("|", ",").split(","):
            if tok.strip():
                v = self.vertex(tok)
                edges0.append((v, v))
        edges1 = []
        for line in sections[1].split("|"):
            ids = [self.vertex(t) for t in line.split(",") if t.strip()]
            for i in range(len(ids) - 1):
                edges1.append((ids[i], ids[i + 1]))
                if polyline_undirected:
                    edges1.append((ids[i + 1], ids[i]))
        edges2 = []
        for poly in sections[2].split("|"):
            for loop in poly.split(";"):
                ids = [self.vertex(t) for t in loop.split(",") if t.strip()]
                if len(ids) == 1:
                    edges2.append((ids[0], ids[0]))
                else:
                    for i in range(len(ids)):
                        edges2.append((ids[i], ids[(i + 1) % len(ids)]))
        return sorted(edges0), sorted(edges1), sorted(edges2)


def _run(input_str, expected_str, suppress=True, polyline_undirected=True,
         merge_duplicates=False):
    g = _GraphBuilder()
    in0, in1, in2 = g.parse(input_str, polyline_undirected)
    want0, want1, want2 = g.parse(expected_str, polyline_undirected)
    V = np.asarray(g.verts).reshape(-1, 3) if g.verts else np.zeros((0, 3))
    got0, got1, got2 = normalize_closed_set(
        V, in0, in1, in2,
        suppress_lower_dimensions=suppress,
        polyline_undirected=polyline_undirected,
    )
    if merge_duplicates:
        got0 = merge_duplicate_edges(got0)
        got1 = merge_duplicate_edges(got1)
        want0 = merge_duplicate_edges(want0)
        want1 = merge_duplicate_edges(want1)
    assert got0 == want0, ("dim0", got0, want0)
    assert got1 == want1, ("dim1", got1, want1)
    assert got2 == want2, ("dim2", got2, want2)


def test_empty_graphs():
    _run("# #", "# #")


def test_non_degenerate_inputs():
    _run("0:0 # 1:0, 1:1 | 1:2, 1:3 # 2:2, 2:3, 3:2",
         "0:0 # 1:0, 1:1 | 1:2, 1:3 # 2:2, 2:3, 3:2")


def test_point_shell():
    _run("# # 0:0", "0:0 # #")


def test_point_hole():
    _run("# # 0:0, 0:3, 3:0 | 1:1", "# # 0:0, 0:3, 3:0")


def test_point_polyline():
    # undirected degenerate polyline edge demotes to ONE point
    _run("# 0:0, 0:0 #", "0:0 # #")


def test_sibling_pair_shell():
    _run("# # 0:0, 1:0 ", "# 0:0, 1:0 #")


def test_sibling_pair_hole():
    _run("# # 0:0, 0:3, 3:0; 0:0, 1:1", "# # 0:0, 0:3, 3:0")


def test_point_suppressed_by_polygon_vertex():
    _run("0:0 | 0:1 | 1:0 # # 0:0, 0:1, 1:0", "# # 0:0, 0:1, 1:0")
    _run("0:0 | 0:1 | 1:0 # # 0:0, 0:1, 1:0",
         "0:0 | 0:1 | 1:0 # # 0:0, 0:1, 1:0", suppress=False)


def test_point_suppressed_by_polyline_vertex():
    _run("0:0 | 0:1 # 0:0, 0:1 #", "# 0:0, 0:1 #")
    _run("0:0 | 0:1 # 0:0, 0:1 #", "0:0 | 0:1 # 0:0, 0:1 #", suppress=False)


def test_point_shell_suppressed_by_polyline_edge():
    # single-point shells demoted to points, then suppressed by the
    # polyline's vertices
    _run("# 0:0, 1:0 # 0:0; 1:0", "# 0:0, 1:0 #")
    _run("# 0:0, 1:0 # 0:0; 1:0", "0:0 | 1:0 # 0:0, 1:0 #", suppress=False)


def test_polyline_edge_suppressed_by_polygon_edge():
    _run("# 0:0, 0:1 # 0:0, 0:1, 1:0", "# # 0:0, 0:1, 1:0")
    _run("# 0:0, 0:1 # 0:0, 0:1, 1:0", "# 0:0, 0:1 # 0:0, 0:1, 1:0",
         suppress=False)


def test_polyline_edge_suppressed_by_reverse_polygon_edge():
    # directed polyline layer
    _run("# 1:0, 0:0 # 0:0, 0:1, 1:0", "# # 0:0, 0:1, 1:0",
         polyline_undirected=False)
    _run("# 1:0, 0:0 # 0:0, 0:1, 1:0", "# 1:0, 0:0 # 0:0, 0:1, 1:0",
         suppress=False, polyline_undirected=False)


def test_duplicate_edge_merging():
    # KEEP: demoted edges add up
    _run("0:0 | 0:0 # 0:0, 0:0 | 0:1, 0:2 # 0:0; 0:1, 0:2",
         "0:0 | 0:0 | 0:0 | 0:0 # 0:1, 0:2 | 0:1, 0:2 #")
    # MERGE: duplicates collapse
    _run("0:0 | 0:0 # 0:0, 0:0 | 0:1, 0:2 # 0:0; 0:1, 0:2",
         "0:0 # 0:1, 0:2 #", merge_duplicates=True)
