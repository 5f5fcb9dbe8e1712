"""Closed-set normalization across dimensions
(s2builderutil_closed_set_normalizer.cc:30-260).

Given three edge graphs over one shared vertex table — points (dim 0,
self-edges), polylines (dim 1), polygons (dim 2) — remove polygon and
polyline degeneracies by DEMOTING them (closed model semantics):

  - polygon sibling pairs: holes discarded, shells demoted to polyline
    edges;
  - degenerate polygon edges: holes discarded, shells demoted to points;
  - degenerate polyline edges: demoted to points;
  - optionally, lower-dimensional duplicates of higher-dimensional
    features are suppressed (polyline edges coinciding with polygon
    edges; points coinciding with any line/polygon vertex).

The shell/hole classification comes from kernel/degeneracies.py
(FindPolygonDegeneracies).  The reference streams the three sorted edge
vectors through one merge join (NormalizeEdges :168-228); this port
keeps that structure.
"""

from __future__ import annotations

import numpy as np

from .degeneracies import find_polygon_degeneracies

SENTINEL = (1 << 62, 1 << 62)


def _advance(edges: list[tuple[int, int]], i: int) -> tuple[int, tuple[int, int]]:
    i += 1
    return i, (edges[i] if i < len(edges) else SENTINEL)


def normalize_closed_set(
    vertices: np.ndarray,
    edges0: list[tuple[int, int]],
    edges1: list[tuple[int, int]],
    edges2: list[tuple[int, int]],
    suppress_lower_dimensions: bool = True,
    is_full: bool = False,
    polyline_undirected: bool = True,
) -> tuple[list, list, list]:
    """Returns the three normalized edge lists (sorted).

    Inputs must be sorted lexicographically; an undirected polyline graph
    stores both directions of every edge (the S2Builder::Graph model), in
    which case each demoted degenerate polyline edge contributes ONE
    point (the second copy is skipped, :219-220)."""
    V = np.asarray(vertices, float).reshape(-1, 3)
    edges0 = sorted(edges0)
    edges1 = sorted(edges1)
    edges2 = sorted(edges2)

    is_suppressed = [False] * len(V)
    in_edges2: list[tuple[int, int]] = []
    if suppress_lower_dimensions:
        for a, b in edges1 + edges2:
            if a != b:
                is_suppressed[a] = True
                is_suppressed[b] = True
        in_edges2 = sorted((b, a) for a, b in edges2)

    degeneracies = dict(find_polygon_degeneracies(V, edges2, is_full=is_full))

    new0: list[tuple[int, int]] = []
    new1: list[tuple[int, int]] = []
    new2: list[tuple[int, int]] = []

    e0 = e1 = e2 = -1
    in_e2 = -1
    e0, edge0 = _advance(edges0, e0)
    e1, edge1 = _advance(edges1, e1)
    e2, edge2 = _advance(edges2, e2)
    in_e2, in_edge2 = _advance(in_edges2, in_e2)
    while True:
        if edge2 <= edge1 and edge2 <= edge0:
            if edge2 == SENTINEL:
                break
            if e2 not in degeneracies:
                # normal polygon edge
                new2.append(edge2)
                while suppress_lower_dimensions and edge1 == edge2:
                    e1, edge1 = _advance(edges1, e1)
            elif not degeneracies[e2]:
                # degenerate shell
                if edge2[0] != edge2[1]:
                    new1.append(edge2)
                    # a demoted edge must not suppress coincident
                    # polyline edges
                    while edge1 == edge2:
                        new1.append(edge1)
                        e1, edge1 = _advance(edges1, e1)
                else:
                    # single-vertex shell; may still be suppressed by an
                    # incident polyline edge
                    if not (suppress_lower_dimensions and is_suppressed[edge2[0]]):
                        new0.append(edge2)
            # holes are discarded
            e2, edge2 = _advance(edges2, e2)
        elif edge1 <= edge0:
            if edge1[0] != edge1[1]:
                # non-degenerate polyline edge: suppressed when it
                # coincides with a polygon edge in EITHER direction
                while in_edge2 < edge1:
                    in_e2, in_edge2 = _advance(in_edges2, in_e2)
                if edge1 != in_edge2:
                    new1.append(edge1)
            else:
                # degenerate polyline edge → point
                if not (suppress_lower_dimensions and is_suppressed[edge1[0]]):
                    new0.append(edge1)
                if polyline_undirected:
                    e1 += 1  # skip the reverse copy
            e1, edge1 = _advance(edges1, e1)
        else:
            # input point
            if not (suppress_lower_dimensions and is_suppressed[edge0[0]]):
                new0.append(edge0)
            e0, edge0 = _advance(edges0, e0)
    return sorted(new0), sorted(new1), sorted(new2)


def merge_duplicate_edges(edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Graph::ProcessEdges DuplicateEdges::MERGE: collapse identical
    directed edges."""
    return sorted(set(edges))
