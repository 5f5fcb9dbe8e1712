"""Polygon degeneracy classification
(s2builderutil_find_polygon_degeneracies.cc:30-402).

FindPolygonDegeneracies decides, for every degenerate edge of a polygon
graph (self-edges and sibling pairs), whether it is a SHELL (lies
outside the non-degenerate polygon interior) or a HOLE (lies inside):

  - degenerate edges and unbalanced vertices are marked with one pass
    over the sorted edges (ComputeDegeneracies :185-215);
  - connected components grow BFS from each unvisited degeneracy,
    tracking same-side parity via incident-edge crossing counts
    (BuildComponent :221-253, CrossingParity :255-285);
  - a component's root sign comes from ContainsVertexQuery at an
    unbalanced vertex (ContainsVertexSign :293-302) or, when the
    component is fully degenerate, by counting edge-or-vertex crossings
    along a path from a vertex of known sign
    (ComputeUnknownSignsBruteForce :304-323);
  - the all-degenerate graph classifies by the is_full predicate
    (Run :115-125).

The boolean/winding ops already EMIT degeneracies; this module is the
reference's standalone classifier over an arbitrary snapped edge graph,
used to validate them and exposed for layer assembly.
"""

from __future__ import annotations

import numpy as np

from .predicates import (
    ContainsVertexQuery,
    edge_or_vertex_crossing,
    ordered_ccw,
    ortho,
)


def find_polygon_degeneracies(
    vertices: np.ndarray,
    edges: list[tuple[int, int]],
    is_full: bool = False,
) -> list[tuple[int, bool]]:
    """Returns sorted [(edge_id, is_hole)] for every degenerate edge.

    `vertices` is an (N, 3) array; `edges` directed vertex-id pairs
    (a polygon interior is to the left of each edge); `is_full` is the
    IsFullPolygon predicate value used when ALL edges are degenerate."""
    V = np.asarray(vertices, float).reshape(-1, 3)
    n_edges = len(edges)
    if n_edges == 0:
        return []

    out_ids: list[list[int]] = [[] for _ in range(len(V))]
    in_ids: list[list[int]] = [[] for _ in range(len(V))]
    for e, (a, b) in enumerate(edges):
        out_ids[a].append(e)
        in_ids[b].append(e)

    # -- ComputeDegeneracies ------------------------------------------
    edge_set = set(edges)
    is_edge_degeneracy = [False] * n_edges
    is_vertex_unbalanced = [False] * len(V)
    num_degeneracies = 0
    for e, (a, b) in enumerate(edges):
        if a == b or (b, a) in edge_set:
            is_edge_degeneracy[e] = True
            num_degeneracies += 1
        else:
            is_vertex_unbalanced[a] = True
    if num_degeneracies == 0:
        return []
    if num_degeneracies == n_edges:
        return [(e, is_full) for e in range(n_edges)]

    # -- CrossingParity (s2builderutil_find_polygon_degeneracies.cc:255) --
    def crossing_parity(v0: int, v1: int, include_same: bool) -> bool:
        crossings = 0
        p0 = V[v0]
        p1 = V[v1]
        p0_ref = ortho(p0)
        for e in out_ids[v0]:
            w = edges[e][1]
            if w == v1:
                if include_same:
                    crossings += 1
            elif ordered_ccw(p0_ref, V[w], p1, p0):
                crossings += 1
        for e in in_ids[v0]:
            w = edges[e][0]
            if w == v1:
                if include_same:
                    crossings += 1
            elif ordered_ccw(p0_ref, V[w], p1, p0):
                crossings += 1
        return bool(crossings & 1)

    def contains_vertex_sign(v0: int) -> int:
        q = ContainsVertexQuery(V[v0])
        for e in out_ids[v0]:
            q.add_edge(V[edges[e][1]], 1)
        for e in in_ids[v0]:
            q.add_edge(V[edges[e][0]], -1)
        return q.contains_sign()

    # -- BuildComponent BFS -------------------------------------------
    is_vertex_used = [False] * len(V)
    components = []  # (root, root_sign, [(edge_id, same_inside)])
    known_vertex = -1
    known_vertex_sign = 0
    num_unknown_signs = 0
    for e0 in range(n_edges):
        if not is_edge_degeneracy[e0]:
            continue
        root = edges[e0][0]
        if is_vertex_used[root]:
            continue
        root_sign = 0
        degeneracies: list[tuple[int, bool]] = []
        frontier = [(root, True)]
        is_vertex_used[root] = True
        while frontier:
            v0, v0_same_inside = frontier.pop()
            if root_sign == 0 and is_vertex_unbalanced[v0]:
                v0_sign = contains_vertex_sign(v0)
                assert v0_sign != 0
                root_sign = v0_sign if v0_same_inside else -v0_sign
            for e in out_ids[v0]:
                v1 = edges[e][1]
                same_inside = v0_same_inside ^ crossing_parity(v0, v1, False)
                if is_edge_degeneracy[e]:
                    degeneracies.append((e, same_inside))
                if is_vertex_used[v1]:
                    continue
                same_inside ^= crossing_parity(v1, v0, True)
                frontier.append((v1, same_inside))
                is_vertex_used[v1] = True
        if root_sign == 0:
            num_unknown_signs += 1
        else:
            known_vertex = root
            known_vertex_sign = root_sign
        components.append([root, root_sign, degeneracies])

    # -- ComputeUnknownSigns (brute force) ----------------------------
    if num_unknown_signs > 0:
        if known_vertex_sign == 0:
            known_vertex = next(
                v for v in range(len(V)) if is_vertex_unbalanced[v]
            )
            known_vertex_sign = contains_vertex_sign(known_vertex)
        for comp in components:
            if comp[1] != 0:
                continue
            inside = known_vertex_sign > 0
            a0 = V[known_vertex]
            a1 = V[comp[0]]
            for e in range(n_edges):
                if is_edge_degeneracy[e]:
                    continue
                b0, b1 = V[edges[e][0]], V[edges[e][1]]
                inside ^= edge_or_vertex_crossing(a0, a1, b0, b1)
            comp[1] = 1 if inside else -1

    # -- MergeDegeneracies --------------------------------------------
    result = []
    for root, root_sign, degeneracies in components:
        assert root_sign != 0
        invert = root_sign < 0
        for edge_id, same_inside in degeneracies:
            result.append((edge_id, bool(same_inside) ^ invert))
    return sorted(result)


def is_fully_degenerate(edges: list[tuple[int, int]]) -> bool:
    """IsFullyDegenerate (s2builderutil_find_polygon_degeneracies.cc:390)."""
    edge_set = set(edges)
    for a, b in edges:
        if a == b:
            continue
        if (b, a) not in edge_set:
            return False
    return True
