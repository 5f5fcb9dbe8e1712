"""S2Builder::Graph — snapped edge graphs and their assembly primitives
(s2builder_graph.h/.cc).

Ports the pieces the output layers need:
  - GraphOptions (edge_type / degenerate_edges / duplicate_edges /
    sibling_pairs) and ProcessEdges, the merge-join edge normalizer
    (s2builder_graph.cc:880-1097)
  - IdSetLexicon (id_set_lexicon.h) for input-edge-id sets and label sets
  - vertex in/out maps, sibling map, input-edge ordering and the loop /
    vector canonicalizations (s2builder_graph.cc:60-370)
  - PolylineBuilder: PATH and WALK assembly with the early-walk-
    termination idempotency rules (s2builder_graph.cc:610-877)
  - LabelFetcher (s2builder_graph.cc:137-160)

Graphs here are driver-side kernel objects (layer assembly is a
per-group operation in the distributed plans); vertices are (N,3)
float64 unit vectors, edges are (v0, v1) int pairs sorted
lexicographically as the reference requires.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass

import numpy as np

# enum values (s2builder.h / s2builder_graph.h)
DIRECTED, UNDIRECTED = "DIRECTED", "UNDIRECTED"
DISCARD, DISCARD_EXCESS, KEEP, MERGE, REQUIRE, CREATE = (
    "DISCARD", "DISCARD_EXCESS", "KEEP", "MERGE", "REQUIRE", "CREATE"
)
PATH, WALK = "PATH", "WALK"
# kNoInputEdgeId = kMaxInputEdgeId - 1 (s2builder_graph.h:298): edges
# without input ids sort LAST in input-edge order, preserving input
# direction for undirected sibling pairs
NO_INPUT_EDGE_ID = (1 << 62) - 2


@dataclass
class GraphOptions:
    edge_type: str = DIRECTED
    degenerate_edges: str = KEEP
    duplicate_edges: str = KEEP
    sibling_pairs: str = KEEP


class IdSetLexicon:
    """id_set_lexicon.h: interned sets of int32 ids."""

    def __init__(self):
        self._sets: list[tuple[int, ...]] = [()]
        self._index: dict[tuple[int, ...], int] = {(): 0}

    EMPTY_SET_ID = 0

    def add(self, ids) -> int:
        key = tuple(sorted(set(int(i) for i in ids)))
        got = self._index.get(key)
        if got is None:
            got = len(self._sets)
            self._sets.append(key)
            self._index[key] = got
        return got

    def id_set(self, set_id: int) -> tuple[int, ...]:
        return self._sets[set_id]


def _reverse(e: tuple[int, int]) -> tuple[int, int]:
    return (e[1], e[0])


def process_edges(
    options: GraphOptions,
    edges: list[tuple[int, int]],
    input_ids: list[int],
    lexicon: IdSetLexicon,
) -> tuple[GraphOptions, list[tuple[int, int]], list[int], str | None]:
    """Graph::ProcessEdges (s2builder_graph.cc:880-1097): dedupe / sibling
    / degenerate handling via a merge join of the out-sorted and
    in-sorted edge orders.  Returns (options, edges, input_ids, error);
    REQUIRE/CREATE flips edge_type to DIRECTED like the reference."""
    error: str | None = None
    n = len(edges)
    out_edges = sorted(range(n), key=lambda i: (edges[i], i))
    in_edges = sorted(range(n), key=lambda i: (_reverse(edges[i]), i))
    new_edges: list[tuple[int, int]] = []
    new_ids: list[int] = []

    def merge_input_ids(idxs: list[int]) -> int:
        if len(idxs) == 1:
            return input_ids[idxs[0]]
        tmp: list[int] = []
        for i in idxs:
            tmp.extend(lexicon.id_set(input_ids[i]))
        return lexicon.add(tmp)

    def add_edges(k: int, edge, set_id: int) -> None:
        for _ in range(k):
            new_edges.append(edge)
            new_ids.append(set_id)

    out = in_ = 0
    SENT = (1 << 62, 1 << 62)
    while True:
        oe = edges[out_edges[out]] if out < n else SENT
        ie = _reverse(edges[in_edges[in_]]) if in_ < n else SENT
        edge = min(oe, ie)
        if edge == SENT:
            break
        out_begin, in_begin = out, in_
        while out < n and edges[out_edges[out]] == edge:
            out += 1
        while in_ < n and _reverse(edges[in_edges[in_]]) == edge:
            in_ += 1
        n_out, n_in = out - out_begin, in_ - in_begin
        out_group = [out_edges[i] for i in range(out_begin, out)]
        if edge[0] == edge[1]:
            # degenerate edge (s2builder_graph.cc:1002-1040)
            assert n_out == n_in
            if options.degenerate_edges == DISCARD:
                continue
            if options.degenerate_edges == DISCARD_EXCESS and (
                (out_begin > 0
                 and edges[out_edges[out_begin - 1]][0] == edge[0])
                or (out < n and edges[out_edges[out]][0] == edge[0])
                or (in_begin > 0
                    and edges[in_edges[in_begin - 1]][1] == edge[0])
                or (in_ < n and edges[in_edges[in_]][1] == edge[0])
            ):
                continue  # non-degenerate incident edges exist
            merge = (
                options.duplicate_edges == MERGE
                or options.degenerate_edges == DISCARD_EXCESS
            )
            if options.edge_type == UNDIRECTED and options.sibling_pairs in (
                REQUIRE, CREATE
            ):
                assert n_out % 2 == 0
                add_edges(1 if merge else n_out // 2, edge,
                          merge_input_ids(out_group))
            elif merge:
                add_edges(2 if options.edge_type == UNDIRECTED else 1,
                          edge, merge_input_ids(out_group))
            elif options.sibling_pairs in (DISCARD, DISCARD_EXCESS):
                add_edges(n_out, edge, merge_input_ids(out_group))
            else:
                for i in out_group:
                    add_edges(1, edge, input_ids[i])
        elif options.sibling_pairs == KEEP:
            if n_out > 1 and options.duplicate_edges == MERGE:
                add_edges(1, edge, merge_input_ids(out_group))
            else:
                for i in out_group:
                    add_edges(1, edge, input_ids[i])
        elif options.sibling_pairs == DISCARD:
            if options.edge_type == DIRECTED:
                if n_out <= n_in:
                    continue
                add_edges(
                    1 if options.duplicate_edges == MERGE else n_out - n_in,
                    edge, merge_input_ids(out_group),
                )
            else:
                if n_out % 2 == 0:
                    continue
                add_edges(1, edge, merge_input_ids(out_group))
        elif options.sibling_pairs == DISCARD_EXCESS:
            if options.edge_type == DIRECTED:
                if n_out < n_in:
                    continue
                add_edges(
                    1 if options.duplicate_edges == MERGE
                    else max(1, n_out - n_in),
                    edge, merge_input_ids(out_group),
                )
            else:
                add_edges(1 if n_out % 2 else 2, edge,
                          merge_input_ids(out_group))
        else:  # REQUIRE or CREATE
            if (
                error is None
                and options.sibling_pairs == REQUIRE
                and (
                    (n_out != n_in)
                    if options.edge_type == DIRECTED
                    else (n_out % 2 != 0)
                )
            ):
                error = "BUILDER_MISSING_EXPECTED_SIBLING_EDGES"
            if options.duplicate_edges == MERGE:
                add_edges(1, edge, merge_input_ids(out_group))
            elif options.edge_type == UNDIRECTED:
                add_edges((n_out + 1) // 2, edge, merge_input_ids(out_group))
            else:
                for i in out_group:
                    add_edges(1, edge, input_ids[i])
                if n_in > n_out:
                    add_edges(n_in - n_out, edge, IdSetLexicon.EMPTY_SET_ID)
    out_options = GraphOptions(**options.__dict__)
    if options.sibling_pairs in (REQUIRE, CREATE):
        out_options.edge_type = DIRECTED
    return out_options, new_edges, new_ids, error


class Graph:
    """S2Builder::Graph over snapped vertices/edges.

    `label_sets` maps input edge id → tuple of labels (the builder's
    label lexicon flattened; empty for absent)."""

    def __init__(
        self,
        options: GraphOptions,
        vertices: np.ndarray,
        edges: list[tuple[int, int]],
        input_id_set_ids: list[int],
        lexicon: IdSetLexicon,
        label_sets: dict[int, tuple[int, ...]] | None = None,
    ):
        assert edges == sorted(edges)
        self.options = options
        self.vertices = np.asarray(vertices, float).reshape(-1, 3)
        self.edges = edges
        self.input_id_set_ids = input_id_set_ids
        self.lexicon = lexicon
        self.label_sets = label_sets or {}

    # ---- basics
    def num_vertices(self) -> int:
        return len(self.vertices)

    def num_edges(self) -> int:
        return len(self.edges)

    def edge(self, e: int) -> tuple[int, int]:
        return self.edges[e]

    def vertex(self, v: int) -> np.ndarray:
        return self.vertices[v]

    def input_edge_ids(self, e: int) -> tuple[int, ...]:
        return self.lexicon.id_set(self.input_id_set_ids[e])

    def min_input_edge_id(self, e: int) -> int:
        ids = self.input_edge_ids(e)
        return min(ids) if ids else NO_INPUT_EDGE_ID

    def get_min_input_edge_ids(self) -> list[int]:
        return [self.min_input_edge_id(e) for e in range(self.num_edges())]

    def get_input_edge_order(self, min_input_ids: list[int]) -> list[int]:
        return sorted(range(len(min_input_ids)),
                      key=lambda e: (min_input_ids[e], e))

    # ---- topology maps (s2builder_graph.cc:60-135)
    def get_in_edge_ids(self) -> list[int]:
        return sorted(range(self.num_edges()),
                      key=lambda e: (_reverse(self.edges[e]), e))

    def make_sibling_map(self, in_edge_ids: list[int]) -> list[int]:
        """In-place fixup for degenerate edges (cc:91-115): consecutive
        identical degenerate edges pair with each other when undirected."""
        if self.options.edge_type == DIRECTED:
            return in_edge_ids
        if self.options.degenerate_edges == DISCARD:
            return in_edge_ids
        e = 0
        while e < self.num_edges():
            v = self.edges[e][0]
            if self.edges[e][1] == v:
                in_edge_ids[e] = e + 1
                in_edge_ids[e + 1] = e
                e += 1
            e += 1
        return in_edge_ids

    def get_sibling_map(self) -> list[int]:
        return self.make_sibling_map(self.get_in_edge_ids())

    # ---- canonicalization (cc:322-366)
    @staticmethod
    def canonicalize_loop_order(min_input_ids: list[int],
                                loop: list[int]) -> None:
        if not loop:
            return
        pos = 0
        saw_gap = False
        for i in range(1, len(loop)):
            cmp = min_input_ids[loop[i]] - min_input_ids[loop[pos]]
            if cmp < 0:
                saw_gap = True
            elif cmp > 0 or not saw_gap:
                pos = i
                saw_gap = False
        pos += 1
        if pos == len(loop):
            pos = 0
        loop[:] = loop[pos:] + loop[:pos]

    @staticmethod
    def canonicalize_vector_order(min_input_ids: list[int],
                                  chains: list[list[int]]) -> None:
        chains.sort(key=lambda c: (min_input_ids[c[0]], c[0]))

    # ---- polyline assembly
    def get_polylines(self, polyline_type: str) -> list[list[int]]:
        assert self.options.sibling_pairs in (DISCARD, DISCARD_EXCESS, KEEP)
        b = _PolylineBuilder(self)
        return b.build_paths() if polyline_type == PATH else b.build_walks()


class VertexOutMap:
    def __init__(self, g: Graph):
        self._firsts = [e[0] for e in g.edges]
        self.n = g.num_vertices()

    def edge_ids(self, v: int) -> range:
        lo = bisect.bisect_left(self._firsts, v)
        hi = bisect.bisect_right(self._firsts, v)
        return range(lo, hi)

    def degree(self, v: int) -> int:
        return len(self.edge_ids(v))


class VertexInMap:
    def __init__(self, g: Graph):
        self.in_edge_ids = g.get_in_edge_ids()
        self._seconds = [g.edges[e][1] for e in self.in_edge_ids]

    def edge_ids(self, v: int) -> list[int]:
        lo = bisect.bisect_left(self._seconds, v)
        hi = bisect.bisect_right(self._seconds, v)
        return [self.in_edge_ids[i] for i in range(lo, hi)]

    def degree(self, v: int) -> int:
        lo = bisect.bisect_left(self._seconds, v)
        return bisect.bisect_right(self._seconds, v) - lo


class LabelFetcher:
    """cc:137-160: sorted-deduped union of labels over an edge's input
    edges (and its sibling's when undirected)."""

    def __init__(self, g: Graph, edge_type: str):
        self.g = g
        self.edge_type = edge_type
        self.sibling_map = (
            g.get_sibling_map() if edge_type == UNDIRECTED else None
        )

    def fetch(self, e: int) -> list[int]:
        labels: list[int] = []
        for iid in self.g.input_edge_ids(e):
            labels.extend(self.g.label_sets.get(iid, ()))
        if self.sibling_map is not None:
            for iid in self.g.input_edge_ids(self.sibling_map[e]):
                labels.extend(self.g.label_sets.get(iid, ()))
        return sorted(set(labels))


class _PolylineBuilder:
    """Graph::PolylineBuilder (cc:610-877)."""

    def __init__(self, g: Graph):
        self.g = g
        self.in_ = VertexInMap(g)
        self.out = VertexOutMap(g)
        self.min_input_ids = g.get_min_input_edge_ids()
        self.directed = g.options.edge_type == DIRECTED
        self.edges_left = g.num_edges() // (1 if self.directed else 2)
        self.used = [False] * g.num_edges()
        self.sibling_map: list[int] = []
        if not self.directed:
            self.sibling_map = g.make_sibling_map(list(self.in_.in_edge_ids))
        self.excess_used: dict[int, int] = {}

    def _is_interior(self, v: int) -> bool:
        if self.directed:
            return self.in_.degree(v) == 1 and self.out.degree(v) == 1
        return self.out.degree(v) == 2

    def _excess_degree(self, v: int) -> int:
        if self.directed:
            return self.out.degree(v) - self.in_.degree(v)
        return self.out.degree(v) % 2

    def build_paths(self) -> list[list[int]]:
        polylines: list[list[int]] = []
        edges = self.g.get_input_edge_order(self.min_input_ids)
        for e in edges:
            if not self.used[e] and not self._is_interior(self.g.edge(e)[0]):
                polylines.append(self._build_path(e))
        for e in edges:
            if self.edges_left == 0:
                break
            if self.used[e]:
                continue
            polyline = self._build_path(e)
            Graph.canonicalize_loop_order(self.min_input_ids, polyline)
            polylines.append(polyline)
        assert self.edges_left == 0
        Graph.canonicalize_vector_order(self.min_input_ids, polylines)
        return polylines

    def _build_path(self, e: int) -> list[int]:
        polyline: list[int] = []
        start = self.g.edge(e)[0]
        while True:
            polyline.append(e)
            assert not self.used[e]
            self.used[e] = True
            if not self.directed:
                self.used[self.sibling_map[e]] = True
            self.edges_left -= 1
            v = self.g.edge(e)[1]
            if not self._is_interior(v) or v == start:
                break
            if self.directed:
                e = self.out.edge_ids(v)[0]
            else:
                for e2 in self.out.edge_ids(v):
                    if not self.used[e2]:
                        e = e2
        return polyline

    def build_walks(self) -> list[list[int]]:
        polylines: list[list[int]] = []
        edges = self.g.get_input_edge_order(self.min_input_ids)
        for e in edges:
            if self.used[e]:
                continue
            v = self.g.edge(e)[0]
            excess = self._excess_degree(v)
            if excess <= 0:
                continue
            excess -= self.excess_used.get(v, 0)
            if (excess <= 0) if self.directed else (excess % 2 == 0):
                continue
            self.excess_used[v] = self.excess_used.get(v, 0) + 1
            polylines.append(self._build_walk(v))
            end = self.g.edge(polylines[-1][-1])[1]
            self.excess_used[end] = self.excess_used.get(end, 0) - 1
        if self.edges_left > 0:
            for polyline in polylines:
                self._maximize_walk(polyline)
        i = 0
        while i < len(edges) and self.edges_left > 0:
            e = edges[i]
            if self.used[e]:
                i += 1
                continue
            v = self.g.edge(e)[0]
            iid = self.min_input_ids[e]
            excess = 0
            j = i
            while j < len(edges) and self.min_input_ids[edges[j]] == iid:
                e2 = edges[j]
                if not self.used[e2]:
                    if self.g.edge(e2)[0] == v:
                        excess += 1
                    if self.g.edge(e2)[1] == v:
                        excess -= 1
                j += 1
            if excess == 1 or self.g.edge(e)[1] == v:
                polyline = self._build_walk(v)
                self._maximize_walk(polyline)
                polylines.append(polyline)
            i += 1
        assert self.edges_left == 0
        Graph.canonicalize_vector_order(self.min_input_ids, polylines)
        return polylines

    def _build_walk(self, v: int) -> list[int]:
        polyline: list[int] = []
        while True:
            best_edge = -1
            best_out_id = 1 << 62
            for e in self.out.edge_ids(v):
                if self.used[e] or self.min_input_ids[e] >= best_out_id:
                    continue
                best_out_id = self.min_input_ids[e]
                best_edge = e
            if best_edge < 0:
                return polyline
            excess = self._excess_degree(v) - self.excess_used.get(v, 0)
            if (excess < 0) if self.directed else (excess % 2 == 1):
                for e in self.in_.edge_ids(v):
                    if not self.used[e] and self.min_input_ids[e] <= best_out_id:
                        return polyline
            polyline.append(best_edge)
            self.used[best_edge] = True
            if not self.directed:
                self.used[self.sibling_map[best_edge]] = True
            self.edges_left -= 1
            v = self.g.edge(best_edge)[1]

    def _maximize_walk(self, polyline: list[int]) -> None:
        i = 0
        while i <= len(polyline):
            v = (
                self.g.edge(polyline[i])[0]
                if i == 0
                else self.g.edge(polyline[i - 1])[1]
            )
            for e in self.out.edge_ids(v):
                if not self.used[e]:
                    loop = self._build_walk(v)
                    assert v == self.g.edge(loop[-1])[1]
                    polyline[i:i] = loop
                    break
            i += 1
