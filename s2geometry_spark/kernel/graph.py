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


# ---------------------------------------------------------------- loops
SIMPLE, CIRCUIT = "SIMPLE", "CIRCUIT"
DEGENERATE_DISCARD, DEGENERATE_KEEP = "DISCARD", "KEEP"


class _VertexEdge:
    __slots__ = ("incoming", "index", "endpoint", "rank")

    def __init__(self, incoming: bool, index: int, endpoint: int, rank: int):
        self.incoming = incoming
        self.index = index
        self.endpoint = endpoint
        self.rank = rank


def _add_vertex_edges(out_begin, out_end, in_begin, in_end, v1, v0_edges):
    """AddVertexEdges (s2builder_graph.cc:196-233): interleave duplicate
    outgoing/incoming edges into as many 2-edge loops as possible."""
    rank = 0
    while in_end - in_begin > out_end - out_begin:
        in_end -= 1
        v0_edges.append(_VertexEdge(True, in_end, v1, rank))
        rank += 1
    while in_end > in_begin:
        v0_edges.append(_VertexEdge(False, out_begin, v1, rank))
        out_begin += 1
        rank += 1
        in_end -= 1
        v0_edges.append(_VertexEdge(True, in_end, v1, rank))
        rank += 1
    while out_end > out_begin:
        v0_edges.append(_VertexEdge(False, out_begin, v1, rank))
        out_begin += 1
        rank += 1


def get_left_turn_map(g: Graph, in_edge_ids: list[int]
                      ) -> tuple[list[int], str | None]:
    """Graph::GetLeftTurnMap (s2builder_graph.cc:236-320): for each
    incoming edge, the outgoing edge that makes the sharpest left turn,
    i.e. the next edge in CLOCKWISE order around the shared vertex."""
    import functools

    from .predicates import ordered_ccw

    error: str | None = None
    n = g.num_edges()
    left_turn_map = [-1] * n
    if n == 0:
        return left_turn_map, None
    out = in_ = 0
    SENT = (g.num_vertices(), g.num_vertices())

    def out_e():
        return g.edges[out] if out < n else SENT

    def in_e():
        return _reverse(g.edges[in_edge_ids[in_]]) if in_ < n else SENT

    min_edge = min(out_e(), in_e())
    v0_edges: list[_VertexEdge] = []
    while min_edge != SENT:
        v0 = min_edge[0]
        while min_edge[0] == v0:
            v1 = min_edge[1]
            out_begin, in_begin = out, in_
            while out_e() == min_edge:
                out += 1
            while in_e() == min_edge:
                in_ += 1
            if v0 != v1:
                _add_vertex_edges(out_begin, out, in_begin, in_, v1, v0_edges)
            else:
                # each degenerate edge becomes its own loop
                for k in range(in_begin, in_):
                    left_turn_map[k] = k
            min_edge = min(out_e(), in_e())
        if not v0_edges:
            continue
        min_endpoint = v0_edges[0].endpoint

        def cmp(a: _VertexEdge, b: _VertexEdge) -> int:
            def less(x, y):
                if x.endpoint == y.endpoint:
                    return x.rank < y.rank
                if x.endpoint == min_endpoint:
                    return True
                if y.endpoint == min_endpoint:
                    return False
                return not ordered_ccw(
                    g.vertex(x.endpoint), g.vertex(y.endpoint),
                    g.vertex(min_endpoint), g.vertex(v0),
                )

            if less(a, b):
                return -1
            if less(b, a):
                return 1
            return 0

        v0_edges[1:] = sorted(v0_edges[1:], key=functools.cmp_to_key(cmp))
        e_in: list[int] = []
        e_out: list[int] = []
        for ve in v0_edges:
            if ve.incoming:
                e_in.append(in_edge_ids[ve.index])
            elif e_in:
                left_turn_map[e_in.pop()] = ve.index
            else:
                e_out.append(ve.index)
        e_out.reverse()
        while e_out and e_in:
            left_turn_map[e_in.pop()] = e_out.pop()
        if e_in and error is None:
            error = "BUILDER_EDGES_DO_NOT_FORM_LOOPS"
        e_in.clear()
        e_out.clear()
        v0_edges.clear()
    return left_turn_map, error


def get_directed_loops(g: Graph, loop_type: str
                       ) -> tuple[list[list[int]], str | None]:
    """Graph::GetDirectedLoops (s2builder_graph.cc:368-420)."""
    left_turn_map, error = get_left_turn_map(g, g.get_in_edge_ids())
    if error:
        return [], error
    min_input_ids = g.get_min_input_edge_ids()
    path_index = [-1] * g.num_vertices() if loop_type == SIMPLE else None
    loops: list[list[int]] = []
    path: list[int] = []
    for start in range(g.num_edges()):
        if left_turn_map[start] < 0:
            continue
        e = start
        while left_turn_map[e] >= 0:
            path.append(e)
            nxt = left_turn_map[e]
            left_turn_map[e] = -1
            if loop_type == SIMPLE:
                path_index[g.edge(e)[0]] = len(path) - 1
                loop_start = path_index[g.edge(e)[1]]
                if loop_start >= 0:
                    loop = path[loop_start:]
                    del path[loop_start:]
                    for e2 in loop:
                        path_index[g.edge(e2)[0]] = -1
                    Graph.canonicalize_loop_order(min_input_ids, loop)
                    loops.append(loop)
            e = nxt
        if loop_type == SIMPLE:
            assert not path
        else:
            Graph.canonicalize_loop_order(min_input_ids, path)
            loops.append(path)
            path = []
    Graph.canonicalize_vector_order(min_input_ids, loops)
    return loops, None


def _mark_edge_used(slot: int) -> int:
    return -1 - slot


def get_undirected_components(g: Graph, loop_type: str
                              ) -> tuple[list, str | None]:
    """Graph::GetUndirectedComponents (s2builder_graph.cc:513-607): each
    component is a pair of complementary loop sets; slot 0 is the one
    whose first loop best follows the input edge ordering."""
    sibling_map = g.get_in_edge_ids()
    left_turn_map, error = get_left_turn_map(g, sibling_map)
    if error:
        return [], error
    sibling_map = g.make_sibling_map(sibling_map)
    min_input_ids = g.get_min_input_edge_ids()
    components: list[list[list[list[int]]]] = []
    frontier: list[tuple[int, int]] = []
    path_index = [-1] * g.num_vertices() if loop_type == SIMPLE else None
    for min_start in range(g.num_edges()):
        if left_turn_map[min_start] < 0:
            continue
        component: list[list[list[int]]] = [[], []]
        frontier.append((min_start, 0))
        while frontier:
            start, slot = frontier.pop()
            if left_turn_map[start] < 0:
                continue
            path: list[int] = []
            e = start
            while left_turn_map[e] >= 0:
                path.append(e)
                nxt = left_turn_map[e]
                left_turn_map[e] = _mark_edge_used(slot)
                sibling = sibling_map[e]
                if left_turn_map[sibling] >= 0:
                    frontier.append((sibling, 1 - slot))
                elif left_turn_map[sibling] != _mark_edge_used(1 - slot):
                    return [], "BUILDER_EDGES_DO_NOT_FORM_LOOPS"
                if loop_type == SIMPLE:
                    path_index[g.edge(e)[0]] = len(path) - 1
                    loop_start = path_index[g.edge(e)[1]]
                    if loop_start >= 0:
                        loop = path[loop_start:]
                        del path[loop_start:]
                        for e2 in loop:
                            path_index[g.edge(e2)[0]] = -1
                        Graph.canonicalize_loop_order(min_input_ids, loop)
                        component[slot].append(loop)
                e = nxt
            if loop_type == SIMPLE:
                assert not path
            else:
                Graph.canonicalize_loop_order(min_input_ids, path)
                component[slot].append(path)
        Graph.canonicalize_vector_order(min_input_ids, component[0])
        Graph.canonicalize_vector_order(min_input_ids, component[1])
        if (min_input_ids[component[0][0][0]]
                > min_input_ids[component[1][0][0]]):
            component[0], component[1] = component[1], component[0]
        components.append(component)
    components.sort(key=lambda c: min_input_ids[c[0][0][0]])
    return components, None


def get_directed_components(g: Graph, degenerate_boundaries: str
                            ) -> tuple[list, str | None]:
    """Graph::GetDirectedComponents (s2builder_graph.cc:422-511):
    connected components of directed loops via the sibling frontier;
    degenerate_boundaries is "KEEP" or "DISCARD"."""
    sibling_map = g.get_sibling_map()
    left_turn_map, error = get_left_turn_map(g, g.get_in_edge_ids())
    if error:
        return [], error
    min_input_ids = g.get_min_input_edge_ids()
    components: list[list[list[int]]] = []
    path_index = (
        [-1] * g.num_edges()
        if degenerate_boundaries == "DISCARD"
        else None
    )
    frontier: list[int] = []
    for start in range(g.num_edges()):
        if left_turn_map[start] < 0:
            continue
        component: list[list[int]] = []
        frontier.append(start)
        while frontier:
            e = frontier.pop()
            if left_turn_map[e] < 0:
                continue
            path: list[int] = []
            while left_turn_map[e] >= 0:
                path.append(e)
                nxt = left_turn_map[e]
                left_turn_map[e] = -1
                sibling = sibling_map[e]
                if left_turn_map[sibling] >= 0:
                    frontier.append(sibling)
                if path_index is not None:
                    path_index[e] = len(path) - 1
                    sib_idx = path_index[sibling]
                    if sib_idx >= 0:
                        if sib_idx == len(path) - 2:
                            del path[sib_idx:]
                        else:
                            loop = path[sib_idx + 1 : -1]
                            del path[sib_idx:]
                            for e2 in loop:
                                path_index[e2] = -1
                            Graph.canonicalize_loop_order(min_input_ids, loop)
                            component.append(loop)
                e = nxt
            if path_index is not None:
                for e2 in path:
                    path_index[e2] = -1
            Graph.canonicalize_loop_order(min_input_ids, path)
            component.append(path)
        Graph.canonicalize_vector_order(min_input_ids, component)
        components.append(component)
    components.sort(key=lambda c: min_input_ids[c[0][0]])
    return components, None


def make_subgraph(
    old_edge_type: str,
    new_options: "GraphOptions",
    edges: list[tuple[int, int]],
    input_ids: list[int],
    lexicon: "IdSetLexicon",
):
    """Graph::MakeSubgraph (s2builder_graph.cc:1132-1161): when a
    DIRECTED graph feeds an UNDIRECTED subgraph, append a reversed twin
    (with an empty input-edge-id set) for every edge, then run
    ProcessEdges under the new options."""
    edges = list(edges)
    input_ids = list(input_ids)
    if old_edge_type == DIRECTED and new_options.edge_type == UNDIRECTED:
        n = len(edges)
        empty = lexicon.add([])  # IdSetLexicon::EmptySetId
        for i in range(n):
            a, b = edges[i]
            edges.append((b, a))
            input_ids.append(empty)
    return process_edges(new_options, edges, input_ids, lexicon)
