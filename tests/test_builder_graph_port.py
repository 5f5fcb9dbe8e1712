"""Port of s2builder_graph_test.cc: the full ProcessEdges option matrix
(25 cases) plus the degenerate-edge loop/component/polyline tests.

Graphs are constructed directly from parsed vertices (the reference
routes them through S2Builder with an identity snap; the graph-level
semantics under test are identical).  MakeSubgraph's storage-aliasing
assertions are C++-specific and covered here by the ProcessEdges matrix
it delegates to."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.graph import (
    CREATE,
    DIRECTED,
    DISCARD,
    DISCARD_EXCESS,
    KEEP,
    MERGE,
    PATH,
    REQUIRE,
    UNDIRECTED,
    WALK,
    Graph,
    GraphOptions,
    IdSetLexicon,
    get_directed_components,
    get_directed_loops,
    get_undirected_components,
    process_edges,
)


def run_process_edges(
    input_edges: list,
    expected: list,
    options: GraphOptions,
    expected_error: bool = False,
) -> GraphOptions:
    """TestProcessEdges (test.cc:236-261).  Edges are (v0, v1) or
    (v0, v1, [input_ids])."""
    lexicon = IdSetLexicon()
    edges = []
    input_ids = []
    for e in input_edges:
        edges.append((e[0], e[1]))
        ids = e[2] if len(e) > 2 else []
        input_ids.append(lexicon.add(ids))
    options, edges, input_ids, error = process_edges(
        options, edges, input_ids, lexicon
    )
    if expected_error:
        assert error is not None
    else:
        assert error is None, error
    assert len(edges) == len(input_ids)
    got = [
        (v0, v1, list(lexicon.id_set(sid)))
        for (v0, v1), sid in zip(edges, input_ids)
    ]
    want = [(e[0], e[1], list(e[2]) if len(e) > 2 else []) for e in expected]
    assert got == want
    return options


def opts(et, de, du, sp) -> GraphOptions:
    return GraphOptions(
        edge_type=et, degenerate_edges=de, duplicate_edges=du,
        sibling_pairs=sp,
    )


def test_discard_degenerate_edges():
    run_process_edges(
        [(0, 0), (0, 0)], [], opts(DIRECTED, DISCARD, KEEP, KEEP)
    )


def test_keep_duplicate_degenerate_edges():
    run_process_edges(
        [(0, 0), (0, 0)], [(0, 0), (0, 0)], opts(DIRECTED, KEEP, KEEP, KEEP)
    )


def test_merge_duplicate_degenerate_edges():
    run_process_edges(
        [(0, 0, [1]), (0, 0, [2])],
        [(0, 0, [1, 2])],
        opts(DIRECTED, KEEP, MERGE, KEEP),
    )


def test_merge_undirected_duplicate_degenerate_edges():
    run_process_edges(
        [(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])],
        [(0, 0, [1, 2]), (0, 0, [1, 2])],
        opts(UNDIRECTED, KEEP, MERGE, KEEP),
    )


def test_converted_undirected_degenerate_edges():
    options = run_process_edges(
        [(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])],
        [(0, 0, [1, 2]), (0, 0, [1, 2])],
        opts(UNDIRECTED, KEEP, KEEP, REQUIRE),
    )
    assert options.edge_type == DIRECTED


def test_merge_converted_undirected_duplicate_degenerate_edges():
    options = run_process_edges(
        [(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])],
        [(0, 0, [1, 2])],
        opts(UNDIRECTED, KEEP, MERGE, REQUIRE),
    )
    assert options.edge_type == DIRECTED


def test_discard_excess_connected_degenerate_edges():
    o = opts(DIRECTED, DISCARD_EXCESS, KEEP, KEEP)
    run_process_edges([(0, 0), (0, 1)], [(0, 1)], o)
    run_process_edges([(0, 0), (1, 0)], [(1, 0)], o)
    run_process_edges([(0, 1), (1, 1)], [(0, 1)], o)
    run_process_edges([(1, 0), (1, 1)], [(1, 0)], o)


def test_discard_excess_isolated_degenerate_edges():
    run_process_edges(
        [(0, 0, [1]), (0, 0, [2])],
        [(0, 0, [1, 2])],
        opts(DIRECTED, DISCARD_EXCESS, KEEP, KEEP),
    )


def test_discard_excess_undirected_isolated_degenerate_edges():
    run_process_edges(
        [(0, 0, [1]), (0, 0), (0, 0, [2]), (0, 0)],
        [(0, 0, [1, 2]), (0, 0, [1, 2])],
        opts(UNDIRECTED, DISCARD_EXCESS, KEEP, KEEP),
    )


def test_discard_excess_converted_undirected_isolated_degenerate_edges():
    options = run_process_edges(
        [(0, 0, [1]), (0, 0, [2]), (0, 0, [3]), (0, 0)],
        [(0, 0, [1, 2, 3])],
        opts(UNDIRECTED, DISCARD_EXCESS, KEEP, REQUIRE),
    )
    assert options.edge_type == DIRECTED


def test_sibling_pairs_discard_merges_degenerate_edge_labels():
    o = opts(DIRECTED, KEEP, KEEP, DISCARD)
    run_process_edges(
        [(0, 0, [1]), (0, 0, [2]), (0, 0, [3])],
        [(0, 0, [1, 2, 3]), (0, 0, [1, 2, 3]), (0, 0, [1, 2, 3])],
        o,
    )
    o = opts(DIRECTED, KEEP, KEEP, DISCARD_EXCESS)
    run_process_edges(
        [(0, 0, [1]), (0, 0, [2]), (0, 0, [3])],
        [(0, 0, [1, 2, 3]), (0, 0, [1, 2, 3]), (0, 0, [1, 2, 3])],
        o,
    )


def test_keep_sibling_pairs():
    run_process_edges(
        [(0, 1), (1, 0)], [(0, 1), (1, 0)],
        opts(DIRECTED, DISCARD, KEEP, KEEP),
    )


def test_merge_duplicate_sibling_pairs():
    run_process_edges(
        [(0, 1), (0, 1), (1, 0)], [(0, 1), (1, 0)],
        opts(DIRECTED, DISCARD, MERGE, KEEP),
    )


def test_discard_sibling_pairs():
    o = opts(DIRECTED, DISCARD, KEEP, DISCARD)
    run_process_edges([(0, 1), (1, 0)], [], o)
    run_process_edges([(0, 1), (0, 1), (1, 0), (1, 0)], [], o)
    run_process_edges(
        [(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1), (0, 1)], o
    )
    run_process_edges(
        [(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0), (1, 0)], o
    )


def test_discard_sibling_pairs_merge_duplicates():
    o = opts(DIRECTED, DISCARD, MERGE, DISCARD)
    run_process_edges([(0, 1), (0, 1), (1, 0), (1, 0)], [], o)
    run_process_edges([(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1)], o)
    run_process_edges([(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0)], o)


def test_discard_undirected_sibling_pairs():
    o = opts(UNDIRECTED, DISCARD, KEEP, DISCARD)
    run_process_edges([(0, 1), (1, 0)], [(0, 1), (1, 0)], o)
    run_process_edges([(0, 1), (0, 1), (1, 0), (1, 0)], [], o)
    run_process_edges(
        [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
        [(0, 1), (1, 0)],
        o,
    )


def test_discard_excess_sibling_pairs():
    o = opts(DIRECTED, DISCARD, KEEP, DISCARD_EXCESS)
    run_process_edges([(0, 1), (1, 0)], [(0, 1), (1, 0)], o)
    run_process_edges(
        [(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)], o
    )
    run_process_edges(
        [(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1), (0, 1)], o
    )
    run_process_edges(
        [(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0), (1, 0)], o
    )


def test_discard_excess_sibling_pairs_merge_duplicates():
    o = opts(DIRECTED, DISCARD, MERGE, DISCARD_EXCESS)
    run_process_edges(
        [(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)], o
    )
    run_process_edges([(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1)], o)
    run_process_edges([(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0)], o)


def test_discard_excess_undirected_sibling_pairs():
    o = opts(UNDIRECTED, DISCARD, KEEP, DISCARD_EXCESS)
    run_process_edges([(0, 1), (1, 0)], [(0, 1), (1, 0)], o)
    run_process_edges(
        [(0, 1), (0, 1), (1, 0), (1, 0)],
        [(0, 1), (0, 1), (1, 0), (1, 0)],
        o,
    )
    run_process_edges(
        [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
        [(0, 1), (1, 0)],
        o,
    )


def test_create_sibling_pairs():
    o = opts(DIRECTED, DISCARD, KEEP, CREATE)
    run_process_edges([(0, 1)], [(0, 1), (1, 0)], o)
    run_process_edges(
        [(0, 1), (0, 1)], [(0, 1), (0, 1), (1, 0), (1, 0)], o
    )


def test_require_sibling_pairs():
    o = opts(DIRECTED, DISCARD, KEEP, REQUIRE)
    run_process_edges([(0, 1), (1, 0)], [(0, 1), (1, 0)], o)
    run_process_edges(
        [(0, 1)], [(0, 1), (1, 0)], o, expected_error=True
    )


def test_create_undirected_sibling_pairs():
    o = opts(DIRECTED, DISCARD, KEEP, CREATE)
    o = run_process_edges([(0, 1), (1, 0)], [(0, 1), (1, 0)], o)
    assert o.edge_type == DIRECTED

    o = opts(UNDIRECTED, DISCARD, KEEP, CREATE)
    o = run_process_edges(
        [(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)], o
    )
    assert o.edge_type == DIRECTED

    o = opts(UNDIRECTED, DISCARD, KEEP, CREATE)
    o = run_process_edges(
        [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
        [(0, 1), (0, 1), (1, 0), (1, 0)],
        o,
    )
    assert o.edge_type == DIRECTED


def test_create_sibling_pairs_merge_duplicates():
    o = opts(DIRECTED, DISCARD, MERGE, CREATE)
    run_process_edges([(0, 1)], [(0, 1), (1, 0)], o)
    run_process_edges([(0, 1), (0, 1)], [(0, 1), (1, 0)], o)


def test_create_undirected_sibling_pairs_merge_duplicates():
    o = opts(DIRECTED, DISCARD, MERGE, CREATE)
    o = run_process_edges([(0, 1), (1, 0)], [(0, 1), (1, 0)], o)
    assert o.edge_type == DIRECTED

    o = opts(UNDIRECTED, DISCARD, MERGE, CREATE)
    o = run_process_edges(
        [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
        [(0, 1), (1, 0)],
        o,
    )
    assert o.edge_type == DIRECTED


# ------------------------------------------- graph-level degenerate tests


def build_graph(options: GraphOptions, polyline_strs: list[str]) -> Graph:
    """Builds a Graph from polyline strings (distinct vertices keep
    their identity — the reference routes this through S2Builder with
    no snapping).  For UNDIRECTED options each input edge also adds its
    reverse with an empty input-id set, like the builder does."""
    lexicon = IdSetLexicon()
    vmap: dict[tuple, int] = {}
    vertices: list[np.ndarray] = []
    edges: list[tuple[int, int]] = []
    input_ids: list[int] = []
    next_input = 0
    for s in polyline_strs:
        pts = parse_points(s)
        for i in range(len(pts) - 1):
            ids = []
            for p in (pts[i], pts[i + 1]):
                k = tuple(p)
                if k not in vmap:
                    vmap[k] = len(vertices)
                    vertices.append(p)
                ids.append(vmap[k])
            edges.append((ids[0], ids[1]))
            input_ids.append(lexicon.add([next_input]))
            if options.edge_type == UNDIRECTED:
                edges.append((ids[1], ids[0]))
                input_ids.append(lexicon.add([]))
            next_input += 1
    options, edges, input_ids, error = process_edges(
        options, edges, input_ids, lexicon
    )
    assert error is None, error
    order = sorted(range(len(edges)), key=lambda i: (edges[i], i))
    edges = [edges[i] for i in order]
    input_ids = [input_ids[i] for i in order]
    return Graph(options, np.asarray(vertices), edges, input_ids, lexicon)


def test_get_directed_loops_degenerate_edges():
    """test.cc:90-109."""
    g = build_graph(
        opts(DIRECTED, DISCARD_EXCESS, KEEP, KEEP),
        ["1:1, 1:1", "0:0, 0:2, 2:2, 2:0, 0:0", "0:3, 3:3, 0:3"],
    )
    loops, error = get_directed_loops(g, "SIMPLE")
    assert error is None
    assert len(loops) == 3
    assert len(loops[0]) == 1
    assert len(loops[1]) == 4
    assert len(loops[2]) == 2


def test_get_directed_components_degenerate_edges():
    """test.cc:111-132."""
    g = build_graph(
        opts(DIRECTED, DISCARD_EXCESS, KEEP, CREATE),
        ["1:1, 1:1", "0:0, 0:2, 2:2, 2:0, 0:0"],
    )
    components, error = get_directed_components(g, "KEEP")
    assert error is None
    assert len(components) == 2
    assert len(components[0]) == 1
    assert len(components[0][0]) == 1
    assert len(components[1]) == 2
    assert len(components[1][0]) == 4
    assert len(components[1][1]) == 4


def test_get_undirected_components_degenerate_edges():
    """test.cc:162-190."""
    g = build_graph(
        opts(UNDIRECTED, DISCARD_EXCESS, KEEP, DISCARD_EXCESS),
        ["1:1, 1:1", "0:0, 0:2, 2:2, 2:0, 0:0"],
    )
    components, error = get_undirected_components(g, "CIRCUIT")
    assert error is None
    assert len(components) == 2
    assert len(components[0][0]) == 1
    assert len(components[0][0][0]) == 1
    assert len(components[0][1]) == 1
    assert len(components[0][1][0]) == 1
    assert len(components[1][0]) == 1
    assert len(components[1][0][0]) == 4
    assert len(components[1][1]) == 1
    assert len(components[1][1][0]) == 4


def test_get_polylines_undirected_degenerate_paths():
    """test.cc:192-207."""
    g = build_graph(
        opts(UNDIRECTED, KEEP, KEEP, KEEP),
        ["1:1, 1:1", "0:0, 0:0, 0:1, 0:1, 0:2, 0:2", "1:1, 1:1"],
    )
    polylines = g.get_polylines(PATH)
    assert len(polylines) == 7


def test_get_polylines_undirected_degenerate_walks():
    """test.cc:209-226."""
    g = build_graph(
        opts(UNDIRECTED, KEEP, KEEP, KEEP),
        ["1:1, 1:1", "0:0, 0:0, 0:1, 0:1, 0:2, 0:2", "1:1, 1:1"],
    )
    polylines = g.get_polylines(WALK)
    assert len(polylines) == 2
    assert sorted(len(p) for p in polylines) == [2, 5]


def test_make_subgraph_undirected_to_undirected():
    """test.cc:547-570: no edge doubling when the source graph is
    already undirected."""
    from s2geometry_spark.kernel.graph import make_subgraph

    lex = IdSetLexicon()
    edges = [(0, 0), (0, 0), (1, 2), (2, 1)]
    ids = [lex.add([0]), lex.add([0]), lex.add([1]), lex.add([1])]
    new_opts = GraphOptions(UNDIRECTED, DISCARD, KEEP, KEEP)
    _opts, out_edges, out_ids, err = make_subgraph(
        UNDIRECTED, new_opts, edges, ids, lex)
    assert err is None
    assert out_edges == [(1, 2), (2, 1)]
    assert [tuple(lex.id_set(i)) for i in out_ids] == [(1,), (1,)]


def test_make_subgraph_directed_to_undirected():
    """test.cc:572-601: directed → undirected doubles every edge with
    an empty input-id twin; DISCARD_EXCESS keeps one sibling pair."""
    from s2geometry_spark.kernel.graph import make_subgraph

    lex = IdSetLexicon()
    edges = [(0, 0), (0, 1), (1, 2), (1, 2), (2, 1)]
    ids = [lex.add([1]), lex.add([2]), lex.add([3]), lex.add([3]),
           lex.add([3])]
    new_opts = GraphOptions(UNDIRECTED, KEEP, KEEP, DISCARD_EXCESS)
    _opts, out_edges, out_ids, err = make_subgraph(
        DIRECTED, new_opts, edges, ids, lex)
    assert err is None
    assert out_edges == [(0, 0), (0, 0), (0, 1), (1, 0), (1, 2), (2, 1)]
    got = [tuple(lex.id_set(i)) for i in out_ids]
    assert got == [(1,), (1,), (2,), (), (3,), (3,)]
