"""s2boolean_operation_test.cc ports that run on the CrossingProcessor
walk (kernel/crossing_processor.py): exactly-shared vertex/edge
configurations with no snapping, plus the empty/full predicate
contracts.

Cases: PolygonVertex{Open,SemiOpen,Closed}PolygonVertex (cc:901-947),
PolygonEdge{Open,SemiOpen,Closed}PolygonEdgeOverlap (cc:964-1015),
ContainsEmptyAndFull (cc:2288-2295), IntersectsEmptyAndFull
(cc:2298-2305).
"""

from collections import Counter

import numpy as np

from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.crossing_processor import (
    CLOSED,
    OPEN,
    SEMI_OPEN,
    DIFFERENCE,
    INTERSECTION,
    SYMMETRIC_DIFFERENCE,
    UNION,
    PointsShape,
    PolygonShape,
    PolylineShape,
    lax_boolean_is_empty,
    lax_boolean_op,
    normalize_dim2,
)


def _k(v):
    return np.asarray(v, float).tobytes()


def make_index(s):
    """s2textformat MakeIndexOrDie subset: 'points # lines # polygon'
    where the polygon part is ';'-separated lax loops ('full' = the
    full loop)."""
    parts = s.split("#")
    while len(parts) < 3:
        parts.append("")
    index = []
    pts = [
        parse_points(tok.strip())[0]
        for tok in parts[0].split("|")
        if tok.strip()
    ]
    if pts:
        index.append(PointsShape(pts))
    for tok in parts[1].split("|"):
        tok = tok.strip()
        if tok:
            index.append(PolylineShape(parse_points(tok)))
    loops = []
    for tok in parts[2].split(";"):
        tok = tok.strip()
        if not tok:
            continue
        if tok == "full":
            loops.append([])
        else:
            loops.append(parse_points(tok))
    if loops:
        index.append(PolygonShape(loops))
    return index


def _sets(index):
    pts = Counter()
    lines = Counter()
    poly = Counter()
    for shape in index:
        if shape.dim == 0:
            for p in shape.points:
                pts[_k(p)] += 1
        else:
            for _, _, _, edges in shape.chains():
                for v0, v1 in edges:
                    if shape.dim == 1:
                        lines[(_k(v0), _k(v1))] += 1
                    else:
                        poly[(_k(v0), _k(v1))] += 1
    return pts, lines, poly


def expect_result(op, a_str, b_str, expected_str, **kw):
    a = make_index(a_str)
    b = make_index(b_str)
    res = lax_boolean_op(a, b, op, **kw)
    e_pts, e_lines, e_poly = _sets(make_index(expected_str))
    g_pts = Counter(_k(p) for p in res.points)
    g_lines = Counter((_k(v0), _k(v1)) for v0, v1 in res.line_edges)
    g_poly = Counter((_k(v0), _k(v1)) for v0, v1 in res.polygon_edges)
    ctx = f"{op} {kw} a={a_str!r} b={b_str!r}"
    assert g_pts == e_pts, ctx
    assert g_lines == e_lines, ctx
    assert normalize_dim2(g_poly) == normalize_dim2(e_poly), ctx
    expected_empty = not (e_pts or e_lines or e_poly)
    assert expected_empty == lax_boolean_is_empty(a, b, op, **kw), ctx


BOWTIE_A = "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5"
TRI_B = "# # 0:0, 5:3, 5:2"


def test_polygon_vertex_open_polygon_vertex():
    kw = dict(polygon_model=OPEN)
    expect_result(UNION, BOWTIE_A, TRI_B,
                  "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5; 0:0, 5:3, 5:2", **kw)
    expect_result(INTERSECTION, BOWTIE_A, TRI_B, "# #", **kw)
    expect_result(DIFFERENCE, BOWTIE_A, TRI_B, BOWTIE_A, **kw)
    expect_result(SYMMETRIC_DIFFERENCE, BOWTIE_A, TRI_B,
                  "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5; 0:0, 5:3, 5:2", **kw)


def test_polygon_vertex_semi_open_polygon_vertex():
    kw = dict(polygon_model=SEMI_OPEN)
    expect_result(UNION, BOWTIE_A, TRI_B,
                  "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5; 0:0, 5:3, 5:2", **kw)
    expect_result(INTERSECTION, BOWTIE_A, TRI_B, "# #", **kw)
    expect_result(DIFFERENCE, BOWTIE_A, TRI_B, BOWTIE_A, **kw)
    expect_result(SYMMETRIC_DIFFERENCE, BOWTIE_A, TRI_B,
                  "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5; 0:0, 5:3, 5:2", **kw)


def test_polygon_vertex_closed_polygon_vertex():
    kw = dict(polygon_model=CLOSED)
    expect_result(UNION, BOWTIE_A, TRI_B,
                  "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5; 0:0, 5:3, 5:2", **kw)
    expect_result(INTERSECTION, BOWTIE_A, TRI_B, "# # 0:0", **kw)
    expect_result(DIFFERENCE, BOWTIE_A, TRI_B, BOWTIE_A, **kw)
    expect_result(DIFFERENCE, TRI_B, BOWTIE_A, TRI_B, **kw)
    expect_result(SYMMETRIC_DIFFERENCE, BOWTIE_A, TRI_B,
                  "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5; 0:0, 5:3, 5:2", **kw)


RECT_A = "# # 0:0, 0:4, 2:4, 2:0"
TRIS_B = "# # 0:0, 1:1, 2:0; 0:4, 1:5, 2:4"


def test_polygon_edge_open_polygon_edge_overlap():
    kw = dict(polygon_model=OPEN)
    expect_result(UNION, RECT_A, TRIS_B,
                  "# # 0:0, 0:4, 2:4, 2:0; 0:4, 1:5, 2:4", **kw)
    expect_result(INTERSECTION, RECT_A, TRIS_B,
                  "# # 0:0, 1:1, 2:0", **kw)
    expect_result(DIFFERENCE, RECT_A, TRIS_B,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1", **kw)
    expect_result(SYMMETRIC_DIFFERENCE, RECT_A, TRIS_B,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1; 0:4, 1:5, 2:4", **kw)


def test_polygon_edge_semi_open_polygon_edge_overlap():
    kw = dict(polygon_model=SEMI_OPEN)
    expect_result(UNION, RECT_A, TRIS_B,
                  "# # 0:0, 0:4, 1:5, 2:4, 2:0", **kw)
    expect_result(INTERSECTION, RECT_A, TRIS_B,
                  "# # 0:0, 1:1, 2:0", **kw)
    expect_result(DIFFERENCE, RECT_A, TRIS_B,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1", **kw)
    expect_result(SYMMETRIC_DIFFERENCE, RECT_A, TRIS_B,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1; 0:4, 1:5, 2:4", **kw)


def test_polygon_edge_closed_polygon_edge_overlap():
    kw = dict(polygon_model=CLOSED)
    expect_result(UNION, RECT_A, TRIS_B,
                  "# # 0:0, 0:4, 1:5, 2:4, 2:0", **kw)
    expect_result(INTERSECTION, RECT_A, TRIS_B,
                  "# # 0:0, 1:1, 2:0; 0:4, 2:4", **kw)
    expect_result(DIFFERENCE, RECT_A, TRIS_B,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1", **kw)
    expect_result(SYMMETRIC_DIFFERENCE, RECT_A, TRIS_B,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1; 0:4, 1:5, 2:4", **kw)


def _contains(a, b):
    return lax_boolean_is_empty(make_index(b), make_index(a), DIFFERENCE)


def _intersects(a, b):
    return not lax_boolean_is_empty(
        make_index(a), make_index(b), INTERSECTION
    )


def test_contains_empty_and_full():
    assert _contains("# #", "# #")
    assert not _contains("# #", "# # full")
    assert _contains("# # full", "# #")
    assert _contains("# # full", "# # full")


def test_intersects_empty_and_full():
    assert not _intersects("# #", "# #")
    assert not _intersects("# #", "# # full")
    assert not _intersects("# # full", "# #")
    assert _intersects("# # full", "# # full")
