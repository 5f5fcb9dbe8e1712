"""Mixed-dimension boolean ops vs the reference's model matrix.

Fixtures ported from s2boolean_operation_test.cc (the PolygonModel x
PolylineModel x polyline_loops_have_boundaries matrix, lines 203-1033).
Comparison mirrors the reference's IndexMatchingLayer protocol: per
dimension the DIRECTED edge (or point) multiset must match; dimension-2
is compared modulo sibling pairs and degenerate edges, exactly as the
reference harness configures DegenerateEdges/SiblingPairs::
DISCARD_EXCESS for its polygon layer (s2boolean_operation_test.cc:
112-121 "we intentionally do not require any specific multiplicity for
degenerate edges and sibling pairs of dimension 2")."""

from collections import Counter

import numpy as np
import pytest

from s2geometry_spark.kernel.coords import xyz_to_latlng
from s2geometry_spark.kernel.contains import Loop, Polygon
from s2geometry_spark.kernel.mixed import (
    CLOSED,
    OPEN,
    SEMI_OPEN,
    MixedGeometry,
    MixedOptions,
    mixed_boolean_op,
    parse_mixed,
)

UNION, INTER, DIFF, SYMM = (
    "union",
    "intersection",
    "difference",
    "symmetric_difference",
)


def _pt_key(v, e):
    lat, lng = xyz_to_latlng(v[0], v[1], v[2])
    return (round(float(lat), e), round(float(lng), e))


def _points_multiset(g, e):
    return Counter(_pt_key(p, e) for p in np.asarray(g.points).reshape(-1, 3))


def _lines_multiset(g, e):
    c = Counter()
    for line in g.polylines:
        line = np.asarray(line).reshape(-1, 3)
        if len(line) < 2:
            continue
        for i in range(len(line) - 1):
            c[(_pt_key(line[i], e), _pt_key(line[i + 1], e))] += 1
    return c


def _polygon_multiset(g, e):
    """Directed polygon edges (shells CCW, holes CW — the reference's
    interior-on-left convention) modulo sibling pairs + degenerate
    edges."""
    from s2geometry_spark.kernel.mixed import directed_boundary_loops

    c = Counter()
    for v in directed_boundary_loops(g.polygon):
        n = len(v)
        if n < 3:
            continue  # degenerate loops: not edge-checked (DISCARD_EXCESS)
        for i in range(n):
            a, b = _pt_key(v[i], e), _pt_key(v[(i + 1) % n], e)
            if a == b:
                continue
            c[(a, b)] += 1
    # cancel sibling pairs
    for (a, b) in list(c):
        if a < b and (b, a) in c:
            k = min(c[(a, b)], c[(b, a)])
            c[(a, b)] -= k
            c[(b, a)] -= k
    return Counter({k: v for k, v in c.items() if v > 0})


def expect(op, opt, a_str, b_str, expected_str, e=6):
    a = parse_mixed(a_str)
    b = parse_mixed(b_str)
    want = parse_mixed(expected_str)
    got = mixed_boolean_op(a, b, op, opt)
    assert _points_multiset(got, e) == _points_multiset(want, e), op
    assert _lines_multiset(got, e) == _lines_multiset(want, e), op
    assert _polygon_multiset(got, e) == _polygon_multiset(want, e), op


def _opt(pgm=SEMI_OPEN, plm=CLOSED, lhb=True):
    return MixedOptions(pgm, plm, lhb)


# --- degeneracy preservation (s2boolean_operation_test.cc:203-228) ---------


@pytest.mark.parametrize("model", [OPEN, SEMI_OPEN, CLOSED])
def test_degenerate_polylines_preserved(model):
    a, b = "# 0:0, 0:0 #", "# #"
    expect(UNION, _opt(plm=model), a, b, a)


@pytest.mark.parametrize("model", [OPEN, SEMI_OPEN, CLOSED])
def test_degenerate_polygons_preserved(model):
    a = "# # 0:0, 0:5, 5:5, 5:0; 1:1; 2:2, 3:3; 6:6; 7:7, 8:8"
    got = mixed_boolean_op(
        parse_mixed(a), parse_mixed("# #"), UNION, _opt(pgm=model)
    )
    # passthrough keeps every degenerate loop bit-exactly: 2-vertex
    # sibling pairs stay polygon loops, 1-vertex loops are point shells
    assert [len(l.vertices) for l in got.polygon.loops] == [4, 2, 2]
    assert [k for _, k in got.deg_points] == ["shell", "shell"]


# --- point x point (test.cc:230-244) ---------------------------------------


def test_point_point():
    a, b = "0:0 | 1:0 # #", "0:0 | 2:0 # #"
    o = _opt()
    expect(UNION, o, a, b, "0:0 | 0:0 | 1:0 | 2:0 # #")
    expect(INTER, o, a, b, "0:0 | 0:0 # #")
    expect(DIFF, o, a, b, "1:0 # #")
    expect(SYMM, o, a, b, "1:0 | 2:0 # #")


# --- point x polyline per PolylineModel (test.cc:246-338) ------------------

PT_A = "0:0 | 1:0 | 2:0 | 3:0 | 4:0 | 5:0 # #"
PT_B = "# 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0, 4:0 #"


def test_point_open_polyline():
    o = _opt(plm=OPEN)
    expect(UNION, o, PT_A, PT_B,
           "0:0 | 2:0 | 3:0 | 4:0 # 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0, 4:0 #")
    expect(INTER, o, PT_A, PT_B, "1:0 | 5:0 # #")
    expect(DIFF, o, PT_A, PT_B, "0:0 | 2:0 | 3:0 | 4:0 # #")
    expect(SYMM, o, PT_A, PT_B,
           "0:0 | 2:0 | 3:0 | 4:0 # 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0, 4:0 #")


def test_point_open_polyline_loop_boundaries_false():
    o = _opt(plm=OPEN, lhb=False)
    expect(UNION, o, PT_A, PT_B,
           "0:0 | 2:0 | 3:0 # 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0, 4:0 #")
    expect(INTER, o, PT_A, PT_B, "1:0 | 4:0 | 5:0 # #")
    expect(DIFF, o, PT_A, PT_B, "0:0 | 2:0 | 3:0 # #")


@pytest.mark.parametrize("lhb", [False, True])
def test_point_semi_open_polyline(lhb):
    o = _opt(plm=SEMI_OPEN, lhb=lhb)
    expect(UNION, o, PT_A, PT_B,
           "2:0 | 3:0 # 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0, 4:0 #")
    expect(INTER, o, PT_A, PT_B, "0:0 | 1:0 | 4:0 | 5:0 # #")
    expect(DIFF, o, PT_A, PT_B, "2:0 | 3:0 # #")


@pytest.mark.parametrize("lhb", [False, True])
def test_point_closed_polyline(lhb):
    o = _opt(plm=CLOSED, lhb=lhb)
    expect(UNION, o, PT_A, PT_B,
           "# 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0, 4:0 #")
    expect(INTER, o, PT_A, PT_B, "0:0 | 1:0 | 2:0 | 3:0 | 4:0 | 5:0 # #")
    expect(DIFF, o, PT_A, PT_B, "# #")
    expect(SYMM, o, PT_A, PT_B,
           "# 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0, 4:0 #")


# --- point x polygon (test.cc:340-406) -------------------------------------


def test_point_polygon_interior():
    o = _opt()  # PolygonModel irrelevant
    a, b = "1:1 | 4:4 # #", "# # 0:0, 0:3, 3:0"
    expect(UNION, o, a, b, "4:4 # # 0:0, 0:3, 3:0")
    expect(INTER, o, a, b, "1:1 # #")
    expect(DIFF, o, a, b, "4:4 # #")
    expect(SYMM, o, a, b, "4:4 # # 0:0, 0:3, 3:0")


def test_point_open_polygon_vertex():
    o = _opt(pgm=OPEN)
    a, b = "0:1 | 1:0 # #", "# # 0:0, 0:1, 1:0"
    expect(UNION, o, a, b, "0:1 | 1:0 # # 0:0, 0:1, 1:0")
    expect(INTER, o, a, b, "# #")
    expect(DIFF, o, a, b, "0:1 | 1:0 # #")
    expect(SYMM, o, a, b, "0:1 | 1:0 # # 0:0, 0:1, 1:0")


def test_point_semi_open_polygon_vertex():
    from s2geometry_spark.kernel.contains import parse_points, parse_polygon

    polygon = parse_polygon("0:0, 0:1, 1:0")
    assert bool(polygon.contains(parse_points("0:1"))[0])
    assert not bool(polygon.contains(parse_points("1:0"))[0])
    o = _opt(pgm=SEMI_OPEN)
    a, b = "0:1 | 1:0 # #", "# # 0:0, 0:1, 1:0"
    expect(UNION, o, a, b, "1:0 # # 0:0, 0:1, 1:0")
    expect(INTER, o, a, b, "0:1 # #")
    expect(DIFF, o, a, b, "1:0 # #")
    expect(SYMM, o, a, b, "1:0 # # 0:0, 0:1, 1:0")


def test_point_closed_polygon_vertex():
    o = _opt(pgm=CLOSED)
    a, b = "0:1 | 1:0 # #", "# # 0:0, 0:1, 1:0"
    expect(UNION, o, a, b, "# # 0:0, 0:1, 1:0")
    expect(INTER, o, a, b, "0:1 | 1:0 # #")
    expect(DIFF, o, a, b, "# #")
    expect(SYMM, o, a, b, "# # 0:0, 0:1, 1:0")


# --- polyline vertex x polyline vertex (test.cc:408-543) -------------------

PV_A = "# 0:0, 0:1, 0:2 | 0:3, 0:4, 0:3 #"
PV_B = ("# 0:0, 1:0 | -1:1, 0:1, 1:1 | -1:2, 0:2 "
        "| 1:3, 0:3, 1:3 | 0:4, 1:4, 0:4 #")
PV_UNION = ("# 0:0, 0:1, 0:2 | 0:0, 1:0 | -1:1, 0:1, 1:1 | -1:2, 0:2 "
            "| 0:3, 0:4, 0:3 | 1:3, 0:3, 1:3 | 0:4, 1:4, 0:4 #")
PV_DIFF = "# 0:0, 0:1, 0:2 | 0:3, 0:4, 0:3 #"


def test_polyline_vertex_open_polyline_vertex():
    o = _opt(plm=OPEN)
    expect(UNION, o, PV_A, PV_B, PV_UNION)
    expect(INTER, o, PV_A, PV_B, "# 0:1, 0:1 | 0:1, 0:1 #")
    expect(DIFF, o, PV_A, PV_B, PV_DIFF)
    expect(SYMM, o, PV_A, PV_B, PV_UNION)


def test_polyline_vertex_open_polyline_vertex_loop_boundaries_false():
    o = _opt(plm=OPEN, lhb=False)
    expect(UNION, o, PV_A, PV_B, PV_UNION)
    expect(INTER, o, PV_A, PV_B,
           "# 0:1, 0:1 | 0:1, 0:1 "
           "| 0:3, 0:3 | 0:3, 0:3 | 0:4, 0:4 | 0:4, 0:4 #")
    expect(DIFF, o, PV_A, PV_B, PV_DIFF)


@pytest.mark.parametrize("lhb", [False, True])
def test_polyline_vertex_semi_open_polyline_vertex(lhb):
    o = _opt(plm=SEMI_OPEN, lhb=lhb)
    expect(UNION, o, PV_A, PV_B, PV_UNION)
    expect(INTER, o, PV_A, PV_B,
           "# 0:0, 0:0 | 0:0, 0:0 | 0:1, 0:1 | 0:1, 0:1 "
           "| 0:3, 0:3 | 0:3, 0:3 | 0:4, 0:4 | 0:4, 0:4 #")
    expect(DIFF, o, PV_A, PV_B, PV_DIFF)


def test_polyline_vertex_closed_polyline_vertex():
    o = _opt(plm=CLOSED)
    expect(UNION, o, PV_A, PV_B, PV_UNION)
    expect(INTER, o, PV_A, PV_B,
           "# 0:0, 0:0 | 0:0, 0:0 | 0:1, 0:1 | 0:1, 0:1 "
           "| 0:2, 0:2 | 0:2, 0:2 "
           "| 0:3, 0:3 | 0:3, 0:3 | 0:3, 0:3 "
           "| 0:4, 0:4 | 0:4, 0:4 | 0:4, 0:4 #")
    expect(DIFF, o, PV_A, PV_B, PV_DIFF)


def test_polyline_vertex_closed_polyline_vertex_loop_boundaries_false():
    o = _opt(plm=CLOSED, lhb=False)
    expect(UNION, o, PV_A, PV_B, PV_UNION)
    expect(INTER, o, PV_A, PV_B,
           "# 0:0, 0:0 | 0:0, 0:0 | 0:1, 0:1 | 0:1, 0:1 "
           "| 0:2, 0:2 | 0:2, 0:2 "
           "| 0:3, 0:3 | 0:3, 0:3 | 0:4, 0:4 | 0:4, 0:4 #")
    expect(DIFF, o, PV_A, PV_B, PV_DIFF)


# --- polyline vertex x polygon vertex (test.cc:545-661) --------------------

VERTEX_POLYGON = "0:0, 0:1, 0:2, 0:3, 0:4, 0:5, 5:5, 5:4, 5:3, 5:2, 5:1, 5:0"
VP_A = ("# 1:1, 0:1 | 0:2, 1:2 | -1:3, 0:3 | 0:4, -1:4 "
        "| 6:1, 5:1 | 5:2, 6:2 | 4:3, 5:3 | 5:4, 4:4 #")
VP_B = "# # " + VERTEX_POLYGON


def test_semi_open_polygon_vertices_contained():
    from s2geometry_spark.kernel.contains import parse_points, parse_polygon

    polygon = parse_polygon(VERTEX_POLYGON)
    for s, want in [("0:1", True), ("0:2", True), ("0:3", True),
                    ("0:4", True), ("5:1", False), ("5:2", False),
                    ("5:3", False), ("5:4", False)]:
        assert bool(polygon.contains(parse_points(s))[0]) == want, s


def test_polyline_vertex_open_polygon_vertex():
    o = _opt(pgm=OPEN)
    diff_result = ("# 0:1, 0:1 | 0:2, 0:2 | -1:3, 0:3 | 0:4, -1:4"
                   "| 6:1, 5:1 | 5:2, 6:2 | 5:3, 5:3 | 5:4, 5:4 #")
    expect(UNION, o, VP_A, VP_B, diff_result + VERTEX_POLYGON)
    expect(INTER, o, VP_A, VP_B,
           "# 1:1, 0:1 | 0:2, 1:2 | 4:3, 5:3 | 5:4, 4:4 #")
    expect(DIFF, o, VP_A, VP_B, diff_result)
    expect(SYMM, o, VP_A, VP_B, diff_result + VERTEX_POLYGON)


def test_polyline_vertex_open_polygon_closed_polyline_vertex():
    suffix = ("-2:0, 0:1 | -2:1, 0:2 | -2:2, 0:3 | -2:3, 0:4 | "
              "7:0, 5:1 | 7:1, 5:2 | 7:2, 5:3 | 7:3, 5:4 # "
              + VERTEX_POLYGON)
    o = _opt(pgm=OPEN)
    a = VP_A
    b = "# " + suffix
    diff_prefix = "# -1:3, 0:3 | 0:4, -1:4 | 6:1, 5:1 | 5:2, 6:2"
    expect(UNION, o, a, b,
           diff_prefix + " | 0:1, 0:1 | 0:2, 0:2 | 5:3, 5:3 | 5:4, 5:4 | "
           + suffix)
    expect(INTER, o, a, b,
           "# 1:1, 0:1 | 0:2, 1:2 | 0:3, 0:3 | 0:4, 0:4"
           "| 5:1, 5:1 | 5:2, 5:2 | 4:3, 5:3 | 5:4, 4:4"
           "| 0:1, 0:1 | 0:2, 0:2 | 0:3, 0:3 | 0:4, 0:4"
           "| 5:1, 5:1 | 5:2, 5:2 | 5:3, 5:3 | 5:4, 5:4 #")
    expect(DIFF, o, a, b, diff_prefix + " #")
    expect(SYMM, o, a, b, diff_prefix + " | " + suffix)


def test_polyline_vertex_semi_open_polygon_vertex():
    o = _opt(pgm=SEMI_OPEN)
    diff_result = ("# -1:3, 0:3 | 0:4, -1:4 | 6:1, 5:1 | 5:2, 6:2 "
                   "| 5:3, 5:3 | 5:4, 5:4 #")
    expect(UNION, o, VP_A, VP_B, diff_result + VERTEX_POLYGON)
    expect(INTER, o, VP_A, VP_B,
           "# 1:1, 0:1 | 0:2, 1:2 | 0:3, 0:3 | 0:4, 0:4 "
           "| 4:3, 5:3 | 5:4, 4:4 #")
    expect(DIFF, o, VP_A, VP_B, diff_result)
    expect(SYMM, o, VP_A, VP_B, diff_result + VERTEX_POLYGON)


def test_polyline_vertex_closed_polygon_vertex():
    o = _opt(pgm=CLOSED)
    diff_result = "# -1:3, 0:3 | 0:4, -1:4 | 6:1, 5:1 | 5:2, 6:2 #"
    expect(UNION, o, VP_A, VP_B, diff_result + VERTEX_POLYGON)
    expect(INTER, o, VP_A, VP_B,
           "# 1:1, 0:1 | 0:2, 1:2 | 0:3, 0:3 | 0:4, 0:4"
           "| 5:1, 5:1 | 5:2, 5:2 | 4:3, 5:3 | 5:4, 4:4 #")
    expect(DIFF, o, VP_A, VP_B, diff_result)
    expect(SYMM, o, VP_A, VP_B, diff_result + VERTEX_POLYGON)


# --- polyline edge x polyline edge (test.cc:663-786) -----------------------


def test_polyline_edge_polyline_edge_crossing():
    o = _opt()
    a, b = "# 0:0, 2:2 #", "# 2:0, 0:2 #"
    expect(UNION, o, a, b, "# 0:0, 1:1, 2:2 | 2:0, 1:1, 0:2 #", e=1)
    expect(INTER, o, a, b, "# 1:1, 1:1 | 1:1, 1:1 #", e=1)
    expect(DIFF, o, a, b, "# 0:0, 1:1, 2:2 #", e=1)
    expect(SYMM, o, a, b, "# 0:0, 1:1, 2:2 | 2:0, 1:1, 0:2 #", e=1)


def test_polyline_edge_polyline_edge_overlap():
    o = _opt(pgm=OPEN)
    a = "# 0:0, 1:0, 2:0, 2:5 | 3:0, 3:0 | 6:0, 5:0, 4:0 #"
    b = "# 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0 #"
    expect(UNION, o, a, b,
           "# 0:0, 1:0, 2:0, 2:5 | 0:0, 1:0, 2:0 | 3:0, 3:0 | 3:0, 3:0 "
           "| 6:0, 5:0, 4:0 | 4:0, 5:0 #")
    expect(INTER, o, a, b,
           "# 0:0, 1:0, 2:0 | 0:0, 1:0, 2:0 | 3:0, 3:0 | 3:0, 3:0 "
           "| 5:0, 4:0 | 4:0, 5:0 #")
    expect(DIFF, o, a, b, "# 2:0, 2:5 | 6:0, 5:0 #")
    expect(SYMM, o, a, b, "# 2:0, 2:5 | 6:0, 5:0 #")


PL_A = "# 0:0, 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2, 2:2 #"
PL_B = "# 0:0, 0:0 | 0:0, 0:1 | 2:2, 2:2 | 2:2, 3:2 #"
PL_UNION = ("# 0:0, 0:1, 1:0, 0:0 | 0:0, 0:0 | 0:0, 0:1 "
            "| 2:2, 2:3, 3:2, 2:2 | 2:2, 2:2 | 2:2, 3:2 #")
PL_DIFF = "# 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2 #"


def test_polyline_loop_multiple_open_polyline_edge():
    o = _opt(plm=OPEN)
    expect(UNION, o, PL_A, PL_B, PL_UNION)
    expect(INTER, o, PL_A, PL_B,
           "# 0:0, 0:1 | 0:0, 0:1 | 2:2, 3:2 | 3:2, 2:2 #")
    expect(DIFF, o, PL_A, PL_B, PL_DIFF)
    expect(SYMM, o, PL_A, PL_B,
           "# 0:1, 1:0, 0:0 | 0:0, 0:0 | 2:2, 2:3, 3:2 | 2:2, 2:2 #")


def test_polyline_loop_multiple_semi_open_polyline_edge():
    o = _opt(plm=SEMI_OPEN)
    expect(UNION, o, PL_A, PL_B, PL_UNION)
    expect(INTER, o, PL_A, PL_B,
           "# 0:0, 0:0 | 0:0, 0:1 | 0:0, 0:1 "
           "| 2:2, 2:2 | 2:2, 2:2 | 2:2, 3:2 | 3:2, 2:2 #")
    expect(DIFF, o, PL_A, PL_B, PL_DIFF)
    expect(SYMM, o, PL_A, PL_B, PL_DIFF)


def test_polyline_loop_multiple_closed_polyline_edge():
    o = _opt(plm=CLOSED)
    expect(UNION, o, PL_A, PL_B, PL_UNION)
    expect(INTER, o, PL_A, PL_B,
           "# 0:0, 0:0 | 0:0, 0:0 | 0:0, 0:1 | 0:0, 0:1 "
           "| 2:2, 2:2 | 2:2, 2:2 | 2:2, 3:2 | 3:2, 2:2 #")
    expect(DIFF, o, PL_A, PL_B, PL_DIFF)
    expect(SYMM, o, PL_A, PL_B, PL_DIFF)


@pytest.mark.parametrize("plm", [OPEN, SEMI_OPEN, CLOSED])
def test_polyline_loop_multiple_polyline_edge_loop_boundaries_false(plm):
    o = _opt(plm=plm, lhb=False)
    expect(UNION, o, PL_A, PL_B, PL_UNION)
    expect(INTER, o, PL_A, PL_B,
           "# 0:0, 0:0 | 0:0, 0:1 | 0:0, 0:1 "
           "| 2:2, 2:2 | 2:2, 3:2 | 3:2, 2:2 #")
    expect(DIFF, o, PL_A, PL_B, PL_DIFF)
    expect(SYMM, o, PL_A, PL_B, PL_DIFF)


# --- polyline edge x polygon edge (test.cc:788-867) ------------------------

PE_A = "# 1:1, 1:3, 3:3 | 3:3, 1:3 # "
PE_B = "# # 1:1, 1:3, 3:3, 3:1"


def test_polyline_edge_open_polygon_edge_overlap():
    o = _opt(pgm=OPEN)
    expect(UNION, o, PE_A, PE_B,
           "# 1:1, 1:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1")
    expect(INTER, o, PE_A, PE_B, "# #")
    expect(DIFF, o, PE_A, PE_B, "# 1:1, 1:3, 3:3 | 3:3, 1:3 #")
    expect(SYMM, o, PE_A, PE_B,
           "# 1:1, 1:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1")


def test_polyline_edge_semi_open_polygon_edge_overlap():
    o = _opt(pgm=SEMI_OPEN)
    expect(UNION, o, PE_A, PE_B,
           "# 1:1, 1:1 | 3:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1")
    expect(INTER, o, PE_A, PE_B, "# 1:3, 1:3 | 1:1, 1:3, 3:3 #")
    expect(DIFF, o, PE_A, PE_B, "# 1:1, 1:1 | 3:3, 3:3 | 3:3, 1:3 #")
    expect(SYMM, o, PE_A, PE_B,
           "# 1:1, 1:1 | 3:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1")


def test_polyline_edge_closed_polygon_edge_overlap():
    o = _opt(pgm=CLOSED)
    expect(UNION, o, PE_A, PE_B, "# # 1:1, 1:3, 3:3, 3:1")
    expect(INTER, o, PE_A, PE_B, "# 1:1, 1:3, 3:3 | 3:3, 1:3 #")
    expect(DIFF, o, PE_A, PE_B, "# #")
    expect(SYMM, o, PE_A, PE_B, "# # 1:1, 1:3, 3:3, 3:1")


def test_polygon_vertex_matching():
    # polyline 0:0,1:1 union degenerate sibling-pair polygon 0:0,1:1 -
    # the polygon wins (test.cc:840-851)
    o = _opt(plm=CLOSED, pgm=CLOSED)
    a, b = "# 0:0, 1:1 # ", "# # 0:0, 1:1"
    got = mixed_boolean_op(parse_mixed(a), parse_mixed(b), UNION, o)
    assert len(got.points) == 0
    assert got.polylines == []
    assert [len(l.vertices) for l in got.polygon.loops] == [2]


def test_polyline_edge_polygon_interior():
    o = _opt()  # PolygonModel irrelevant
    a = "# 1:1, 2:2 | 3:3, 3:3 | 6:6, 7:7 | 8:8, 8:8 # "
    b = "# # 0:0, 0:5, 5:5, 5:0"
    expect(UNION, o, a, b,
           "# 6:6, 7:7 | 8:8, 8:8 # 0:0, 0:5, 5:5, 5:0")
    expect(INTER, o, a, b, "# 1:1, 2:2 | 3:3, 3:3 #")
    expect(DIFF, o, a, b, "# 6:6, 7:7 | 8:8, 8:8 #")
    expect(SYMM, o, a, b,
           "# 6:6, 7:7 | 8:8, 8:8 # 0:0, 0:5, 5:5, 5:0")


# --- polygon vertex x polygon vertex (test.cc:901-946) ---------------------

PG_A = "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5"
PG_B = "# # 0:0, 5:3, 5:2"
PG_UNION = "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5; 0:0, 5:3, 5:2"


@pytest.mark.parametrize("pgm", [OPEN, SEMI_OPEN])
def test_polygon_vertex_open_semi_open_polygon_vertex(pgm):
    o = _opt(pgm=pgm)
    expect(UNION, o, PG_A, PG_B, PG_UNION)
    expect(INTER, o, PG_A, PG_B, "# #")
    expect(DIFF, o, PG_A, PG_B, PG_A)
    expect(SYMM, o, PG_A, PG_B, PG_UNION)


def test_polygon_vertex_closed_polygon_vertex():
    o = _opt(pgm=CLOSED)
    expect(UNION, o, PG_A, PG_B, PG_UNION)
    got = mixed_boolean_op(parse_mixed(PG_A), parse_mixed(PG_B), INTER, o)
    # CLOSED intersection of vertex-touching polygons = the degenerate
    # point shell 0:0 (test.cc:931-940)
    assert not got.polygon.loops or all(
        len(l.vertices) < 3 for l in got.polygon.loops
    )
    assert len(got.deg_points) == 1
    lat, lng = xyz_to_latlng(*got.deg_points[0][0])
    assert (round(float(lat), 6), round(float(lng), 6)) == (0.0, 0.0)
    assert got.deg_points[0][1] == "shell"
    expect(DIFF, o, PG_A, PG_B, PG_A)
    expect(DIFF, o, PG_B, PG_A, PG_B)


# --- polygon edge x polygon edge (test.cc:948-1032) ------------------------


def test_polygon_edge_polygon_edge_crossing():
    o = _opt()
    a = "# # 0:0, 0:2, 2:2, 2:0"
    b = "# # 1:1, 1:3, 3:3, 3:1"
    expect(UNION, o, a, b,
           "# # 0:0, 0:2, 1:2, 1:3, 3:3, 3:1, 2:1, 2:0", e=2)
    expect(INTER, o, a, b, "# # 1:1, 1:2, 2:2, 2:1", e=2)
    expect(DIFF, o, a, b, "# # 0:0, 0:2, 1:2, 1:1, 2:1, 2:0", e=2)
    expect(SYMM, o, a, b,
           "# # 0:0, 0:2, 1:2, 1:1, 2:1, 2:0; "
           "1:2, 1:3, 3:3, 3:1, 2:1, 2:2", e=2)


PE2_A = "# # 0:0, 0:4, 2:4, 2:0"
PE2_B = "# # 0:0, 1:1, 2:0; 0:4, 1:5, 2:4"


@pytest.mark.parametrize("pgm", [OPEN, SEMI_OPEN, CLOSED])
def test_polygon_edge_polygon_edge_overlap(pgm):
    o = _opt(pgm=pgm)
    # sibling-pair-modulo comparison makes the OPEN "slit" union and the
    # merged SEMI_OPEN/CLOSED union the same multiset, exactly as the
    # reference's DISCARD_EXCESS layer options do
    expect(UNION, o, PE2_A, PE2_B, "# # 0:0, 0:4, 1:5, 2:4, 2:0")
    expect(INTER, o, PE2_A, PE2_B, "# # 0:0, 1:1, 2:0")
    expect(DIFF, o, PE2_A, PE2_B, "# # 0:0, 0:4, 2:4, 2:0, 1:1")
    expect(SYMM, o, PE2_A, PE2_B,
           "# # 0:0, 0:4, 2:4, 2:0, 1:1; 0:4, 1:5, 2:4")


def test_polygon_edge_closed_overlap_degenerate_edge():
    # CLOSED intersection additionally carries the shared top edge as a
    # degenerate sibling pair "0:4, 2:4" (test.cc:1001-1016)
    got = mixed_boolean_op(
        parse_mixed(PE2_A), parse_mixed(PE2_B), INTER, _opt(pgm=CLOSED)
    )
    assert len(got.deg_edges) == 1
    (c, d, kind) = got.deg_edges[0]
    ends = sorted(
        (round(float(la), 6), round(float(lo), 6))
        for la, lo in [xyz_to_latlng(*c), xyz_to_latlng(*d)]
    )
    assert ends == [(0.0, 4.0), (2.0, 4.0)] and kind == "shell"


def test_polygon_polygon_interior():
    o = _opt()
    a = "# # 0:0, 0:4, 4:4, 4:0"
    b = "# # 1:1, 1:2, 2:2, 2:1; 5:5, 5:6, 6:6, 6:5"
    expect(UNION, o, a, b,
           "# # 0:0, 0:4, 4:4, 4:0; 5:5, 5:6, 6:6, 6:5")
    expect(INTER, o, a, b, "# # 1:1, 1:2, 2:2, 2:1")
    expect(DIFF, o, a, b,
           "# # 0:0, 0:4, 4:4, 4:0; 2:1, 2:2, 1:2, 1:1")
    expect(SYMM, o, a, b,
           "# # 0:0, 0:4, 4:4, 4:0; 2:1, 2:2, 1:2, 1:1; "
           "5:5, 5:6, 6:6, 6:5")


# --- polylines through rectangles (test.cc:1656-1692) ----------------------


def test_polyline_entering_rectangle():
    o = _opt()
    a = "# 0:0, 2:2 #"
    b = "# # 1:1, 1:3, 3:3, 3:1"
    expect(UNION, o, a, b, "# 0:0, 1:1 # 1:1, 1:3, 3:3, 3:1", e=1)
    expect(INTER, o, a, b, "# 1:1, 2:2 #", e=1)
    expect(DIFF, o, a, b, "# 0:0, 1:1 #", e=1)
    expect(SYMM, o, a, b, "# 0:0, 1:1 # 1:1, 1:3, 3:3, 3:1", e=1)


def test_polyline_crossing_rectangle_twice():
    """s2boolean_operation_test.cc PolylineCrossingRectangleTwice — the
    true self-intersecting input: no vertex is added at the polyline's
    own 0:0 self-crossing (the quadratic-size-increase guarantee), but
    the polyline x rectangle crossings become vertices of the POLYGON
    output too."""
    o = _opt()
    a = "# 0:-5, 0:5, 5:0, -5:0 #"
    b = "# # 1:1, 1:-1, -1:-1, -1:1"
    expect(UNION, o, a, b,
           "# 0:-5, 0:-1 | 0:1, 0:5, 5:0, 1:0 | -1:0, -5:0 "
           "# 1:1, 1:0, 1:-1, 0:-1, -1:-1, -1:0, -1:1, 0:1", e=1)
    expect(INTER, o, a, b, "# 0:-1, 0:1 | 1:0, -1:0 #", e=1)
    expect(DIFF, o, a, b,
           "# 0:-5, 0:-1 | 0:1, 0:5, 5:0, 1:0 | -1:0, -5:0 #", e=1)
    expect(SYMM, o, a, b,
           "# 0:-5, 0:-1 | 0:1, 0:5, 5:0, 1:0 | -1:0, -5:0 "
           "# 1:1, 1:0, 1:-1, 0:-1, -1:-1, -1:0, -1:1, 0:1", e=1)


def test_self_intersecting_polylines():
    """s2boolean_operation_test.cc SelfIntersectingPolylines: the
    cross-operand intersection point 2:4 is always created; the
    self-intersection points 2:2 / 3:4 appear iff
    split_all_crossing_polyline_edges (s2boolean_operation.h:360-376)."""
    o = _opt()
    a = "# 0:2, 4:2, 2:0, 2:5 #"
    b = "# 0:4, 5:4, 3:6, 3:3 #"
    expect(UNION, o, a, b,
           "# 0:2, 4:2, 2:0, 2:4, 2:5 | 0:4, 2:4, 5:4, 3:6, 3:3 #", e=1)
    expect(INTER, o, a, b, "# 2:4, 2:4 | 2:4, 2:4 #", e=1)
    expect(DIFF, o, a, b, "# 0:2, 4:2, 2:0, 2:4, 2:5 #", e=1)
    expect(SYMM, o, a, b,
           "# 0:2, 4:2, 2:0, 2:4, 2:5 | 0:4, 2:4, 5:4, 3:6, 3:3 #", e=1)

    o = MixedOptions(SEMI_OPEN, CLOSED, True,
                     split_all_crossing_polyline_edges=True)
    expect(UNION, o, a, b,
           "# 0:2, 2:2, 4:2, 2:0, 2:2, 2:4, 2:5 "
           "| 0:4, 2:4, 3:4, 5:4, 3:6, 3:4, 3:3 #", e=1)
    expect(INTER, o, a, b, "# 2:4, 2:4 | 2:4, 2:4 #", e=1)
    expect(DIFF, o, a, b, "# 0:2, 2:2, 4:2, 2:0, 2:2, 2:4, 2:5 #", e=1)
    expect(SYMM, o, a, b,
           "# 0:2, 2:2, 4:2, 2:0, 2:2, 2:4, 2:5 "
           "| 0:4, 2:4, 3:4, 5:4, 3:6, 3:4, 3:3 #", e=1)


def test_three_overlapping_bars():
    """s2boolean_operation_test.cc ThreeOverlappingBars (RoundToE(2))."""
    o = _opt()
    a = "# # 0:0, 0:2, 3:2, 3:0; 0:3, 0:5, 3:5, 3:3"
    b = "# # 1:1, 1:4, 2:4, 2:1"
    expect(UNION, o, a, b,
           "# # 0:0, 0:2, 1:2, 1:3, 0:3, 0:5, 3:5, 3:3, 2:3, 2:2, 3:2, 3:0",
           e=2)
    expect(INTER, o, a, b,
           "# # 1:1, 1:2, 2:2, 2:1; 1:3, 1:4, 2:4, 2:3", e=2)
    expect(DIFF, o, a, b,
           "# # 0:0, 0:2, 1:2, 1:1, 2:1, 2:2, 3:2, 3:0; "
           "0:3, 0:5, 3:5, 3:3, 2:3, 2:4, 1:4, 1:3", e=2)
    expect(SYMM, o, a, b,
           "# # 0:0, 0:2, 1:2, 1:1, 2:1, 2:2, 3:2, 3:0; "
           "0:3, 0:5, 3:5, 3:3, 2:3, 2:4, 1:4, 1:3; "
           "1:2, 1:3, 2:3, 2:2", e=2)


def test_four_overlapping_bars():
    """s2boolean_operation_test.cc FourOverlappingBars (RoundToE(2))."""
    o = _opt()
    a = "# # 1:88, 1:93, 2:93, 2:88; -1:88, -1:93, 0:93, 0:88"
    b = "# # -2:89, -2:90, 3:90, 3:89; -2:91, -2:92, 3:92, 3:91"
    expect(UNION, o, a, b,
           "# # -1:88, -1:89, -2:89, -2:90, -1:90, -1:91, -2:91, -2:92, "
           "-1:92, -1:93, 0:93, 0:92, 1:92, 1:93, 2:93, 2:92, 3:92, 3:91, "
           "2:91, 2:90, 3:90, 3:89, 2:89, 2:88, 1:88, 1:89, 0:89, 0:88; "
           "0:90, 1:90, 1:91, 0:91", e=2)
    expect(INTER, o, a, b,
           "# # 1:89, 1:90, 2:90, 2:89; 1:91, 1:92, 2:92, 2:91; "
           "-1:89, -1:90, 0:90, 0:89; -1:91, -1:92, 0:92, 0:91", e=2)
    expect(DIFF, o, a, b,
           "# # 1:88, 1:89, 2:89, 2:88; 1:90, 1:91, 2:91, 2:90; "
           "1:92, 1:93, 2:93, 2:92; -1:88, -1:89, 0:89, 0:88; "
           "-1:90, -1:91, 0:91, 0:90; -1:92, -1:93, 0:93, 0:92", e=2)
    expect(SYMM, o, a, b,
           "# # 1:88, 1:89, 2:89, 2:88; -1:88, -1:89, 0:89, 0:88; "
           "1:90, 1:91, 2:91, 2:90; -1:90, -1:91, 0:91, 0:90; "
           "1:92, 1:93, 2:93, 2:92; -1:92, -1:93, 0:93, 0:92; "
           "-2:89, -2:90, -1:90, -1:89; -2:91, -2:92, -1:92, -1:91; "
           "0:89, 0:90, 1:90, 1:89; 0:91, 0:92, 1:92, 1:91; "
           "2:89, 2:90, 3:90, 3:89; 2:91, 2:92, 3:92, 3:91", e=2)


def test_overlapping_doughnuts():
    """s2boolean_operation_test.cc OverlappingDoughnuts (RoundToE(1)):
    CW-wound holes via the MakeIndexOrDie lax-polygon reading — the
    union has two holes rather than three."""
    o = _opt()
    a = ("# # -1:-93, -1:-89, 3:-89, 3:-93; "
         "0:-92, 2:-92, 2:-90, 0:-90")
    b = ("# # -3:-91, -3:-87, 1:-87, 1:-91; "
         "-2:-90, 0:-90, 0:-88, -2:-88")
    expect(UNION, o, a, b,
           "# # -1:-93, -1:-91, -3:-91, -3:-87, 1:-87, 1:-89, 3:-89, 3:-93; "
           "0:-92, 2:-92, 2:-90, 1:-90, 1:-91, 0:-91; "
           "-2:-90, -1:-90, -1:-89, 0:-89, 0:-88, -2:-88", e=1)
    expect(INTER, o, a, b,
           "# # -1:-91, -1:-90, 0:-90, 0:-91; "
           "0:-90, 0:-89, 1:-89, 1:-90", e=1)
    expect(DIFF, o, a, b,
           "# # -1:-93, -1:-91, 0:-91, 0:-92, 2:-92, "
           "2:-90, 1:-90, 1:-89, 3:-89, 3:-93; "
           "-1:-90, -1:-89, 0:-89, 0:-90", e=1)
    expect(SYMM, o, a, b,
           "# # -1:-93, -1:-91, 0:-91, 0:-92, 2:-92, "
           "2:-90, 1:-90, 1:-89, 3:-89, 3:-93; "
           "-3:-91, -3:-87, 1:-87, 1:-89, 0:-89, 0:-88,-2:-88,-2:-90,"
           "-1:-90,-1:-91; "
           "-1:-90, -1:-89, 0:-89, 0:-90; "
           "1:-91, 0:-91, 0:-90, 1:-90", e=1)


def test_meridian_splitting():
    """s2boolean_operation_test.cc MeridianSplitting: subtracting a
    degenerate loop along the 180-degree meridian splits geometry so no
    edge crosses the meridian (the GeoJSON-compat transform).  The
    sliver operand is a LAX ring with a repeated vertex and zero area —
    its interior must be empty (sibling-pair-aware GetReferencePoint),
    and each crossing produces ONE cut vertex despite both sibling
    edges being crossed.  Geodesic intersection latitudes are pinned to
    the reference's own digits (e=9)."""
    meridian = MixedGeometry(
        polygon=Polygon(
            [Loop(np.array([[0.0, 0, -1], [-1, 0, 0], [0, 0, 1], [-1, 0, 0]]))]
        )
    )
    cases = [
        ("# 0:-160, 0:170 #", "# 0:-160, 0:180, 0:170 #"),
        ("# # 0:0, 0:120, 0:-120",
         "# # 90:0, 0:180, 0:-120, 0:0, 0:120, 0:180"),
        ("# # 9:179, 9:-179, 10:-179, 10:179",
         "# # 9.00134850712993:180, 9:-179, 10:-179, 10.0014925269841:180; "
         "10.0014925269841:180, 10:179, 9:179, 9.00134850712993:180"),
        ("# # 8:178, 8:-178, 11:-178, 11:178; 9:179, 10:179, 10:-179, 9:-179",
         "# # 10.0014925269841:180, 10:-179, 9:-179, 9.00134850712993:180, "
         "8.00481316618607:180, 8:-178, 11:-178, 11.00654129428:180; "
         "9.00134850712993:180, 9:179, 10:179, 10.0014925269841:180, "
         "11.00654129428:180, 11:178, 8:178, 8.00481316618607:180"),
        ("# # 9:-179, 9:179, 10:179, 10:-179",
         "# # 0:180, 9.00134850712993:180, 9:179, 10:179, "
         "10.0014925269841:180, 90:0, 10.0014925269841:180, 10:-179, "
         "9:-179, 9.00134850712993:180, 0:180, -90:0"),
    ]
    for inp, exp in cases:
        a = parse_mixed(inp)
        got = mixed_boolean_op(a, meridian, "difference", MixedOptions())
        want = parse_mixed(exp)
        assert _points_multiset(got, 9) == _points_multiset(want, 9), inp
        assert _lines_multiset(got, 9) == _lines_multiset(want, 9), inp
        assert _polygon_multiset(got, 9) == _polygon_multiset(want, 9), inp


def test_polyline_edge_isolated_start_vertex_plus_interior_crossing():
    """s2boolean_operation_test.cc:869-884: polyline minus polygon
    yielding an isolated start vertex (degenerate chain 0:0,0:0) PLUS a
    clipped V-shaped remainder whose crossings must attach to the real
    edge, not the degenerate one."""
    o = _opt()
    expect(DIFF, o, "# 0:0, 0:10, 0:4 # ", "# # 0:0, -5:5, 5:5",
           "# 0:0, 0:0 | 0:5, 0:10, 0:5 #", e=1)


def test_polygon_edge_isolated_start_vertex_plus_interior_crossing():
    """s2boolean_operation_test.cc:886-899: CLOSED-model intersection
    where operand a is a CLOCKWISE loop — the lax single-loop reading
    (interior on the left = the complement) — leaving an isolated
    vertex 0:0 as a point shell plus the tip triangle beyond lng 5."""
    o = _opt(pgm=CLOSED)
    expect(INTER, o, "# # 0:0, 5:5, -5:5", "# # 1:4, 0:0, 0:8",
           "# # 0:0; 0:5, 0:8, 0.8:5", e=1)
