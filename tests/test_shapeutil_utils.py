"""Port of the small shapeutil suites: s2shapeutil_count_edges_test.cc,
s2shapeutil_count_vertices_test.cc, s2shapeutil_edge_wrap_test.cc,
s2shapeutil_conversion_test.cc."""

from __future__ import annotations

import numpy as np

from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.shapeutil import (
    count_edges,
    count_edges_up_to,
    count_vertices,
    next_edge_wrap,
    prev_edge_wrap,
    shape_to_points,
    shape_to_polygon,
    shape_to_polyline,
)


def make_index(s: str) -> list:
    """'points # polylines # polygons' → [(dim, chains)], with each
    point its own shape like MakeIndexOrDie's '|' separator builds ONE
    point shape... the reference's count test asserts per-shape edge
    counts, so points form one shape of N chains here."""
    parts = s.split("#")
    while len(parts) < 3:
        parts.append("")
    shapes = []
    pts_str = parts[0].strip()
    if pts_str:
        pts = parse_points(pts_str.replace("|", ","))
        shapes.append((0, [p[None] for p in pts]))
    for tok in parts[1].split("|"):
        tok = tok.strip()
        if tok:
            shapes.append((1, [parse_points(tok)]))
    for tok in parts[2].split("|"):
        tok = tok.strip()
        if tok:
            shapes.append(
                (2, [parse_points(l) for l in tok.split(";") if l.strip()])
            )
    return shapes


def test_count_edges_up_to():
    """s2shapeutil_count_edges_test.cc:30-44."""
    index = make_index(
        "0:0 | 0:1 | 0:2 | 0:3 | 0:4 # 1:0, 1:1 | 1:2, 1:3 | 1:4, 1:5, 1:6 #"
    )
    assert len(index) == 4
    assert count_edges([index[0]]) == 5
    assert count_edges([index[1]]) == 1
    assert count_edges([index[2]]) == 1
    assert count_edges([index[3]]) == 2
    assert count_edges(index) == 9
    assert count_edges_up_to(index, 1) == 5
    assert count_edges_up_to(index, 5) == 5
    assert count_edges_up_to(index, 6) == 6
    assert count_edges_up_to(index, 8) == 9


def test_count_vertices():
    """s2shapeutil_count_vertices_test.cc:28-55."""
    assert count_vertices(make_index("1:1 | 2:2 | 3:3 # #")) == 3
    assert count_vertices(make_index("1:1 | 2:2 # 3:3, 4:4, 5:5 #")) == 5
    assert (
        count_vertices(
            make_index("1:1 | 2:2 # 3:3, 4:4, 5:5 # 6:6, 7:7, 8:8, 9:9")
        )
        == 9
    )
    assert count_vertices(make_index("# 3:3, 3:3, 3:3 #")) == 3
    assert count_vertices(make_index("# # 4:4, 4:4, 4:4, 4:4")) == 4


def test_next_prev_edge_point_does_not_wrap():
    """edge_wrap_test.cc:33-44."""
    d, chains = make_index("1:1 | 2:2 ##")[0]
    assert prev_edge_wrap(d, chains, 0) == -1
    assert next_edge_wrap(d, chains, 0) == -1
    assert prev_edge_wrap(d, chains, 1) == -1
    assert next_edge_wrap(d, chains, 1) == -1


def test_next_prev_edge_open_polyline_does_not_wrap():
    """edge_wrap_test.cc:46-56."""
    d, chains = make_index("# 1:1, 2:2, 3:3 #")[0]
    assert prev_edge_wrap(d, chains, 0) == -1
    assert next_edge_wrap(d, chains, 0) == 1
    assert prev_edge_wrap(d, chains, 1) == 0
    assert next_edge_wrap(d, chains, 1) == -1


def test_next_prev_edge_closed_polyline_wraps():
    """edge_wrap_test.cc:58-69."""
    d, chains = make_index("# 0:0, 1:1, 0:2, -1:1, 0:0 #")[0]
    assert prev_edge_wrap(d, chains, 0) == 3
    assert next_edge_wrap(d, chains, 0) == 1
    assert prev_edge_wrap(d, chains, 3) == 2
    assert next_edge_wrap(d, chains, 3) == 0


def test_next_prev_edge_polygon_wraps():
    """edge_wrap_test.cc:71-82."""
    d, chains = make_index("## 0:0, 1:1, 0:2, -1:1")[0]
    assert prev_edge_wrap(d, chains, 0) == 3
    assert next_edge_wrap(d, chains, 0) == 1
    assert prev_edge_wrap(d, chains, 3) == 2
    assert next_edge_wrap(d, chains, 3) == 0


# ------------------------------------------------------- conversions


def test_point_vector_shape_to_points():
    """conversion_test.cc:44-52."""
    points = parse_points("11:11, 10:0, 5:5")
    out = shape_to_points([p[None] for p in points])
    assert len(out) == 3
    assert np.array_equal(out, points)


def test_line_to_polyline():
    """conversion_test.cc:54-62."""
    points = parse_points("11:11, 10:0, 5:5")
    out = shape_to_polyline([points])
    assert np.array_equal(out, points)


def test_closed_line_to_polyline():
    """conversion_test.cc:64-74."""
    points = parse_points("0:0, 0:10, 10:10, 0:0")
    out = shape_to_polyline([points])
    assert np.array_equal(out, points)


def _verify_polygon(loops, expected_num_loops, expected_num_vertices):
    poly = shape_to_polygon(loops)
    assert len(poly.loops) == expected_num_loops
    assert sum(len(l.vertices) for l in poly.loops) == expected_num_vertices
    for i, loop in enumerate(poly.loops):
        assert np.array_equal(loop.vertices, loops[i])


def test_polygon_with_hole_to_polygon():
    """conversion_test.cc:94-103."""
    shell = parse_points("0:0, 0:10, 10:10, 10:0")
    hole = parse_points("4:4, 6:4, 6:6, 4:6")
    _verify_polygon([shell, hole], 2, 8)


def test_multi_polygon_to_polygon():
    """conversion_test.cc:105-114."""
    shell1 = parse_points("0:0, 0:2, 2:2, 2:0")
    shell2 = parse_points("0:4, 0:6, 3:6")
    _verify_polygon([shell1, shell2], 2, 7)


def test_two_holes_to_polygon():
    """conversion_test.cc:116-127."""
    shell = parse_points("0:0, 0:10, 10:10, 10:0")
    hole1 = parse_points("1:1, 3:3, 1:3")
    hole2 = parse_points("2:6, 4:7, 2:8")
    _verify_polygon([shell, hole1, hole2], 3, 10)


def test_full_polygon_to_polygon():
    """conversion_test.cc:129-137."""
    poly = shape_to_polygon([np.empty((0, 3))])
    assert poly.is_full


def test_shape_to_polygon_region_semantics():
    """The converted polygon's region must equal the lax interior-on-
    left containment for CW-hole and complement inputs (InitOriented
    semantics — the original port only pinned vertex structure)."""
    import numpy as np

    from s2geometry_spark.kernel.contains import parse_points
    from s2geometry_spark.kernel.shapeutil import (
        LaxPolygon,
        contains_brute_force,
        shape_to_polygon,
    )

    cases = [
        # CCW shell + CW hole (annulus)
        [parse_points("0:0, 0:10, 10:10, 10:0"),
         parse_points("4:4, 6:4, 6:6, 4:6")],
        # two CW holes
        [parse_points("0:0, 0:10, 10:10, 10:0"),
         parse_points("1:1, 3:3, 1:3"),
         parse_points("2:6, 4:7, 2:8")],
        # a single CW loop = the complement region
        [parse_points("0:0, 5:5, -5:5")],
    ]
    rng = np.random.RandomState(8)
    for chains in cases:
        shape = LaxPolygon(chains)
        poly = shape_to_polygon(chains)
        for lp, out in zip(chains, poly.loops):
            assert np.array_equal(np.asarray(lp), out.vertices)
        for _ in range(60):
            p = rng.randn(3)
            p /= np.linalg.norm(p)
            assert bool(poly.contains(p[None])[0]) == contains_brute_force(
                shape, p)
