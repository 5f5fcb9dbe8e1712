"""s2text_format_test.cc writer tail: UninitializedLoop/EmptyPolyline/
EmptyPointVector (cc:163-197), PointShapeWorks / PolylineShapeWorks /
PolygonShapeWorks (cc:198-215), S2PolygonLoopSeparator /
LaxPolygonLoopSeparator (cc:216-231), S2LatLngSpan (cc:232-237),
MakeLaxPolygon FullWithHole (cc:252-258), and the ToString(S2ShapeIndex)
round-trip matrix (cc:263-276)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.contains import (
    Loop,
    Polygon,
    format_index,
    format_latlngs,
    format_lax_polygon,
    format_points,
    format_polygon,
    format_shape,
    parse_points,
    parse_polygon,
)
from s2geometry_spark.kernel.shapeutil import LaxPolygon, LaxPolyline
from s2geometry_spark.kernel.textformat import safe_make_lax_polygon
from s2geometry_spark.kernel.vector_shapes import PointVectorShape


def make_shapes(s: str) -> list:
    """MakeIndexOrDie over the duck-typed writer shapes."""
    sections = s.split("#")
    shapes: list = []
    pts = [
        parse_points(tok)[0]
        for tok in sections[0].split("|")
        if tok.strip()
    ]
    if pts:
        shapes.append(PointVectorShape(np.asarray(pts)))
    for tok in sections[1].split("|"):
        if tok.strip():
            shapes.append(LaxPolyline(parse_points(tok)))
    loops = []
    for tok in sections[2].split(";"):
        tok = tok.strip()
        if not tok:
            continue
        loops.append(
            np.zeros((0, 3)) if tok == "full" else parse_points(tok)
        )
    if loops:
        shapes.append(LaxPolygon(loops))
    return shapes


def test_uninitialized_and_empty_writers():
    """UninitializedLoop / EmptyPolyline / EmptyPointVector → ""
    (cc:163-197); EmptyPolygon → "empty", FullPolygon → "full"."""
    assert format_points(np.zeros((0, 3))) == ""
    assert format_polygon(Polygon([])) == "empty"
    assert format_polygon(
        Polygon([Loop(np.array([[0.0, 0.0, -1.0]]))])
    ) == "full"


def test_point_shape_works():
    shapes = make_shapes("0:0 | 0:5 | 5:0 ##")
    assert format_shape(shapes[0]) == "0:0 | 0:5 | 5:0 ##"


def test_polyline_shape_works():
    shapes = make_shapes("# 0:0, 0:5, 5:0 #")
    assert format_shape(shapes[0]) == "# 0:0, 0:5, 5:0 #"


def test_polygon_shape_works():
    shapes = make_shapes("## 0:0, 0:5, 5:0; 0:0, 0:2, 1:1")
    assert format_shape(shapes[0]) == "## 0:0, 0:5, 5:0; 0:0, 0:2, 1:1"


def test_s2polygon_loop_separator():
    loop1 = "0:0, 0:5, 5:0"
    loop2 = "1:1, 1:4, 4:1"  # shells and holes same direction
    polygon = parse_polygon(f"{loop1}; {loop2}")
    assert format_polygon(
        polygon, loop_separator=";\n"
    ) == f"{loop1};\n{loop2}"
    assert format_polygon(
        polygon, loop_separator="; "
    ) == f"{loop1}; {loop2}"


def test_lax_polygon_loop_separator():
    loop1 = "0:0, 0:5, 5:0"
    loop2 = "1:1, 4:1, 1:4"  # interior on the left of all loops
    loops = safe_make_lax_polygon(f"{loop1}; {loop2}")
    assert format_lax_polygon(loops) == f"{loop1};\n{loop2}"
    assert format_lax_polygon(loops, "; ") == f"{loop1}; {loop2}"


def test_s2latlng_span():
    assert format_latlngs(
        [(-20, 150), (-20, 151), (-19, 150)]
    ) == "-20:150, -20:151, -19:150"


def test_make_lax_polygon_full_with_hole():
    loops = safe_make_lax_polygon("full; 0:0")
    assert len(loops) == 2
    assert len(loops[0]) == 0
    assert len(loops[1]) == 1
    assert LaxPolygon(loops).num_edges() == 1


@pytest.mark.parametrize(
    "s",
    [
        "# #",
        "0:0 # #",
        "0:0 | 1:0 # #",
        "# 0:0, 0:0 #",
        "# 0:0, 0:0 | 1:0, 2:0 #",
        "# # 0:0",
        "# # 0:0, 0:1",
        "# # 0:0, 0:1, 1:0",
        "# # 0:0, 0:1, 1:0; 2:2, 3:3",
        "# # full",
    ],
)
def test_to_string_s2shape_index_roundtrip(s):
    """ToString(S2ShapeIndex) (cc:263-276): parse → format is the
    identity on canonical index strings."""
    assert format_index(make_shapes(s)) == s
