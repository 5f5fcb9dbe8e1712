"""s2text_format_test.cc Safe* tranche: the bool-returning parser
surface (kernel/textformat.py) — every Make*/Parse* variant with the
reference's valid and invalid inputs.
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel import textformat as T
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.region import LatLng, LatLngRect


def test_safe_parse_latlngs_valid_input():
    lls = T.safe_parse_latlngs("-20:150, -20:151, -19:150")
    assert lls == [(-20, 150), (-20, 151), (-19, 150)]


def test_safe_parse_latlngs_invalid_input():
    assert T.safe_parse_latlngs("blah") is None
    assert T.safe_parse_latlngs("NaN:0") is None
    assert T.safe_parse_latlngs("inf:0") is None
    assert T.safe_parse_latlngs("infinity:0") is None
    assert T.safe_parse_latlngs("91:0") is None


def test_safe_parse_points_valid_input():
    v = T.safe_parse_points("-20:150, -20:151, -19:150")
    assert v is not None
    assert np.array_equal(v, parse_points("-20:150, -20:151, -19:150"))


def test_safe_parse_points_invalid_input():
    assert T.safe_parse_points("blah") is None


def test_safe_make_point_invalid_input():
    # MakePoint.InvalidInput
    assert T.safe_parse_points("blah") is None


def test_safe_make_latlng_valid_input():
    assert T.safe_make_latlng("-12.3:45.6") == (-12.3, 45.6)


def test_safe_make_latlng_invalid_input():
    assert T.safe_make_latlng("blah") is None


def test_safe_make_latlng_rect_valid_input():
    rect = T.safe_make_latlng_rect("-10:-10, 10:10")
    want = LatLngRect.from_point_pair(
        LatLng.from_degrees(-10, -10), LatLng.from_degrees(10, 10)
    )
    assert rect is not None
    assert rect.approx_equals(want, 0.0)


def test_safe_make_latlng_rect_invalid_input():
    assert T.safe_make_latlng_rect("blah") is None


def test_safe_make_cellid_valid_input():
    assert T.safe_make_cellid("3/") == CID.from_face(3)


def test_safe_make_cellid_invalid_input():
    assert T.safe_make_cellid("blah") is None
    assert T.safe_make_cellid("6/0") is None
    assert T.safe_make_cellid("3/04") is None


def test_safe_make_cell_union_valid_input():
    got = T.safe_make_cell_union("1/3, 4/")
    assert got == [CID.from_face(1).child(3), CID.from_face(4)]


def test_safe_make_cell_union_invalid_input():
    assert T.safe_make_cell_union("abc") is None
    assert T.safe_make_cell_union("3/1 4/1") is None


def test_safe_make_loop_valid_input():
    v = T.safe_make_loop("-20:150, -20:151, -19:150")
    assert np.array_equal(v, parse_points("-20:150, -20:151, -19:150"))


def test_safe_make_loop_invalid_input():
    assert T.safe_make_loop("blah") is None


def test_safe_make_polyline_valid_input():
    v = T.safe_make_polyline("-20:150, -20:151, -19:150")
    assert np.array_equal(v, parse_points("-20:150, -20:151, -19:150"))


def test_safe_make_polyline_invalid_input():
    assert T.safe_make_polyline("blah") is None


def test_safe_make_lax_polyline_valid_input():
    v = T.safe_make_lax_polyline("-20:150, -20:151, -19:150")
    assert np.array_equal(v, parse_points("-20:150, -20:151, -19:150"))


def test_safe_make_lax_polyline_invalid_input():
    assert T.safe_make_lax_polyline("blah") is None


def test_safe_make_polygon_valid_input():
    poly = T.safe_make_polygon("-20:150, -20:151, -19:150")
    assert poly is not None
    assert len(poly.loops) == 1


def test_safe_make_polygon_invalid_input():
    assert T.safe_make_polygon("blah") is None


def test_safe_make_polygon_empty():
    # an empty string or 'empty' yields the empty polygon
    assert T.safe_make_polygon("").loops == []
    assert T.safe_make_polygon("empty").loops == []


def test_safe_make_verbatim_polygon_valid_input():
    poly = T.safe_make_verbatim_polygon("-20:150, -20:151, -19:150")
    assert poly is not None
    assert len(poly.loops) == 1
    got = poly.loops[0].vertices
    assert np.array_equal(got, parse_points("-20:150, -20:151, -19:150"))


def test_safe_make_verbatim_polygon_invalid_input():
    assert T.safe_make_verbatim_polygon("blah") is None


def test_safe_make_lax_polygon_valid_input():
    loops = T.safe_make_lax_polygon("-20:150, -20:151, -19:150")
    assert loops is not None
    assert len(loops) == 1
    assert len(loops[0]) == 3


def test_safe_make_lax_polygon_invalid_input():
    assert T.safe_make_lax_polygon("blah") is None


def test_safe_make_index_valid_input():
    shapes = T.safe_make_index("# 0:0, 0:0 | 1:0, 2:0 #")
    assert shapes is not None
    assert len(shapes) == 2


def test_safe_make_index_invalid_input():
    assert T.safe_make_index("# blah #") is None
