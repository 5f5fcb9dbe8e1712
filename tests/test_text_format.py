"""s2textformat writer fixtures — port of s2text_format_test.cc
(ToString SpecialCases :79-84, NegativeZeros :85-103, the
MinimalDigitsE5/E6/E7 + DoubleConstants properties :104-153 with our own
rng, FaceCellId/Level3CellId :154-162, round trips)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel.contains import (
    format_point,
    format_points,
    parse_points,
)
from s2geometry_spark.kernel.coords import latlng_to_xyz


def _fmt_ll(lat_deg, lng_deg):
    x, y, z = latlng_to_xyz(np.float64(lat_deg), np.float64(lng_deg))
    return format_point(np.array([x, y, z]))


def test_to_string_special_cases():
    # s2text_format_test.cc:79-84
    assert _fmt_ll(0, 0) == "0:0"
    assert format_point(np.array([0.0, 0.0, 1.0])) == "90:0"


def test_to_string_negative_zeros():
    # s2text_format_test.cc:85-103: -0.0 coordinates format like +0.0
    assert format_point(np.array([1.0, -0.0, 0.0])) == "0:0"
    assert format_point(np.array([1.0, 0.0, -0.0])) == "0:0"
    assert format_point(np.array([1.0, -0.0, -0.0])) == "0:0"
    assert format_point(np.array([-1.0, -0.0, 0.0])) == "0:180"
    assert format_point(np.array([-1.0, 0.0, -0.0])) == "0:180"
    assert format_point(np.array([-1.0, -0.0, -0.0])) == "0:180"
    assert format_point(np.array([-0.0, 0.0, 1.0])) == "90:0"
    assert format_point(np.array([0.0, -0.0, 1.0])) == "90:0"
    assert format_point(np.array([-0.0, -0.0, 1.0])) == "90:0"


def _max_digits(s: str) -> int:
    out = 0
    for part in s.split(":"):
        if "e" in part or "E" in part:
            continue  # scientific notation (tiny values), not fixed digits
        if "." in part:
            out = max(out, len(part.split(".")[1]))
    return out


@pytest.mark.parametrize("exponent", [5, 6, 7])
def test_minimal_digits_exx(exponent):
    # s2text_format_test.cc:104-134: lat/lngs on the E<k> grid format
    # with at most k digits after the decimal point
    rng = np.random.default_rng(42)
    scale = 10.0**exponent
    for _ in range(100):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        lat = np.degrees(np.arctan2(v[2], np.hypot(v[0], v[1])))
        lng = np.degrees(np.arctan2(v[1], v[0]))
        lat_e = np.rint(lat * scale) / scale
        lng_e = np.rint(lng * scale) / scale
        s = _fmt_ll(lat_e, lng_e)
        assert _max_digits(s) <= exponent, s
        # and the string parses back to the same grid point
        back = parse_points(s)[0]
        orig = parse_points(f"{lat_e!r}:{lng_e!r}")[0]
        assert np.array_equal(back, orig), s


def test_minimal_digits_double_constants():
    # s2text_format_test.cc:135-153
    rng = np.random.default_rng(7)
    for _ in range(100):
        max_digits = int(rng.integers(0, 11))
        scale = 10**max_digits
        lat = int(np.rint(rng.uniform(-90.0 * scale, 90.0 * scale)))
        lng = int(np.rint(rng.uniform(-180.0 * scale, 180.0 * scale)))
        s = _fmt_ll(lat / scale, lng / scale)
        assert _max_digits(s) <= max_digits, (s, max_digits)


def test_roundtrip_precision_is_exact():
    # the %.17g mode reproduces arbitrary points bit-exactly
    rng = np.random.default_rng(3)
    for _ in range(50):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        s = format_points(v[None], roundtrip_precision=True)
        # reparse: %.17g preserves the doubles exactly, so the parsed
        # point must equal latlng_to_xyz(xyz_to_latlng(v)) bit-for-bit
        from s2geometry_spark.kernel.coords import xyz_to_latlng

        back = parse_points(s)[0]
        lat0, lng0 = xyz_to_latlng(
            np.array([v[0]]), np.array([v[1]]), np.array([v[2]])
        )
        x, y, z = latlng_to_xyz(lat0, lng0)
        expect = np.array([x[0], y[0], z[0]])
        assert np.array_equal(back, expect)


def test_cell_id_debug_strings():
    # ToString FaceCellId / Level3CellId (s2text_format_test.cc:154-162)
    from s2geometry_spark.kernel import cellid as K
    from s2geometry_spark.kernel.cid import CID

    assert K.to_debug_string(np.array([CID.from_face(2).id], np.uint64)) == ["2/"]
    c = CID.from_face(2).child(0).child(1).child(2)
    assert K.to_debug_string(np.array([c.id], np.uint64)) == ["2/012"]
    assert int(K.from_debug_string("2/012")[0]) == c.id
