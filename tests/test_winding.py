"""S2WindingOperation fixtures (s2winding_operation_test.cc:142-290),
compared by region semantics (dense point-sample membership)."""

import numpy as np
import pytest

from s2geometry_spark.kernel.contains import Loop, Polygon, parse_points, parse_polygon
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.winding import WindingRule, winding_operation


def _pt(s: str) -> np.ndarray:
    return parse_points(s)[0]


def _run(loop_strs, ref_str, ref_winding, rule):
    loops = [parse_points(s) for s in loop_strs]
    return winding_operation(loops, _pt(ref_str), ref_winding, rule)


def _region_equal(got, expected_str, lat_rng, lng_rng, n=60):
    out_loops, full = got
    lat = np.linspace(*lat_rng, n)
    lng = np.linspace(*lng_rng, n)
    glat, glng = np.meshgrid(lat, lng)
    x, y, z = latlng_to_xyz(glat.ravel(), glng.ravel())
    pts = np.stack([x, y, z], -1)
    if expected_str == "full":
        assert full and not out_loops
        return
    if expected_str == "":
        assert not full and not out_loops
        return
    assert not full
    got_poly = Polygon([Loop(l) for l in out_loops])
    exp_poly = parse_polygon(expected_str)
    gm = got_poly.contains(pts)
    em = exp_poly.contains(pts)
    # ignore samples within a hair of the expected boundary (crossing
    # vertices created by the overlay differ from the fixture's by ~1e-15)
    disagree = gm != em
    assert disagree.mean() < 0.002, (
        f"{disagree.sum()} of {len(pts)} samples disagree"
    )


def test_rectangle():
    # s2winding_operation_test.cc:142-159
    sq = ["0:0, 0:10, 10:10, 10:0"]
    for rule, exp in [
        (WindingRule.POSITIVE, "0:0, 0:10, 10:10, 10:0"),
        (WindingRule.NEGATIVE, ""),
        (WindingRule.NON_ZERO, "0:0, 0:10, 10:10, 10:0"),
        (WindingRule.ODD, "0:0, 0:10, 10:10, 10:0"),
    ]:
        got = _run(sq, "5:5", 1, rule)
        _region_equal(got, exp, (-3, 13), (-3, 13))


def test_bow_tie():
    # s2winding_operation_test.cc:161-180 — a self-intersecting loop
    bow = ["5:-5, -5:5, 5:5, -5:-5"]
    cases = [
        (WindingRule.POSITIVE, "0:0, -5:5, 5:5"),
        (WindingRule.NEGATIVE, "-5:-5, 0:0, 5:-5"),
        (WindingRule.NON_ZERO, "0:0, -5:5, 5:5; -5:-5, 0:0, 5:-5"),
        (WindingRule.ODD, "0:0, -5:5, 5:5; -5:-5, 0:0, 5:-5"),
    ]
    for rule, exp in cases:
        got = _run(bow, "10:0", 0, rule)
        _region_equal(got, exp, (-7, 7), (-7, 7))


def test_touching_triangles_positive():
    # s2winding_operation_test.cc:202-212 (POSITIVE removes the shared
    # degenerate boundary)
    got = _run(["0:0, 0:8, 8:8", "0:0, 8:8, 8:0"], "1:1", 1, WindingRule.POSITIVE)
    _region_equal(got, "0:0, 0:8, 8:8, 8:0", (-2, 10), (-2, 10))


def test_union_of_squares_thresholds():
    # s2winding_operation_test.cc:233-263: 5 overlapping squares; the
    # POSITIVE rule with ref_winding k computes "covered by ≥ (2-k)"...
    squares = [
        "0:0, 0:4, 4:4, 4:0", "1:1, 1:5, 5:5, 5:1", "2:2, 2:6, 6:6, 6:2",
        "3:3, 3:7, 7:7, 7:3", "4:4, 4:8, 8:8, 8:4",
    ]
    cases = [
        (1, "7:4, 7:3, 6:3, 6:2, 5:2, 5:1, 4:1, 4:0, 0:0, 0:4, "
            "1:4, 1:5, 2:5, 2:6, 3:6, 3:7, 4:7, 4:8, 8:8, 8:4"),
        (0, "6:4, 6:3, 5:3, 5:2, 4:2, 4:1, 1:1, 1:4, 2:4, 2:5, "
            "3:5, 3:6, 4:6, 4:7, 7:7, 7:4"),
        (-1, "5:4, 5:3, 4:3, 4:2, 2:2, 2:4, 3:4, 3:5, 4:5, 4:6, 6:6, 6:4"),
    ]
    for ref_winding, exp in cases:
        got = _run(squares, "0.5:0.5", ref_winding, WindingRule.POSITIVE)
        _region_equal(got, exp, (-1, 9), (-1, 9), n=80)


def test_winding_exact_sides_on_degenerate_sliver():
    """POSITIVE union of a square and a 1e-11-degree sliver sharing its
    equator edge: the shared edge is interior to the union and must
    dissolve.  The former ±1e-9 probe pair overshoots the sliver
    entirely; the exact analytic incident-edge winding classifies both
    sides correctly."""
    import numpy as np

    from s2geometry_spark.kernel import measures as M
    from s2geometry_spark.kernel.contains import parse_points
    from s2geometry_spark.kernel.winding import WindingRule, winding_operation

    d = 1e-11
    square = parse_points("0:0, 0:4, 4:4, 4:0")
    sliver = parse_points(f"-{d}:0, -{d}:4, 0:4, 0:0")
    res, full = winding_operation(
        [square, sliver], parse_points("2:2")[0], 1, WindingRule.POSITIVE
    )
    assert not full
    assert len(res) == 1
    assert len(res[0]) == 6
    want = M.even_odd_area([square]) + M.even_odd_area([sliver])
    np.testing.assert_allclose(
        M.even_odd_area(list(res)), want, rtol=0, atol=1e-15
    )


class TestDegenerateBoundaries:
    """include_degeneracies (s2winding_operation.h:96-124): point shells
    and sibling pairs re-emitted per the reference's rules."""

    def _pts(self, s):
        import numpy as np

        from s2geometry_spark.kernel.contains import parse_points

        return np.asarray(parse_points(s)).reshape(-1, 3)

    def test_cancelled_triangle_oddity(self):
        import numpy as np

        from s2geometry_spark.kernel.winding import (
            WindingRule,
            winding_operation,
        )

        tri = self._pts("0:0, 0:5, 5:0")
        ref = self._pts("80:80")[0]
        res, full, deg = winding_operation(
            [tri, tri[::-1].copy()], ref, 0, WindingRule.ODD,
            include_degeneracies=True,
        )
        assert res == [] and not full
        assert len(deg["sibling_edges"]) == 3 and not deg["points"]
        # doubled pair (multiplicity 2) is even → suppressed under ODD
        res, full, deg = winding_operation(
            [tri, tri[::-1].copy(), tri.copy(), tri[::-1].copy()],
            ref, 0, WindingRule.ODD, include_degeneracies=True,
        )
        assert not deg["sibling_edges"]

    def test_point_shells_and_segments_by_region(self):
        import numpy as np

        from s2geometry_spark.kernel.winding import (
            WindingRule,
            winding_operation,
        )

        sq = self._pts("0:0, 0:10, 10:10, 10:0")
        ref = self._pts("80:80")[0]
        loops = [
            sq,
            self._pts("20:20"),      # point outside (w=0) → emitted
            self._pts("5:5"),        # point inside (w=1) → suppressed
            self._pts("4:4, 4:6"),   # segment inside → suppressed
            self._pts("30:4, 30:6"),  # segment outside → emitted
        ]
        res, full, deg = winding_operation(
            loops, ref, 0, WindingRule.POSITIVE, include_degeneracies=True
        )
        assert len(res) == 1
        assert len(deg["points"]) == 1
        assert np.allclose(deg["points"][0], self._pts("20:20")[0])
        assert len(deg["sibling_edges"]) == 1

    def test_default_signature_unchanged(self):
        from s2geometry_spark.kernel.winding import (
            WindingRule,
            winding_operation,
        )

        sq = self._pts("0:0, 0:10, 10:10, 10:0")
        ref = self._pts("80:80")[0]
        out = winding_operation([sq], ref, 0, WindingRule.POSITIVE)
        assert len(out) == 2 and len(out[0]) == 1


def _deg_latlng(deg):
    from s2geometry_spark.kernel.coords import xyz_to_latlng

    pts = sorted(
        tuple(round(float(x), 6) for x in xyz_to_latlng(*p))
        for p in deg["points"]
    )
    ses = sorted(
        tuple(sorted(
            tuple(round(float(x), 6) for x in xyz_to_latlng(*q))
            for q in (a, b)
        ))
        for a, b in deg["sibling_edges"]
    )
    return pts, ses


def test_empty():
    # s2winding_operation_test.cc:119-126
    got = winding_operation([], _pt("5:5"), 0, WindingRule.POSITIVE)
    assert got == ([], False)
    got = winding_operation([], _pt("5:5"), 1, WindingRule.POSITIVE)
    assert got == ([], True)


def test_point_loop():
    # cc:128-133: include_degeneracies False -> empty, True -> "2:2"
    loops, full, deg = winding_operation(
        [parse_points("2:2")], _pt("5:5"), 0, WindingRule.POSITIVE, True)
    assert (loops, full) == ([], False)
    assert _deg_latlng(deg) == ([(2.0, 2.0)], [])


def test_sibling_pair_loop():
    # cc:135-140
    loops, full, deg = winding_operation(
        [parse_points("2:2, 3:3")], _pt("5:5"), 0,
        WindingRule.POSITIVE, True)
    assert (loops, full) == ([], False)
    assert _deg_latlng(deg) == ([], [((2.0, 2.0), (3.0, 3.0))])


def test_collapsing_shell():
    # cc:182-200: a 3-degree triangle under a 5-degree snap collapses to
    # the point shell 0:0; the CW variants leave FULL (the snapped
    # reference winding transports across the collapse)
    import math

    from s2geometry_spark.kernel.builder import IdentitySnapFunction
    from s2geometry_spark.kernel.winding import winding_operation_snapped

    snap = IdentitySnapFunction(math.radians(5))
    for ref_str, w in (("10:0", 0), ("1:1", 1)):
        loops, full, deg = winding_operation_snapped(
            [parse_points("0:0, 0:3, 3:3")], _pt(ref_str), w,
            WindingRule.POSITIVE, snap, True)
        assert (loops, full) == ([], False), ref_str
        assert _deg_latlng(deg) == ([(0.0, 0.0)], []), ref_str
    for ref_str, w in (("10:0", 1), ("1:1", 0)):
        loops, full = winding_operation_snapped(
            [parse_points("0:0, 3:3, 0:3")], _pt(ref_str), w,
            WindingRule.POSITIVE, snap)
        assert (loops, full) == ([], True), ref_str


def test_touching_triangles_odd_degenerate():
    # cc:202-216 second half: ODD keeps the shared diagonal as a
    # degenerate hole when include_degeneracies is set
    loops, full, deg = winding_operation(
        [parse_points("0:0, 0:8, 8:8"), parse_points("0:0, 8:8, 8:0")],
        _pt("2:2"), 1, WindingRule.ODD, True)
    _region_equal((loops, full), "0:0, 0:8, 8:8, 8:0", (-2, 10), (-2, 10))
    assert _deg_latlng(deg)[1] == [((0.0, 0.0), (8.0, 8.0))]


def test_touching_triangles_after_snapping():
    # cc:218-231: triangles that touch only after IntLatLng(0) snapping
    from s2geometry_spark.kernel.builder import IntLatLngSnapFunction
    from s2geometry_spark.kernel.winding import winding_operation_snapped

    snap = IntLatLngSnapFunction(0)
    tri = [parse_points("0.1:0.2, 0:7.8, 7.6:8.2"),
           parse_points("0.3:0.2, 8.1:7.8, 7.6:0.4")]
    got = winding_operation_snapped(
        tri, _pt("6:2"), 1, WindingRule.POSITIVE, snap)
    _region_equal(got, "0:0, 0:8, 8:8, 8:0", (-2, 10), (-2, 10))
    loops, full, deg = winding_operation_snapped(
        tri, _pt("2:6"), 1, WindingRule.ODD, snap, True)
    _region_equal((loops, full), "0:0, 0:8, 8:8, 8:0", (-2, 10), (-2, 10))
    assert _deg_latlng(deg)[1] == [((0.0, 0.0), (8.0, 8.0))]


def test_union_of_squares_tail():
    # cc:233-288: the >=4-squares threshold and the ODD checkerboard
    squares = [parse_points(s) for s in (
        "0:0, 0:4, 4:4, 4:0", "1:1, 1:5, 5:5, 5:1", "2:2, 2:6, 6:6, 6:2",
        "3:3, 3:7, 7:7, 7:3", "4:4, 4:8, 8:8, 8:4")]
    got = winding_operation(squares, _pt("0.5:0.5"), -2,
                            WindingRule.POSITIVE)
    _region_equal(got, "3:3, 3:4, 4:4, 4:3; 4:4, 4:5, 5:5, 5:4",
                  (-1, 9), (-1, 9), n=80)
    got = winding_operation(squares, _pt("0.5:0.5"), 1, WindingRule.ODD)
    _region_equal(
        got,
        "4:1, 4:0, 0:0, 0:4, 1:4, 1:1; 4:3, 4:2, 2:2, 2:4, 3:4, 3:3; "
        "1:4, 1:5, 2:5, 2:4; 5:4, 5:3, 4:3, 4:4; 5:2, 5:1, 4:1, 4:2; "
        "2:5, 2:6, 3:6, 3:5; 6:3, 6:2, 5:2, 5:3; 3:6, 3:7, 4:7, 4:6; "
        "3:4, 3:5, 4:5, 4:4; 7:4, 7:3, 6:3, 6:4; "
        "4:7, 4:8, 8:8, 8:4, 7:4, 7:7; 4:5, 4:6, 6:6, 6:4, 5:4, 5:5",
        (-1, 9), (-1, 9), n=80)


def test_symmetric_difference_degeneracies():
    # cc:290-297: duplicated geometry cancels mod 2; the point shells
    # unique to one side survive
    from s2geometry_spark.kernel.builder import IntLatLngSnapFunction
    from s2geometry_spark.kernel.winding import winding_operation_snapped

    g = [parse_points(s) for s in (
        "0:0, 0:3, 3:3, 3:0", "1:1", "2:2", "4:4",
        "0:0, 0:3, 3:3, 3:0", "1:1", "4:4", "5:5")]
    loops, full, deg = winding_operation_snapped(
        g, _pt("10:10"), 0, WindingRule.ODD,
        IntLatLngSnapFunction(1), True)
    assert (loops, full) == ([], False)
    assert _deg_latlng(deg) == ([(2.0, 2.0), (5.0, 5.0)], [])
