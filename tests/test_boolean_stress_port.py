"""Port of the s2boolean_operation_test.cc robustness tranche:
GetCrossedVertexIndexBug1-6 (historical crash/wrong-result unions on
near-degenerate coordinates) and the FullAndEmptyResults matrix
(empty/full semantics under a large snap radius)."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.booleans import (
    _INTERSECTION_ERROR,
    boolean_op_snapped,
)
from s2geometry_spark.kernel.builder import IdentitySnapFunction
from s2geometry_spark.kernel.contains import Loop, Polygon, parse_points
from s2geometry_spark.kernel.measures import even_odd_area


def _poly(loops):
    return Polygon([Loop(np.asarray(l, dtype=np.float64)) for l in loops])


def _union_completes(a_loops, b_loops, snap_radius):
    """ComputeTestUnion (s2boolean_operation_test.cc:1796-1811): the
    union builds without error and is non-empty."""
    result = boolean_op_snapped(
        _poly(a_loops), _poly(b_loops), "union",
        IdentitySnapFunction(snap_radius))
    assert result.loops or getattr(result, "is_full", lambda: False)()
    return result


MERGE_RADIUS = 2 * _INTERSECTION_ERROR


def test_get_crossed_vertex_index_bug1():
    """s2boolean_operation_test.cc:1813-1840: crossing edge chains snap
    to a different permutation of the same vertices."""
    a_loops = [[
        (-0.38306437985388492, -0.74921955334206214, 0.54030708099846292),
        (-0.3830643798552798, -0.74921955334134249, 0.5403070809984718),
        (-0.38306437985529124, -0.74921955334136414, 0.54030708099843361),
        (-0.38306437985389635, -0.74921955334208379, 0.54030708099842473),
    ]]
    b_loops = [[
        (-0.38306437985390962, -0.74921955334210588, 0.54030708099838465),
        (-0.38306437985527797, -0.74921955334134205, 0.54030708099847369),
        (-0.38306437985527941, -0.74921955334134405, 0.54030708099847014),
        (-0.38306437985391095, -0.74921955334210777, 0.54030708099838098),
    ]]
    _union_completes(a_loops, b_loops, MERGE_RADIUS)


def test_get_crossed_vertex_index_bug2():
    """s2boolean_operation_test.cc:1842-1889: crossing vertices not
    ordered correctly along the crossed edge."""
    a_loops = [[
        (-0.3837392878495085, -0.7477800800281974, 0.5418201831546835),
        (-0.38373928785696076, -0.7477800800212292, 0.54182018315902258),
        (-0.38373928785701278, -0.74778008002124685, 0.5418201831589613),
        (-0.38373928785703426, -0.7477800800212544, 0.54182018315893576),
        (-0.38373947205489456, -0.74778014227795497, 0.5418199667802881),
        (-0.38373947204434411, -0.74778014228781997, 0.54181996677414512),
        (-0.38373947205872994, -0.74778014228185352, 0.54181996677219124),
        (-0.38373947218468357, -0.74778014288930306, 0.54181996584462788),
        (-0.3837396702525171, -0.74778021044361542, 0.54181973233114322),
        (-0.38373967023137123, -0.74778021046333043, 0.54181973231891067),
        (-0.38373947216030285, -0.74778014290791484, 0.54181996583620895),
        (-0.38373947217087578, -0.74778014289805739, 0.54181996584232528),
        (-0.38373947215649007, -0.74778014290402395, 0.54181996584427927),
        (-0.3837394720305386, -0.74778014229658485, 0.5418199667718262),
        (-0.38373928783585998, -0.74778008004095942, 0.54182018314673686),
        (-0.38373928784641037, -0.7477800800310942, 0.54182018315287972),
        (-0.38373928783578648, -0.74778008004093421, 0.54182018314682368),
        (-0.383739287835765, -0.74778008004092666, 0.54182018314684921),
    ]]
    b_loops = [[
        (-0.38373923813692823, -0.7477800632164362, 0.54182024156551456),
        (-0.3837392878569364, -0.74778008002122087, 0.54182018315905123),
        (-0.38373928784640354, -0.74778008003106944, 0.54182018315291858),
        (-0.38373928784638789, -0.74778008003108642, 0.54182018315290648),
        (-0.38373928784638023, -0.74778008003109453, 0.54182018315290048),
        (-0.38373928783692102, -0.74778008004124585, 0.54182018314559),
        (-0.38373928783691913, -0.74778008004124541, 0.54182018314559188),
        (-0.38373928784636568, -0.74778008003110774, 0.54182018315289271),
        (-0.38373928784637329, -0.74778008003109953, 0.54182018315289848),
        (-0.38373928783583561, -0.74778008004095109, 0.5418201831467655),
        (-0.38373923811582744, -0.74778006323616641, 0.54182024155322883),
        (-0.38373857650312843, -0.74777983961840766, 0.54182101875399913),
        (-0.38373857652422921, -0.74777983959867744, 0.54182101876628486),
    ]]
    _union_completes(a_loops, b_loops, MERGE_RADIUS)


def test_get_crossed_vertex_index_bug3():
    """s2boolean_operation_test.cc:1891-1916: RobustCrossProd underflow
    on nearly-antipodal normals (tiny z components ~1e-72)."""
    a_loops = [[
        (1, 0, 2.4678234835261742e-72),
        (0.99984769515639127, 0.017452406437283512, 1.8530922845942552e-27),
        (0.99740259703611311, 0.069881849826437858, 0.017452406437283512),
    ]]
    b_loops = [[
        (0.99999999999999989, 2.4674476220564615e-72, 2.4678234835261742e-72),
        (0.99999999999999989, 2.8837981406657438e-169,
         2.4678234835261742e-72),
        (1, 2.8837981406657432e-169, 2.4678234835261742e-72),
    ]]
    _union_completes(a_loops, b_loops, 0.0)


def test_get_crossed_vertex_index_bug4():
    """s2boolean_operation_test.cc:1918-1954: both snapped subchains
    must choose the same crossing vertex."""
    p1 = parse_points("51.51317:-0.1306")[0]
    p2 = parse_points("51.52:-0.12")[0]
    p3 = parse_points("51.52:-0.14")[0]
    a_loops = [[
        (0.62233331065911901, -0.0014161759526823048, 0.78275107466533156),
        (0.6223328557578689, -0.0014164217071954736, 0.78275143589379825),
        tuple(p1),
    ]]
    b_loops = [[
        (0.62233331033809591, -0.001416176126110953, 0.78275107492024998),
        (0.62233331033809591, -0.0014161761261109063, 0.78275107492025009),
        tuple(p2),
        tuple(p3),
    ]]
    _union_completes(a_loops, b_loops, 0.0)


def test_get_crossed_vertex_index_bug5():
    """s2boolean_operation_test.cc:1956-2018: crossing-vertex choice
    requires the clockwise-loop special case."""
    a_loops = [[
        (0.99984769515639127, 0, 0.017452406437283512),
        (0.99923861495548261, 0.017441774902830158, 0.034899496702500969),
        (0.99847743863945992, 0.052327985223313139, 0.017452406437283512),
        (0.99802119662406841, 0.034851668155187324, 0.052335956242943835),
    ]]
    b_loops = [
        [
            (0.99802119662406841, 0.034851668155187324,
             0.052335956242943835),
            (0.99619692339885657, 0.052208468483931986,
             0.069756473744125302),
            (0.99802098681615425, 0.034839714972148959,
             0.052347914334467859),
            (0.99741208276778681, 0.017411821260589495,
             0.069756473744125302),
            (0.99741219210106513, 0.017411340538768819,
             0.069755030419252628),
            (0.99741211642315963, 0.017409893252357169,
             0.069756473744125302),
            (0.99984769515639116, 4.9500424645560228e-16,
             0.017452406437284993),
            (0.99984769515639127, 3.7368529835165677e-16,
             0.017452406437284632),
            (0.99984769515639116, 3.3065924905014365e-16,
             0.017452406437284504),
            (0.99984769515639127, 9.9060035932242025e-16,
             0.017452406437284504),
            (0.99969541350954794, 0.017449748351250485,
             0.017452406437283512),
        ],
        [
            (0.99984769515639116, 3.3065924905014365e-16,
             0.017452406437284504),
            (0.99984769515639116, 3.3006856770496304e-16,
             0.017452406437284504),
            (0.99984769515639127, 0, 0.017452406437284504),
            (0.99984769515639127, 0, 0.017452406437283512),
        ],
    ]
    _union_completes(a_loops, b_loops, 0.0)


def test_get_crossed_vertex_index_bug6():
    """s2boolean_operation_test.cc:2020-2082: B subchain containing an
    interior vertex of the A edge."""
    a_loops = [
        [
            (0.99870488823558456, 0.026138065586168355,
             0.043650289137205818),
            (0.99876259434149239, 0.030513215246694664, 0.0392711578586665),
            (0.99984769515639127, 0.017452406437283512, 0),
            (0.998782023517925, 0.034862286684437908, 0.034915476003791211),
            (0.99878202512991221, 0.034878236872062651,
             0.034899496702500969),
            (0.9975640502598242, 0.069756473744125302, 0),
            (0.99877979583714305, 0.034883478425067296,
             0.034958008531414335),
            (0.99619692339885657, 0.052208468483931986,
             0.069756473744125302),
            (0.99847581234813876, 0.017465633646566288,
             0.052354596713645812),
            (0.9975640502598242, 0, 0.069756473744125302),
            (0.99847674250410212, 0.017444393356200013,
             0.052343937746706169),
            (0.99847743863945992, 0.017428488520812163,
             0.052335956242943835),
            (0.99984769515639127, 0, 0.017452406437283512),
        ],
        [
            (0.99619692339885657, 0.052208468483931986,
             0.069756473744125302),
            (0.99802119661969568, 0.034851668280404598,
             0.052335956242943835),
            (0.9987605225894034, 0.030527121154938986,
             0.039313018084772409),
            (0.99870321796526884, 0.026161932439896601,
             0.043674199670139441),
        ],
        [
            (0.99619692339885657, 0.052208468483931986,
             0.069756473744125302),
            (0.99619692339885657, 0.06966087492121549,
             0.052335956242943835),
            (0.99513403437078507, 0.069586550480032719,
             0.069756473744125302),
        ],
    ]
    b_loops = [
        [
            (0.99802200429988497, 0.034828499898458924,
             0.052335977377554299),
            (0.99862953475457383, 0, 0.052335956242943835),
            (0.99923793061512223, 0.017455729388178846,
             0.034912111530741322),
            (0.99923859085845868, 0.017443155365764275,
             0.034899496702500969),
            (0.99923793076147094, 0.017455737780810811,
             0.034912103145779166),
            (0.9992865072388355, 0.020934110218524152, 0.0314362764933699),
            (1, 0, 0),
            (0.99929987808789411, 0.022418034384064717,
             0.029953053064335624),
            (0.99931406232431441, 0.02616995393092059,
             0.026201876881811362),
            (0.99984769515639127, 0.017452406437283512, 0),
            (0.99930573320200933, 0.029072747464899757,
             0.023298646837028814),
            (0.99862953475457383, 0.052335956242943835,
             1.700986599320836e-73),
            (0.99838518277004218, 0.038347188759395717,
             0.041910857059723181),
            (0.99619692339885668, 0.052208468483931979,
             0.069756473744125289),
        ],
        [
            (0.99802119662406841, 0.052304074592470849,
             0.034899496702500969),
            (0.99847743834686298, 0.052327990806397578,
             0.017452406437283512),
            (0.99619645281505653, 0.052208443821680058,
             0.069763212314351342),
            (0.99619692339885657, 0.052208468483932, 0.069756473744125316),
            (0.99619692339885657, 0.052208468483931986,
             0.069756473744125302),
            (0.99619692339885679, 0.052208468483931993,
             0.069756473744125316),
            (0.99619692339885679, 0.052208468483931986,
             0.069756473744125302),
            (0.99619692339885668, 0.052208468483931979,
             0.069756473744125289),
        ],
    ]
    _union_completes(a_loops, b_loops, 0.0)


# ---------------------------------------------------------------------------
# FullAndEmptyResults (s2boolean_operation_test.cc:2102-2273): empty/full
# semantics under IdentitySnapFunction(1.1 degrees).
# ---------------------------------------------------------------------------

K_EMPTY = ""
K_FULL = "full"
K_SHELL1 = "10:0, 10:10, 20:10"
K_HOLE1 = "10:0, 20:10, 10:10"
K_SHELL1_MINUS = "11:2, 11:9, 18:9"
K_SHELL1_PLUS = "9:-2, 9:11, 22:11"
K_SHELL2 = "10:20, 10:30, 20:30"
K_HOLE2 = "10:20, 20:30, 10:30"
K_NORTH_HEMI = "0:0, 0:120, 0:-120"
K_SOUTH_HEMI = "0:0, 0:-120, 0:120"
K_SOUTH_HEMI_PLUS = "0.5:0, 0.5:-120, 0.5:120"
K6_SHELL1 = "0:-45, 45:0, 45:90, 0:135, -45:180, -45:-90"
K6_HOLE1 = "0:-45, -45:-90, -45:180, 0:135, 45:90, 45:0"
K6_SHELL1_MINUS = "-1:-45, 44:0, 44:90, -1:135, -46:180, -46:-90"
K6_SHELL1_PLUS = "1:-45, 46:0, 46:90, 1:135, -44:180, -44:-90"
K_ALMOST_EMPTY1 = "2:0, 2:10, 3:0"
K_ALMOST_FULL1 = "2:0, 3:0, 2:10"
K_ALMOST_EMPTY2 = "4:0, 4:10, 5:0"
K_ALMOST_FULL2 = "4:0, 5:0, 4:10"
K6_ALMOST_EMPTY1 = K6_SHELL1_MINUS + "; " + K6_HOLE1


def _expect_polygon(op, a_str, b_str, expected):
    """ExpectPolygon (s2boolean_operation_test.cc:2085-2100): 1.1-degree
    snap, degenerate boundaries discarded, expect "", "full", or
    geometry."""
    from s2geometry_spark.kernel.contains import parse_lax_polygon

    a = parse_lax_polygon(a_str)
    b = parse_lax_polygon(b_str)
    result = boolean_op_snapped(a, b, op,
                                IdentitySnapFunction(math.radians(1.1)))
    if expected == K_EMPTY:
        assert result.is_empty, (op, a_str, b_str, len(result.loops))
    elif expected == K_FULL:
        assert result.is_full, (op, a_str, b_str, len(result.loops))
    else:
        assert not result.is_empty and not result.is_full


FULL_EMPTY_CASES = [
    # ---- empty UNION
    ("union", K_EMPTY, K_EMPTY, K_EMPTY),
    ("union", K_ALMOST_EMPTY1, K_ALMOST_EMPTY2, K_EMPTY),
    # "k6FaceShell1Minus; k6FaceHole1" — two overlapping near-great-
    # circle seam loops whose lax interior is the thin band between
    # them; parse_lax_polygon's GetReferencePoint vote supplies the
    # global complement bit the plain XOR reading misses, making all
    # 49 of 49 reference rows portable.
    ("union", K6_ALMOST_EMPTY1, K6_ALMOST_EMPTY1, K_EMPTY),
    # ---- full UNION
    ("union", K_EMPTY, K_FULL, K_FULL),
    ("union", K_FULL, K_FULL, K_FULL),
    ("union", K_FULL, K_SHELL1, K_FULL),
    ("union", K_HOLE1, K_HOLE2, K_FULL),
    ("union", K_HOLE1, K_SHELL1, K_FULL),
    ("union", K_HOLE1, K_SHELL1_MINUS, K_FULL),
    ("union", K6_HOLE1, K6_SHELL1_MINUS, K_FULL),
    # ---- empty INTERSECTION
    ("intersection", K_EMPTY, K_EMPTY, K_EMPTY),
    ("intersection", K_EMPTY, K_FULL, K_EMPTY),
    ("intersection", K_FULL, K_EMPTY, K_EMPTY),
    ("intersection", K_EMPTY, K_HOLE1, K_EMPTY),
    ("intersection", K_SHELL1, K_SHELL2, K_EMPTY),
    ("intersection", K_SHELL1, K_HOLE1, K_EMPTY),
    ("intersection", K6_SHELL1, K6_HOLE1, K_EMPTY),
    ("intersection", K_SHELL1_PLUS, K_HOLE1, K_EMPTY),
    ("intersection", K6_SHELL1_PLUS, K6_HOLE1, K_EMPTY),
    # ---- full INTERSECTION
    ("intersection", K_FULL, K_FULL, K_FULL),
    ("intersection", K_ALMOST_FULL1, K_ALMOST_FULL2, K_FULL),
    # ---- empty DIFFERENCE
    ("difference", K_EMPTY, K_EMPTY, K_EMPTY),
    ("difference", K_EMPTY, K_FULL, K_EMPTY),
    ("difference", K_FULL, K_FULL, K_EMPTY),
    ("difference", K_EMPTY, K_SHELL1, K_EMPTY),
    ("difference", K_SHELL1, K_FULL, K_EMPTY),
    ("difference", K_SHELL1, K_SHELL1, K_EMPTY),
    ("difference", K_SHELL1, K_HOLE2, K_EMPTY),
    ("difference", K6_SHELL1, K6_SHELL1_PLUS, K_EMPTY),
    ("difference", K_SHELL1_PLUS, K_SHELL1, K_EMPTY),
    ("difference", K6_SHELL1_PLUS, K6_SHELL1, K_EMPTY),
    # ---- full DIFFERENCE
    ("difference", K_FULL, K_EMPTY, K_FULL),
    ("difference", K_ALMOST_FULL1, K_ALMOST_EMPTY2, K_FULL),
    # ---- empty SYMMETRIC_DIFFERENCE
    ("symmetric_difference", K_EMPTY, K_EMPTY, K_EMPTY),
    ("symmetric_difference", K_FULL, K_FULL, K_EMPTY),
    ("symmetric_difference", K_SHELL1, K_SHELL1, K_EMPTY),
    ("symmetric_difference", K_NORTH_HEMI, K_NORTH_HEMI, K_EMPTY),
    ("symmetric_difference", K6_SHELL1, K6_SHELL1_PLUS, K_EMPTY),
    # ---- full SYMMETRIC_DIFFERENCE
    ("symmetric_difference", K_FULL, K_EMPTY, K_FULL),
    ("symmetric_difference", K_EMPTY, K_FULL, K_FULL),
    ("symmetric_difference", K_NORTH_HEMI, K_SOUTH_HEMI, K_FULL),
    ("symmetric_difference", K_NORTH_HEMI, K_SOUTH_HEMI_PLUS, K_FULL),
    ("symmetric_difference", K6_SHELL1, K6_HOLE1, K_FULL),
]


@pytest.mark.parametrize("op,a,b,expected", FULL_EMPTY_CASES)
def test_full_and_empty_results(op, a, b, expected):
    _expect_polygon(op, a, b, expected)


def test_parse_lax_polygon_identity_on_nested_operands():
    """The GetReferencePoint complement vote only fires on seam
    arrangements; for properly nested loop sets parse_lax_polygon must
    be parse_polygon verbatim (same loop count, same containment)."""
    from s2geometry_spark.kernel.contains import parse_lax_polygon, parse_polygon
    from s2geometry_spark.kernel.coords import latlng_to_xyz
    import numpy as np

    # same-orientation nesting (the engine's XOR convention): identity
    for s in (K_SHELL1, K6_SHELL1, K_HOLE1,
              "0:0, 0:10, 10:10, 10:0; 2:2, 2:8, 8:8, 8:2"):
        a, b = parse_lax_polygon(s), parse_polygon(s)
        assert len(a.loops) == len(b.loops), s
    # CW-wound hole (interior-on-left = annulus): the vote repairs the
    # XOR reading's global complement into true lax semantics
    lax = parse_lax_polygon("0:0, 0:10, 10:10, 10:0; 2:2, 8:2, 8:8, 2:8")
    x, y, z = latlng_to_xyz(np.array([1.0, 5.0, 37.0]), np.array([1.0, 5.0, -42.0]))
    got = lax.contains(np.stack([x, y, z], -1))
    assert got.tolist() == [True, False, False]  # annulus in; hole+far out
    lax = parse_lax_polygon(K6_ALMOST_EMPTY1)
    x, y, z = latlng_to_xyz(np.array([-0.5, 90.0]), np.array([-45.0, 0.0]))
    got = lax.contains(np.stack([x, y, z], -1))
    assert got.tolist() == [True, False]  # band inside, pole outside


def test_polygon_edges_degenerate_after_snapping():
    """s2boolean_operation_test.cc:1034-1053
    PolygonEdgesDegenerateAfterSnapping: two narrow rectangles forming
    a plus sign, snapped to E(0) — output edges that become degenerate
    are STILL emitted (loops contracting to a point become degenerate
    rings / point shells).  Compared as directed-edge SETS because the
    reference harness's DISCARD_EXCESS likewise ignores degenerate-edge
    multiplicity."""
    from s2geometry_spark.kernel.booleans import (
        difference,
        intersection,
        snap_result_keep_degeneracies,
        symmetric_difference,
        union,
    )
    from s2geometry_spark.kernel.builder import IntLatLngSnapFunction
    from s2geometry_spark.kernel.contains import parse_polygon
    from s2geometry_spark.kernel.coords import xyz_to_latlng

    def key(p):
        return tuple(round(float(x), 6) for x in xyz_to_latlng(*p))

    def edge_set(rings):
        s = set()
        for r in rings:
            n = len(r)
            for i in range(n):
                u, w = key(r[i]), key(r[(i + 1) % n])
                if u != w:
                    s.add((u, w))
        return s

    def ring_edges(*lls):
        s = set()
        n = len(lls)
        for i in range(n):
            s.add((lls[i], lls[(i + 1) % n]))
        return {e for e in s if e[0] != e[1]}

    a = parse_polygon("0:-1, 0:1, 0.1:1, 0.1:-1")
    b = parse_polygon("-1:0.1, 1:0.1, 1:0, -1:0")
    snap = IntLatLngSnapFunction(0)

    vert = ring_edges((0.0, -1.0), (0.0, 0.0), (0.0, 1.0), (0.0, 0.0))
    horiz = ring_edges((-1.0, 0.0), (0.0, 0.0), (1.0, 0.0), (0.0, 0.0))

    rings, pts = snap_result_keep_degeneracies(union(a, b), snap)
    assert edge_set(rings) == vert | horiz and not pts

    rings, pts = snap_result_keep_degeneracies(intersection(a, b), snap)
    assert not edge_set(rings) and [key(p) for p in pts] == [(0.0, 0.0)]

    rings, pts = snap_result_keep_degeneracies(difference(a, b), snap)
    assert edge_set(rings) == vert and not pts

    rings, pts = snap_result_keep_degeneracies(
        symmetric_difference(a, b), snap)
    assert edge_set(rings) == vert | horiz and not pts
