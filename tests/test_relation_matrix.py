"""The FULL s2polygon_test relation matrix (s2polygon_test.cc:697-779),
ported verbatim — including the shared-boundary and shared-vertex rows,
decided by the probe-based overlay relations."""

import pytest

from s2geometry_spark.kernel.contains import parse_polygon
from s2geometry_spark.kernel.relations import polygon_relations_probed

# Loop constants (s2polygon_test.cc:129-166), trailing ';' per constant.
kNear0 = "-1:0, 0:1, 1:0, 0:-1;"
kNear1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1;"
kNear2 = "-1:-2, -2:5, 5:-2;"
kNear3 = "-2:-2, -3:6, 6:-3;"
kNearHemi = "0:-90, -90:0, 0:90, 90:0;"
kFar0 = "0:179, 1:180, 0:-179, 2:-180;"
kFar1 = "0:179, -1:179, 1:180, -1:-179, 0:-179, 3:-178, 2:-180, 3:178;"
kFar2 = "3:-178, 3:178, -1:179, -1:-179;"
kFar3 = "-3:-178, 4:-177, 4:177, -3:178, -2:179;"
kFarHemi = "0:-90, 60:90, -60:90;"
kSouth0a = "-90:0, -89.99:0.01, -89.99:0;"
kSouth0b = "-90:0, -89.99:0.03, -89.99:0.02;"
kSouth0c = "-90:0, -89.99:0.05, -89.99:0.04;"
kSouth1 = "-90:0, -89.9:0.1, -89.9:-0.1;"
kSouth2 = "-90:0, -89.8:0.2, -89.8:-0.2;"
kSouthHemi = "0:-180, 0:60, 0:-60;"
kNearFar1 = (
    "-1:-9, -9:-9, -9:9, 9:9, 9:-9, 1:-9, "
    "1:-175, 9:-175, 9:175, -9:175, -9:-175, -1:-175;"
)
kNearFar2 = "-2:15, -2:170, -8:-175, 8:-175, 2:170, 2:15, 8:-4, -8:-4;"
kCross1 = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1;"
kCross1SideHole = "-1.5:0.5, -1.2:0.5, -1.2:-0.5, -1.5:-0.5;"
kCross2 = "1:-2, 1:-1, 1:1, 1:2, -1:2, -1:1, -1:-1, -1:-2;"
kCross2SideHole = "0.5:-1.5, 0.5:-1.2, -0.5:-1.2, -0.5:-1.5;"
kCrossCenterHole = "-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5;"
kOverlap1 = "0:1, 1:1, 2:1, 2:0, 1:0, 0:0;"
kOverlap1SideHole = "0.2:0.8, 0.8:0.8, 0.8:0.2, 0.2:0.2;"
kOverlap2 = "1:1, 2:1, 3:1, 3:0, 2:0, 1:0;"
kOverlap2SideHole = "2.2:0.8, 2.8:0.8, 2.8:0.2, 2.2:0.2;"
kOverlapCenterHole = "1.2:0.8, 1.8:0.8, 1.8:0.2, 1.2:0.2;"


def P(s):
    return parse_polygon(s, normalize=True)


# Polygon compositions (s2polygon_test.cc:346-398)
empty = P("empty")
full = P("full")
near_10 = P(kNear0 + kNear1)
near_30 = P(kNear3 + kNear0)
near_32 = P(kNear2 + kNear3)
near_3210 = P(kNear0 + kNear2 + kNear3 + kNear1)
near_H3210 = P(kNear0 + kNear2 + kNear3 + kNearHemi + kNear1)
far_10 = P(kFar0 + kFar1)
far_21 = P(kFar2 + kFar1)
far_321 = P(kFar2 + kFar3 + kFar1)
far_H20 = P(kFar2 + kFarHemi + kFar0)
far_H3210 = P(kFar2 + kFarHemi + kFar0 + kFar1 + kFar3)
south_0ab = P(kSouth0a + kSouth0b)
south_2 = P(kSouth2)
south_210b = P(kSouth2 + kSouth0b + kSouth1)
south_H21 = P(kSouth2 + kSouthHemi + kSouth1)
south_H20abc = P(kSouth2 + kSouth0b + kSouthHemi + kSouth0a + kSouth0c)
nf1_n10_f2_s10abc = P(
    kSouth0c + kFar2 + kNear1 + kNearFar1 + kNear0 + kSouth1 + kSouth0b + kSouth0a
)
nf2_n2_f210_s210ab = P(
    kFar2 + kSouth0a + kFar1 + kSouth1 + kFar0 + kSouth0b + kNearFar2 + kSouth2 + kNear2
)
f32_n0 = P(kFar2 + kNear0 + kFar3)
n32_s0b = P(kNear3 + kSouth0b + kNear2)
cross1 = P(kCross1)
cross1_side_hole = P(kCross1 + kCross1SideHole)
cross1_center_hole = P(kCross1 + kCrossCenterHole)
cross2 = P(kCross2)
cross2_side_hole = P(kCross2 + kCross2SideHole)
cross2_center_hole = P(kCross2 + kCrossCenterHole)
overlap1 = P(kOverlap1)
overlap1_side_hole = P(kOverlap1 + kOverlap1SideHole)
overlap1_center_hole = P(kOverlap1 + kOverlapCenterHole)
overlap2 = P(kOverlap2)
overlap2_side_hole = P(kOverlap2 + kOverlap2SideHole)
overlap2_center_hole = P(kOverlap2 + kOverlapCenterHole)

MATRIX = [
    ("near_10/empty", near_10, empty, True, False, False),
    ("near_10/near_10", near_10, near_10, True, True, True),
    ("full/near_10", full, near_10, True, False, True),
    ("near_10/near_30", near_10, near_30, False, True, True),
    ("near_10/near_32", near_10, near_32, False, False, False),
    ("near_10/near_3210", near_10, near_3210, False, True, True),
    ("near_10/near_H3210", near_10, near_H3210, False, False, False),
    ("near_30/near_32", near_30, near_32, True, False, True),
    ("near_30/near_3210", near_30, near_3210, True, False, True),
    ("near_30/near_H3210", near_30, near_H3210, False, False, True),
    ("near_32/near_3210", near_32, near_3210, False, True, True),
    ("near_32/near_H3210", near_32, near_H3210, False, False, False),
    ("near_3210/near_H3210", near_3210, near_H3210, False, False, False),
    ("far_10/far_21", far_10, far_21, False, False, False),
    ("far_10/far_321", far_10, far_321, False, True, True),
    ("far_10/far_H20", far_10, far_H20, False, False, False),
    ("far_10/far_H3210", far_10, far_H3210, False, False, False),
    ("far_21/far_321", far_21, far_321, False, False, False),
    ("far_21/far_H20", far_21, far_H20, False, False, False),
    ("far_21/far_H3210", far_21, far_H3210, False, True, True),
    ("far_321/far_H20", far_321, far_H20, False, False, True),
    ("far_321/far_H3210", far_321, far_H3210, False, False, True),
    ("far_H20/far_H3210", far_H20, far_H3210, False, False, True),
    ("south_0ab/south_2", south_0ab, south_2, False, True, True),
    ("south_0ab/south_210b", south_0ab, south_210b, False, False, True),
    ("south_0ab/south_H21", south_0ab, south_H21, False, True, True),
    ("south_0ab/south_H20abc", south_0ab, south_H20abc, False, True, True),
    ("south_2/south_210b", south_2, south_210b, True, False, True),
    ("south_2/south_H21", south_2, south_H21, False, False, True),
    ("south_2/south_H20abc", south_2, south_H20abc, False, False, True),
    ("south_210b/south_H21", south_210b, south_H21, False, False, True),
    ("south_210b/south_H20abc", south_210b, south_H20abc, False, False, True),
    ("south_H21/south_H20abc", south_H21, south_H20abc, True, False, True),
    ("nf1/nf2", nf1_n10_f2_s10abc, nf2_n2_f210_s210ab, False, False, True),
    ("nf1/near_32", nf1_n10_f2_s10abc, near_32, True, False, True),
    ("nf1/far_21", nf1_n10_f2_s10abc, far_21, False, False, False),
    ("nf1/south_0ab", nf1_n10_f2_s10abc, south_0ab, False, False, False),
    ("nf1/f32_n0", nf1_n10_f2_s10abc, f32_n0, True, False, True),
    ("nf2/near_10", nf2_n2_f210_s210ab, near_10, False, False, False),
    ("nf2/far_10", nf2_n2_f210_s210ab, far_10, True, False, True),
    ("nf2/south_210b", nf2_n2_f210_s210ab, south_210b, True, False, True),
    ("nf2/south_0ab", nf2_n2_f210_s210ab, south_0ab, True, False, True),
    ("nf2/n32_s0b", nf2_n2_f210_s210ab, n32_s0b, True, False, True),
    ("cross1/cross2", cross1, cross2, False, False, True),
    ("cross1sh/cross2", cross1_side_hole, cross2, False, False, True),
    ("cross1ch/cross2", cross1_center_hole, cross2, False, False, True),
    ("cross1/cross2sh", cross1, cross2_side_hole, False, False, True),
    ("cross1/cross2ch", cross1, cross2_center_hole, False, False, True),
    ("cross1sh/cross2sh", cross1_side_hole, cross2_side_hole, False, False, True),
    ("cross1ch/cross2sh", cross1_center_hole, cross2_side_hole, False, False, True),
    ("cross1sh/cross2ch", cross1_side_hole, cross2_center_hole, False, False, True),
    ("cross1ch/cross2ch", cross1_center_hole, cross2_center_hole, False, False, True),
    ("overlap1/overlap2", overlap1, overlap2, False, False, True),
    ("overlap1sh/overlap2", overlap1_side_hole, overlap2, False, False, True),
    ("overlap1ch/overlap2", overlap1_center_hole, overlap2, False, False, True),
    ("overlap1/overlap2sh", overlap1, overlap2_side_hole, False, False, True),
    ("overlap1/overlap2ch", overlap1, overlap2_center_hole, False, False, True),
    ("overlap1sh/overlap2sh", overlap1_side_hole, overlap2_side_hole, False, False, True),
    ("overlap1ch/overlap2sh", overlap1_center_hole, overlap2_side_hole, False, False, True),
    ("overlap1sh/overlap2ch", overlap1_side_hole, overlap2_center_hole, False, False, True),
    ("overlap1ch/overlap2ch", overlap1_center_hole, overlap2_center_hole, False, False, True),
]


@pytest.mark.parametrize("name,a,b,c_ab,c_ba,inter", MATRIX, ids=[m[0] for m in MATRIX])
def test_relation_matrix_row(name, a, b, c_ab, c_ba, inter):
    assert polygon_relations_probed(a, b) == (c_ab, c_ba, inter), name


def test_matrix_symmetry():
    for name, a, b, c_ab, c_ba, inter in MATRIX[:20]:
        fwd = polygon_relations_probed(a, b)
        rev = polygon_relations_probed(b, a)
        assert (fwd[0], fwd[1], fwd[2]) == (rev[1], rev[0], rev[2]), name
