"""BuildPolygonBoundaries — fixtures ported from
s2shapeutil_build_polygon_boundaries_test.cc."""

from s2geometry_spark.kernel.boundaries import build_polygon_boundaries
from s2geometry_spark.kernel.contains import parse_loop


def _faces(components_txt):
    comps = [[parse_loop(s) for s in comp] for comp in components_txt]
    return build_polygon_boundaries(comps)


def test_no_components():
    assert build_polygon_boundaries([]) == []


def test_one_loop():
    faces = _faces([["0:0, 1:0, 0:1", "0:0, 0:1, 1:0"]])
    assert len(faces) == 2


def test_two_loops_same_component():
    faces = _faces([["0:0, 1:0, 0:1", "0:0, 0:1, 1:0", "1:0, 0:1, 1:1"]])
    assert len(faces) == 3


def test_two_nested_loops():
    faces = _faces(
        [
            ["0:0, 3:0, 0:3", "0:0, 0:3, 3:0"],
            ["1:1, 2:0, 0:2", "1:1, 0:2, 2:0"],
        ]
    )
    assert len(faces) == 3
    # b0 nests inside a1: the first indexed face is [b0, a1]
    assert faces[0] == [(1, 0), (0, 1)]


def test_two_loops_different_components():
    faces = _faces(
        [
            ["0:0, 1:0, 0:1", "0:0, 0:1, 1:0"],
            ["0:2, 1:2, 0:3", "0:2, 0:3, 1:2"],
        ]
    )
    assert len(faces) == 3
    assert faces[2] == [(0, 0), (1, 0)]  # the two outer faces together


def test_one_degenerate_loop():
    assert len(_faces([["0:0, 1:0, 0:0"]])) == 1


def test_two_degenerate_loops():
    faces = _faces([["0:0, 1:0, 0:0"], ["2:0, 3:0, 2:0"]])
    assert len(faces) == 1
    assert len(faces[0]) == 2


def test_complex_1():
    # s2shapeutil_build_polygon_boundaries_test.cc ComplexTest1 — loop
    # keys are (component_idx, loop_idx); expectations transcribed from
    # the reference's expected_faces.
    components = [
        [  # component "a": 4 adjacent squares forming a larger square
            "0:0, 25:0, 50:0, 50:25, 50:50, 25:50, 0:50, 0:50",  # a0
            "0:0, 0:25, 25:25, 25:0",  # a1
            "0:25, 0:50, 25:50, 25:25",  # a2
            "25:0, 25:25, 50:25, 50:0",  # a3
            "25:25, 25:50, 50:50, 50:25",  # a4
        ],
        ["0:-10, 10:-10"],  # b0 — degenerate, left of "a"
        [  # a1_a
            "5:5, 20:5, 20:10, 5:10",  # a1_a0
            "5:5, 5:10, 10:10, 10:5",  # a1_a1
            "10:5, 10:10, 15:10, 15:5",  # a1_a2
            "15:5, 15:10, 20:10, 20:5",  # a1_a3
        ],
        ["5:15, 20:15, 20:20, 5:20", "5:15, 5:20, 20:20, 20:15"],  # a1_b
        ["2:5, 2:10, 2:5"],  # a1_c0
        ["11:6, 14:6, 14:9, 11:9", "11:6, 11:9, 14:9, 14:6"],  # a1_a2_a
        ["16:6, 19:9, 16:6"],  # a1_a3_a0
        ["30:5, 45:5, 45:20, 30:20", "30:5, 30:20, 45:20, 45:5"],  # a3_a
        ["30:30, 40:30, 30:30"],  # a4_a0
        ["30:35, 40:35, 30:35"],  # a4_b0
        ["30:40, 40:40, 30:40"],  # a4_c0
        ["30:45, 40:45, 30:45"],  # a4_d0
    ]
    names = {
        (0, 0): "a0", (0, 1): "a1", (0, 2): "a2", (0, 3): "a3", (0, 4): "a4",
        (1, 0): "b0",
        (2, 0): "a1_a0", (2, 1): "a1_a1", (2, 2): "a1_a2", (2, 3): "a1_a3",
        (3, 0): "a1_b0", (3, 1): "a1_b1",
        (4, 0): "a1_c0",
        (5, 0): "a1_a2_a0", (5, 1): "a1_a2_a1",
        (6, 0): "a1_a3_a0",
        (7, 0): "a3_a0", (7, 1): "a3_a1",
        (8, 0): "a4_a0",
        (9, 0): "a4_b0",
        (10, 0): "a4_c0",
        (11, 0): "a4_d0",
    }
    expected = [
        {"a0", "b0"},
        {"a1", "a1_a0", "a1_b0", "a1_c0"},
        {"a1_a1"},
        {"a1_a2", "a1_a2_a0"},
        {"a1_a2_a1"},
        {"a1_a3", "a1_a3_a0"},
        {"a1_b1"},
        {"a2"},
        {"a3", "a3_a0"},
        {"a3_a1"},
        {"a4", "a4_a0", "a4_b0", "a4_c0", "a4_d0"},
    ]
    faces = _faces(components)
    got = sorted(sorted(names[k] for k in f) for f in faces)
    assert got == sorted(sorted(f) for f in expected)
