"""Completeness ops: advance_wrap, center detection, union expand,
hausdorff, chord successor/predecessor."""

import math

import numpy as np

from s2geometry_spark.kernel import cellid as C
from s2geometry_spark.kernel import cellunion as CU
from s2geometry_spark.kernel import coords
from s2geometry_spark.kernel import distance as D
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.contains import parse_points

RNG = np.random.default_rng(42)


def test_advance_wrap_roundtrip():
    ids = C.parent(
        C.from_latlng(RNG.uniform(-80, 80, 200), RNG.uniform(-180, 180, 200)),
        RNG.integers(0, 31, 200),
    )
    steps = RNG.integers(-1000, 1000, 200)
    fwd = C.advance_wrap(ids, steps)
    back = C.advance_wrap(fwd, -steps)
    assert (back == ids).all()
    assert C.is_valid(fwd).all()
    # wrapping all the way around at level 0 is the identity
    f3 = C.from_face([3])
    assert C.advance_wrap(f3, np.array([6]))[0] == f3[0]
    assert C.advance_wrap(f3, np.array([4]))[0] == C.from_face([1])[0]


def test_xyz_to_face_siti_center_detection():
    # centers of cells at various levels are detected with exact level
    ids = C.parent(
        C.from_latlng(RNG.uniform(-80, 80, 100), RNG.uniform(-180, 180, 100)),
        RNG.integers(0, 31, 100),
    )
    x, y, z = C.to_point(ids)
    f, si, ti, lvl = coords.xyz_to_face_siti(x, y, z)
    assert (lvl == C.level(ids)).all()
    # perturbed points are not centers
    f2, _, _, lvl2 = coords.xyz_to_face_siti(x + 1e-12, y, z)
    assert (lvl2 == -1).all()


def test_union_expand_level():
    base = [CID.from_token("6b12ae36313d").parent(18)]
    grown = CU.expand_level(base, 18)
    # original cell plus its 8-ring, normalized
    assert CU.contains_id(grown, base[0])
    assert len(grown) >= 3
    # growing by radius: wider radius → not smaller coverage
    r1 = CU.expand_radius(base, math.radians(0.1))
    r2 = CU.expand_radius(base, math.radians(1.0))
    assert CU.leaf_cells_covered(r2) >= CU.leaf_cells_covered(r1)
    assert CU.leaf_cells_covered(r1) > CU.leaf_cells_covered(base)


def test_directed_hausdorff():
    a = parse_points("0:0, 0:10")
    bc = parse_points("1:0, 1:10")
    h2 = D.directed_hausdorff2(a, bc[:-1], bc[1:])
    # every vertex of A is ~1 degree from line B
    assert abs(float(D.chord2_to_angle(h2)) - math.radians(1)) < 1e-6
    # identical geometry → 0
    assert D.directed_hausdorff2(a, a[:-1], a[1:]) == 0.0


def test_chord_successor_predecessor():
    x = 0.5
    assert D.chord2_successor(x) > x
    assert D.chord2_predecessor(x) < x
    assert D.chord2_predecessor(D.chord2_successor(x)) == x
    assert D.chord2_successor(4.0) == 4.0
    assert D.chord2_predecessor(0.0) == -1.0
    assert D.chord2_successor(-1.0) == 0.0
