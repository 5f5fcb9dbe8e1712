"""Port of r2rect_test.cc and s2r2rect_test.cc: R2Rect interval algebra
and the face-0 S2R2Rect region (bounds, point/cell containment)."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel import coords
from s2geometry_spark.kernel.cell import Cell, face_xyz_to_uv
from s2geometry_spark.kernel.cid import CID, POS_BITS
from s2geometry_spark.kernel.intervals import R1Interval
from s2geometry_spark.kernel.predicates import sign
from s2geometry_spark.kernel.r2rect import R2Rect, S2R2Rect
from s2geometry_spark.kernel.region import Cap, LatLng, LatLngRect


def _from_face_pos_level(face: int, pos: int, level: int) -> CID:
    """S2CellId::FromFacePosLevel (s2cell_id.h:120-126)."""
    return CID((face << POS_BITS) + (pos | 1)).parent(level)


# --------------------------------------------------------------------------
# r2rect_test.cc
# --------------------------------------------------------------------------


def _check_interval_ops(x, y, expected, expected_union, expected_intersection,
                        cls):
    """TestIntervalOps (r2rect_test.cc:33-61 / s2r2rect_test.cc:49-74)."""
    assert (expected[0] == "T") == x.contains(y)
    assert (expected[1] == "T") == x.interior_contains(y)
    assert (expected[2] == "T") == x.intersects(y)
    assert (expected[3] == "T") == x.interior_intersects(y)

    assert (x.union(y) == x) == x.contains(y)
    assert (not x.intersection(y).is_empty()) == x.intersects(y)

    assert expected_union == x.union(y)
    assert expected_intersection == x.intersection(y)

    def copy(r):
        return cls.empty() if r.is_empty() else cls(r.lo(), r.hi())

    r = copy(x)
    r.add_rect(y)
    assert expected_union == r
    if y.lo() == y.hi():
        r = copy(x)
        r.add_point(y.lo())
        assert expected_union == r


def test_empty_rectangles():
    empty = R2Rect.empty()
    assert empty.is_valid()
    assert empty.is_empty()
    assert empty == empty


def test_constructors_and_accessors():
    r = R2Rect((0.1, 0), (0.25, 1))
    assert r.x.lo == 0.1
    assert r.x.hi == 0.25
    assert r.y.lo == 0.0
    assert r.y.hi == 1.0

    assert r[0].lo == 0.1
    assert r[0].hi == 0.25
    assert r[1].lo == 0.0
    assert r[1].hi == 1.0

    assert R1Interval(0.1, 0.25) == r[0]
    assert R1Interval(0, 1) == r[1]

    r[0] = R1Interval(3, 4)
    r[1] = R1Interval(5, 6)
    assert R1Interval(3, 4) == r[0]
    assert R1Interval(5, 6) == r[1]

    assert r == r
    assert r != R2Rect.empty()

    r2 = R2Rect()
    assert r2.is_empty()
    assert r2 == R2Rect.empty()


def test_from_center_size():
    assert R2Rect.from_center_size((0.3, 0.5), (0.2, 0.4)).approx_equals(
        R2Rect((0.2, 0.3), (0.4, 0.7))
    )
    assert R2Rect.from_center_size((1, 0.1), (0, 2)).approx_equals(
        R2Rect((1, -0.9), (1, 1.1))
    )


def test_from_point():
    d1 = R2Rect((0.1, 0), (0.25, 1))
    assert R2Rect(d1.lo(), d1.lo()) == R2Rect.from_point(d1.lo())
    assert R2Rect((0.15, 0.3), (0.35, 0.9)) == R2Rect.from_point_pair(
        (0.15, 0.9), (0.35, 0.3)
    )
    assert R2Rect((0.12, 0), (0.83, 0.5)) == R2Rect.from_point_pair(
        (0.83, 0), (0.12, 0.5)
    )


def test_simple_predicates():
    sw1 = (0.0, 0.25)
    ne1 = (0.5, 0.75)
    r1 = R2Rect(sw1, ne1)

    assert r1.get_center() == (0.25, 0.5)
    assert r1.get_vertex(0) == (0.0, 0.25)
    assert r1.get_vertex(1) == (0.5, 0.25)
    assert r1.get_vertex(2) == (0.5, 0.75)
    assert r1.get_vertex(3) == (0.0, 0.75)
    assert r1.contains_point((0.2, 0.4))
    assert not r1.contains_point((0.2, 0.8))
    assert not r1.contains_point((-0.1, 0.4))
    assert not r1.contains_point((0.6, 0.1))
    assert r1.contains_point(sw1)
    assert r1.contains_point(ne1)
    assert not r1.interior_contains_point(sw1)
    assert not r1.interior_contains_point(ne1)

    # GetVertex returns vertices in CCW order (2-D ortho test,
    # r2rect_test.cc:142-148).
    for k in range(4):
        a = np.array(r1.get_vertex(k - 1))
        b = np.array(r1.get_vertex(k))
        c = np.array(r1.get_vertex(k + 1))
        ab = b - a
        ortho = np.array([-ab[1], ab[0]])
        assert float(np.dot(ortho, c - a)) > 0


@pytest.mark.parametrize("cls", [R2Rect, S2R2Rect])
def test_interval_operations(cls):
    """r2rect_test.cc:151-194 / s2r2rect_test.cc:181-224 (same matrix)."""
    empty = cls.empty()
    sw1 = (0.0, 0.25)
    ne1 = (0.5, 0.75)
    r1 = cls(sw1, ne1)
    r1_mid = cls((0.25, 0.5), (0.25, 0.5))
    r_sw1 = cls(sw1, sw1)
    r_ne1 = cls(ne1, ne1)

    _check_interval_ops(r1, r1_mid, "TTTT", r1, r1_mid, cls)
    _check_interval_ops(r1, r_sw1, "TFTF", r1, r_sw1, cls)
    _check_interval_ops(r1, r_ne1, "TFTF", r1, r_ne1, cls)

    assert cls((0, 0.25), (0.5, 0.75)) == r1
    _check_interval_ops(
        r1, cls((0.45, 0.1), (0.75, 0.3)), "FFTT",
        cls((0, 0.1), (0.75, 0.75)), cls((0.45, 0.25), (0.5, 0.3)), cls)
    _check_interval_ops(
        r1, cls((0.5, 0.1), (0.7, 0.3)), "FFTF",
        cls((0, 0.1), (0.7, 0.75)), cls((0.5, 0.25), (0.5, 0.3)), cls)
    _check_interval_ops(
        r1, cls((0.45, 0.1), (0.7, 0.25)), "FFTF",
        cls((0, 0.1), (0.7, 0.75)), cls((0.45, 0.25), (0.5, 0.25)), cls)

    _check_interval_ops(
        cls((0.1, 0.2), (0.1, 0.3)), cls((0.15, 0.7), (0.2, 0.8)), "FFFF",
        cls((0.1, 0.2), (0.2, 0.8)), empty, cls)

    # Intersections empty in exactly one axis are still empty rectangles.
    _check_interval_ops(
        cls((0.1, 0.2), (0.4, 0.5)), cls((0, 0), (0.2, 0.1)), "FFFF",
        cls((0, 0), (0.4, 0.5)), empty, cls)
    _check_interval_ops(
        cls((0, 0), (0.1, 0.3)), cls((0.2, 0.1), (0.3, 0.4)), "FFFF",
        cls((0, 0), (0.3, 0.4)), empty, cls)


@pytest.mark.parametrize("cls", [R2Rect, S2R2Rect])
def test_add_point(cls):
    r1 = cls((0.0, 0.25), (0.5, 0.75))
    r2 = cls.empty()
    r2.add_point((0, 0.25))
    r2.add_point((0.5, 0.25))
    r2.add_point((0, 0.75))
    r2.add_point((0.1, 0.4))
    assert r1 == r2


@pytest.mark.parametrize("cls", [R2Rect, S2R2Rect])
def test_project(cls):
    r1 = (cls.from_intervals(R1Interval(0, 0.5), R1Interval(0.25, 0.75))
          if cls is R2Rect
          else cls(R2Rect.from_intervals(R1Interval(0, 0.5),
                                         R1Interval(0.25, 0.75))))
    assert r1.project((-0.01, 0.24)) == (0.0, 0.25)
    assert r1.project((-5.0, 0.48)) == (0.0, 0.48)
    assert r1.project((-5.0, 2.48)) == (0.0, 0.75)
    assert r1.project((0.19, 2.48)) == (0.19, 0.75)
    assert r1.project((6.19, 2.48)) == (0.5, 0.75)
    assert r1.project((6.19, 0.53)) == (0.5, 0.53)
    assert r1.project((6.19, -2.53)) == (0.5, 0.25)
    assert r1.project((0.33, -2.53)) == (0.33, 0.25)
    assert r1.project((0.33, 0.37)) == (0.33, 0.37)


@pytest.mark.parametrize("cls", [R2Rect, S2R2Rect])
def test_expanded(cls):
    assert cls.empty().expanded((0.1, 0.3)).is_empty()
    assert cls.empty().expanded((-0.1, -0.3)).is_empty()
    assert cls((0.2, 0.4), (0.3, 0.7)).expanded((0.1, 0.3)).approx_equals(
        cls((0.1, 0.1), (0.4, 1.0)))
    assert cls((0.2, 0.4), (0.3, 0.7)).expanded((-0.1, 0.3)).is_empty()
    assert cls((0.2, 0.4), (0.3, 0.7)).expanded((0.1, -0.2)).is_empty()
    assert cls((0.2, 0.4), (0.3, 0.7)).expanded((0.1, -0.1)).approx_equals(
        cls((0.1, 0.5), (0.4, 0.6)))
    assert cls((0.2, 0.4), (0.3, 0.7)).expanded(0.1).approx_equals(
        cls((0.1, 0.3), (0.4, 0.8)))


def test_hash_distinct():
    """SupportsAbslHash (r2rect_test.cc:242-251): distinct rects hash
    distinctly and equal rects hash equal."""
    rects = [
        R2Rect.empty(),
        R2Rect((0, 0), (0, 0)),
        R2Rect((0, 0), (1, 1)),
        R2Rect((1, 2), (3, 4)),
        R2Rect((-1, -2), (1, 2)),
        R2Rect.from_intervals(R1Interval(0, 1), R1Interval(2, 3)),
    ]
    hashes = [hash(r) for r in rects]
    assert len(set(hashes)) == len(rects)
    assert hash(R2Rect((1, 2), (3, 4))) == hash(R2Rect((1, 2), (3, 4)))
    assert hash(R2Rect.empty()) == hash(R2Rect.empty())


# --------------------------------------------------------------------------
# s2r2rect_test.cc
# --------------------------------------------------------------------------


def test_s2r2_empty_rectangles():
    empty = S2R2Rect.empty()
    assert empty.is_valid()
    assert empty.is_empty()
    assert empty == empty


def test_s2r2_constructors_and_accessors():
    d1 = S2R2Rect((0.1, 0), (0.25, 1))
    assert d1.x().lo == 0.1
    assert d1.x().hi == 0.25
    assert d1.y().lo == 0.0
    assert d1.y().hi == 1.0
    assert R1Interval(0.1, 0.25) == d1.x()
    assert R1Interval(0, 1) == d1.y()
    assert R1Interval(0.1, 0.25) == d1[0]
    assert R1Interval(0, 1) == d1[1]
    assert d1.get_vertex_ij(0, 0) == d1.lo()
    assert d1.get_vertex_ij(1, 1) == d1.hi()
    assert d1 == d1
    assert d1 != S2R2Rect.empty()


def test_s2r2_from_cell():
    """FromCell/FromCellId (s2r2rect_test.cc:126-132)."""
    assert S2R2Rect((0, 0), (0.5, 0.5)) == S2R2Rect.from_cid(
        _from_face_pos_level(0, 0, 1))
    assert S2R2Rect((0, 0), (1, 1)) == S2R2Rect.from_cid(
        _from_face_pos_level(0, 0, 0))


def test_s2r2_simple_predicates():
    sw1 = (0.0, 0.25)
    ne1 = (0.5, 0.75)
    r1 = S2R2Rect(sw1, ne1)

    assert r1.get_center() == (0.25, 0.5)
    assert r1.get_vertex(0) == (0.0, 0.25)
    assert r1.get_vertex(1) == (0.5, 0.25)
    assert r1.get_vertex(2) == (0.5, 0.75)
    assert r1.get_vertex(3) == (0.0, 0.75)
    assert r1.contains_st((0.2, 0.4))
    assert not r1.contains_st((0.2, 0.8))
    assert not r1.contains_st((-0.1, 0.4))
    assert not r1.contains_st((0.6, 0.1))
    assert r1.contains_st(sw1)
    assert r1.contains_st(ne1)
    assert not r1.interior_contains_st(sw1)
    assert not r1.interior_contains_st(ne1)

    # GetVertex returns CCW on the sphere too (s2pred::Sign > 0,
    # s2r2rect_test.cc:172-178).
    for k in range(4):
        a = S2R2Rect.to_s2point(r1.get_vertex(k - 1))
        b = S2R2Rect.to_s2point(r1.get_vertex(k))
        c = S2R2Rect.to_s2point(r1.get_vertex(k + 1))
        assert int(sign(a[None], b[None], c[None])[0]) > 0


def test_s2r2_bounds():
    """GetCapBound/GetRectBound (s2r2rect_test.cc:272-299)."""
    empty = S2R2Rect.empty()
    assert empty.get_cap_bound().is_empty()
    assert empty.get_rect_bound().is_empty()

    point_cap = S2R2Rect((0.5, 0.5), (0.5, 0.5)).get_cap_bound()
    assert np.allclose(point_cap.center, np.array([1.0, 0.0, 0.0]))
    assert point_cap.length2 == 0.0
    point_rect = S2R2Rect((0.5, 0.5), (0.5, 0.5)).get_rect_bound()
    origin = LatLngRect.from_point(LatLng(0.0, 0.0))
    assert point_rect.lat.lo == origin.lat.lo
    assert point_rect.lat.hi == origin.lat.hi

    # Deterministic stand-in for s2random::CellId: a fixed-seed RNG picks
    # 10 leaf-ancestor cells across all faces/levels.
    rng = np.random.RandomState(20260818)
    for _ in range(10):
        face = int(rng.randint(0, 6))
        level = int(rng.randint(0, 31))
        pos = int(rng.randint(0, 1 << 31)) << 30 | int(rng.randint(0, 1 << 30))
        cid = CID((face << POS_BITS) + (pos | 1)).parent(level)
        rect = S2R2Rect.from_cid(cid)
        cap = rect.get_cap_bound()
        llrect = rect.get_rect_bound()
        for k in range(4):
            v = S2R2Rect.to_s2point(rect.get_vertex(k))
            v2 = cap.center + 3.0 * (v - cap.center)
            v2 = v2 / np.linalg.norm(v2)
            assert cap.contains_point(v)
            assert not cap.contains_point(v2)
            assert llrect.contains_point(v)
            assert not llrect.contains_point(v2)


def _check_cell_ops(r: S2R2Rect, cell: Cell, level: int):
    """TestCellOps (s2r2rect_test.cc:76-97): 0 = disjoint, 2 = intersects,
    3 = + vertex containment, 4 = contains."""
    vertex_contained = False
    for i in range(4):
        uv = face_xyz_to_uv(0, cell.get_vertex_raw(i))
        if uv is not None:
            st = (float(coords.uv_to_st(np.float64(uv[0]))),
                  float(coords.uv_to_st(np.float64(uv[1]))))
            if r.contains_st(st):
                vertex_contained = True
        if not r.is_empty() and cell.contains_point(
                S2R2Rect.to_s2point(r.get_vertex(i))):
            vertex_contained = True
    assert (level >= 2) == r.may_intersect_cell(cell)
    assert (level >= 3) == vertex_contained
    assert (level >= 4) == r.contains_cell(cell)


def test_s2r2_cell_operations():
    """Contains(S2Cell)/MayIntersect(S2Cell) (s2r2rect_test.cc:301-333)."""
    empty = S2R2Rect.empty()
    _check_cell_ops(empty, Cell(CID.from_face(3)), 0)

    # First quadrant of face 0.
    r4 = S2R2Rect((0, 0), (0.5, 0.5))
    _check_cell_ops(r4, Cell(_from_face_pos_level(0, 0, 0)), 3)
    _check_cell_ops(r4, Cell(_from_face_pos_level(0, 0, 1)), 4)
    _check_cell_ops(r4, Cell(_from_face_pos_level(1, 0, 1)), 0)

    # Intersects the first quadrant of face 0.
    r5 = S2R2Rect((0, 0.45), (0.5, 0.55))
    _check_cell_ops(r5, Cell(_from_face_pos_level(0, 0, 0)), 3)
    _check_cell_ops(r5, Cell(_from_face_pos_level(0, 0, 1)), 3)
    _check_cell_ops(r5, Cell(_from_face_pos_level(1, 0, 1)), 0)

    # Single-point rectangle.
    _check_cell_ops(S2R2Rect((0.51, 0.51), (0.51, 0.51)),
                    Cell(CID.from_face(0)), 3)

    # Intersects the bounding rectangle of face 0 but not the face itself.
    _check_cell_ops(S2R2Rect((0.01, 1.001), (0.02, 1.002)),
                    Cell(CID.from_face(0)), 0)

    # Intersects one corner of face 0.
    corner = CID((0 << POS_BITS) + ((~0 & ((1 << 64) - 1)) >> 3 | 1)).parent(5)
    _check_cell_ops(S2R2Rect((0.99, -0.01), (1.01, 0.01)), Cell(corner), 3)
