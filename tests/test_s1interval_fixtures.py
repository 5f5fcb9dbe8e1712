"""S1Interval fixtures — port of s1interval_test.cc:30-414
(ConstructorsAndAccessors, SimplePredicates, AlmostEmptyOrFull,
GetCenter, GetLength, Complement, Contains, the FULL IntervalOps table,
AddPoint, FromPointPair, Expanded)."""

from __future__ import annotations

import math

import pytest

from s2geometry_spark.kernel.intervals import S1Interval

PI = math.pi
PI_2 = math.pi / 2
DBL_EPSILON = 2.220446049250313e-16

# the standard fixtures (s1interval_test.cc:30-79)
empty = S1Interval.empty()
full = S1Interval.full()
zero = S1Interval(0, 0)
pi2 = S1Interval(PI_2, PI_2)
pi = S1Interval(PI, PI)
mipi = S1Interval(-PI, -PI)  # normalized to [Pi, Pi]
mipi2 = S1Interval(-PI_2, -PI_2)
quad1 = S1Interval(0, PI_2)
quad2 = S1Interval(PI_2, -PI)
quad3 = S1Interval(PI, -PI_2)
quad4 = S1Interval(-PI_2, 0)
quad12 = S1Interval(0, -PI)
quad23 = S1Interval(PI_2, -PI_2)
quad34 = S1Interval(-PI, 0)
quad41 = S1Interval(-PI_2, PI_2)
quad123 = S1Interval(0, -PI_2)
quad234 = S1Interval(PI_2, 0)
quad341 = S1Interval(PI, PI_2)
quad412 = S1Interval(-PI_2, -PI)
mid12 = S1Interval(PI_2 - 0.01, PI_2 + 0.02)
mid23 = S1Interval(PI - 0.01, -PI + 0.02)
mid34 = S1Interval(-PI_2 - 0.01, -PI_2 + 0.02)
mid41 = S1Interval(-0.01, 0.02)


def _eq(a: S1Interval, b: S1Interval) -> bool:
    return a.lo == b.lo and a.hi == b.hi


def test_constructors_and_accessors():
    # :81-104
    assert quad12.lo == 0 and quad12.hi == PI
    assert quad34.lo == PI and quad34.hi == 0
    assert pi.lo == PI and pi.hi == PI
    # [-Pi, -Pi] normalizes to [Pi, Pi]
    assert mipi.lo == PI and mipi.hi == PI
    assert quad23.lo == PI_2 and quad23.hi == -PI_2


def test_simple_predicates():
    # :105-116
    assert not zero.is_empty() and not zero.is_full()
    assert empty.is_empty() and not empty.is_full() and empty.is_inverted()
    assert full.is_full() and not full.is_empty()
    assert not quad12.is_empty() and not quad12.is_full()
    assert not quad12.is_inverted()
    assert quad23.is_inverted() and not quad23.is_empty()
    assert not pi.is_empty() and not pi.is_inverted()
    assert not mipi.is_empty() and not mipi.is_inverted()


def test_almost_empty_or_full():
    # :130-140: rounding must not collapse almost-empty/full intervals
    almost_pi = PI - 2 * DBL_EPSILON
    assert not S1Interval(-almost_pi, PI).is_full()
    assert not S1Interval(-PI, almost_pi).is_full()
    assert not S1Interval(PI, -almost_pi).is_empty()
    assert not S1Interval(almost_pi, -PI).is_empty()


def test_get_center():
    # :141-151
    assert quad12.get_center() == PI_2
    assert S1Interval(3.1, 2.9).get_center() == pytest.approx(3.0 - PI)
    assert S1Interval(-2.9, -3.1).get_center() == pytest.approx(PI - 3.0)
    assert S1Interval(2.1, -2.1).get_center() == pytest.approx(PI)
    assert pi.get_center() == PI
    assert mipi.get_center() == PI
    assert abs(quad23.get_center()) == PI
    assert quad123.get_center() == pytest.approx(0.75 * PI)


def test_get_length():
    # :152-161
    assert quad12.get_length() == PI
    assert pi.get_length() == 0
    assert mipi.get_length() == 0
    assert quad123.get_length() == pytest.approx(1.5 * PI)
    assert abs(quad23.get_length()) == PI
    assert full.get_length() == 2 * PI
    assert empty.get_length() < 0


def test_complement():
    # :162-172
    assert empty.complement().is_full()
    assert full.complement().is_empty()
    assert pi.complement().is_full()
    assert mipi.complement().is_full()
    assert zero.complement().is_full()
    assert quad12.complement().get_length() == pytest.approx(quad34.get_length())
    assert _eq(quad12.complement(), quad34)
    assert _eq(quad34.complement(), quad12)
    assert quad123.complement().get_length() == pytest.approx(quad4.get_length())


def test_contains_points():
    # :173-228
    assert not empty.contains(0) and not empty.contains(PI)
    assert not empty.contains(-PI)
    assert not empty.interior_contains(PI) and not empty.interior_contains(-PI)
    assert full.contains(0) and full.contains(PI) and full.contains(-PI)
    assert full.interior_contains(PI) and full.interior_contains(-PI)
    assert quad12.contains(0) and quad12.contains(PI) and quad12.contains(-PI)
    assert quad12.interior_contains(PI_2) and not quad12.interior_contains(0)
    assert not quad12.interior_contains(PI)
    assert not quad12.interior_contains(-PI)
    assert quad23.contains(PI_2) and quad23.contains(-PI_2)
    assert quad23.contains(PI) and quad23.contains(-PI)
    assert not quad23.contains(0)
    assert not quad23.interior_contains(PI_2)
    assert not quad23.interior_contains(-PI_2)
    assert quad23.interior_contains(PI) and quad23.interior_contains(-PI)
    assert not quad23.interior_contains(0)
    assert pi.contains(PI) and pi.contains(-PI) and not pi.contains(0)
    assert not pi.interior_contains(PI) and not pi.interior_contains(-PI)
    assert mipi.contains(PI) and mipi.contains(-PI) and not mipi.contains(0)
    assert zero.contains(0) and not zero.interior_contains(0)


quad12eps = S1Interval(quad12.lo, mid23.hi)
quad2hi = S1Interval(mid23.lo, quad12.hi)
quad412eps = S1Interval(mid34.lo, quad12.hi)
quadeps12 = S1Interval(mid41.lo, quad12.hi)
quad1lo = S1Interval(quad12.lo, mid41.hi)
quad2lo = S1Interval(quad23.lo, mid12.hi)
quad3hi = S1Interval(mid34.lo, quad23.hi)
quadeps23 = S1Interval(mid12.lo, quad23.hi)
quad23eps = S1Interval(quad23.lo, mid34.hi)
quadeps123 = S1Interval(mid41.lo, quad23.hi)

# (x, y, "TTFF" relation, union, intersection) — :229-346, complete
_INTERVAL_OPS = [
    (empty, empty, "TTFF", empty, empty),
    (empty, full, "FFFF", full, empty),
    (empty, zero, "FFFF", zero, empty),
    (empty, pi, "FFFF", pi, empty),
    (empty, mipi, "FFFF", mipi, empty),
    (full, empty, "TTFF", full, empty),
    (full, full, "TTTT", full, full),
    (full, zero, "TTTT", full, zero),
    (full, pi, "TTTT", full, pi),
    (full, mipi, "TTTT", full, mipi),
    (full, quad12, "TTTT", full, quad12),
    (full, quad23, "TTTT", full, quad23),
    (zero, empty, "TTFF", zero, empty),
    (zero, full, "FFTF", full, zero),
    (zero, zero, "TFTF", zero, zero),
    (zero, pi, "FFFF", S1Interval(0, PI), empty),
    (zero, pi2, "FFFF", quad1, empty),
    (zero, mipi, "FFFF", quad12, empty),
    (zero, mipi2, "FFFF", quad4, empty),
    (zero, quad12, "FFTF", quad12, zero),
    (zero, quad23, "FFFF", quad123, empty),
    (pi2, empty, "TTFF", pi2, empty),
    (pi2, full, "FFTF", full, pi2),
    (pi2, zero, "FFFF", quad1, empty),
    (pi2, pi, "FFFF", S1Interval(PI_2, PI), empty),
    (pi2, pi2, "TFTF", pi2, pi2),
    (pi2, mipi, "FFFF", quad2, empty),
    (pi2, mipi2, "FFFF", quad23, empty),
    (pi2, quad12, "FFTF", quad12, pi2),
    (pi2, quad23, "FFTF", quad23, pi2),
    (pi, empty, "TTFF", pi, empty),
    (pi, full, "FFTF", full, pi),
    (pi, zero, "FFFF", S1Interval(PI, 0), empty),
    (pi, pi, "TFTF", pi, pi),
    (pi, pi2, "FFFF", S1Interval(PI_2, PI), empty),
    (pi, mipi, "TFTF", pi, pi),
    (pi, mipi2, "FFFF", quad3, empty),
    (pi, quad12, "FFTF", S1Interval(0, PI), pi),
    (pi, quad23, "FFTF", quad23, pi),
    (mipi, empty, "TTFF", mipi, empty),
    (mipi, full, "FFTF", full, mipi),
    (mipi, zero, "FFFF", quad34, empty),
    (mipi, pi, "TFTF", mipi, mipi),
    (mipi, pi2, "FFFF", quad2, empty),
    (mipi, mipi, "TFTF", mipi, mipi),
    (mipi, mipi2, "FFFF", S1Interval(-PI, -PI_2), empty),
    (mipi, quad12, "FFTF", quad12, mipi),
    (mipi, quad23, "FFTF", quad23, mipi),
    (quad12, empty, "TTFF", quad12, empty),
    (quad12, full, "FFTT", full, quad12),
    (quad12, zero, "TFTF", quad12, zero),
    (quad12, pi, "TFTF", quad12, pi),
    (quad12, mipi, "TFTF", quad12, mipi),
    (quad12, quad12, "TFTT", quad12, quad12),
    (quad12, quad23, "FFTT", quad123, quad2),
    (quad12, quad34, "FFTF", full, quad12),
    (quad23, empty, "TTFF", quad23, empty),
    (quad23, full, "FFTT", full, quad23),
    (quad23, zero, "FFFF", quad234, empty),
    (quad23, pi, "TTTT", quad23, pi),
    (quad23, mipi, "TTTT", quad23, mipi),
    (quad23, quad12, "FFTT", quad123, quad2),
    (quad23, quad23, "TFTT", quad23, quad23),
    (quad23, quad34, "FFTT", quad234, S1Interval(-PI, -PI_2)),
    (quad1, quad23, "FFTF", quad123, S1Interval(PI_2, PI_2)),
    (quad2, quad3, "FFTF", quad23, mipi),
    (quad3, quad2, "FFTF", quad23, pi),
    (quad2, pi, "TFTF", quad2, pi),
    (quad2, mipi, "TFTF", quad2, mipi),
    (quad3, pi, "TFTF", quad3, pi),
    (quad3, mipi, "TFTF", quad3, mipi),
    (quad12, mid12, "TTTT", quad12, mid12),
    (mid12, quad12, "FFTT", quad12, mid12),
    (quad12, mid23, "FFTT", quad12eps, quad2hi),
    (mid23, quad12, "FFTT", quad12eps, quad2hi),
    (quad12, mid34, "FFFF", quad412eps, empty),
    (mid34, quad12, "FFFF", quad412eps, empty),
    (quad12, mid41, "FFTT", quadeps12, quad1lo),
    (mid41, quad12, "FFTT", quadeps12, quad1lo),
    (quad23, mid12, "FFTT", quadeps23, quad2lo),
    (mid12, quad23, "FFTT", quadeps23, quad2lo),
    (quad23, mid23, "TTTT", quad23, mid23),
    (mid23, quad23, "FFTT", quad23, mid23),
    (quad23, mid34, "FFTT", quad23eps, quad3hi),
    (mid34, quad23, "FFTT", quad23eps, quad3hi),
    (quad23, mid41, "FFFF", quadeps123, empty),
    (mid41, quad23, "FFFF", quadeps123, empty),
]


@pytest.mark.parametrize("idx", range(len(_INTERVAL_OPS)))
def test_interval_ops(idx):
    # TestIntervalOps (:199-228)
    x, y, rel, want_union, want_intersection = _INTERVAL_OPS[idx]
    assert x.contains_interval(y) == (rel[0] == "T"), "contains"
    assert x.interior_contains_interval(y) == (rel[1] == "T"), "int contains"
    assert x.intersects(y) == (rel[2] == "T"), "intersects"
    assert x.interior_intersects(y) == (rel[3] == "T"), "int intersects"
    assert _eq(x.union(y), want_union), (x.union(y).lo, x.union(y).hi)
    got_i = x.intersection(y)
    assert _eq(got_i, want_intersection), (got_i.lo, got_i.hi)
    assert x.contains_interval(y) == _eq(x.union(y), x)
    assert x.intersects(y) == (not x.intersection(y).is_empty())
    if y.lo == y.hi:
        r = S1Interval(x.lo, x.hi, checked=True)
        r.add_point(y.lo)
        assert _eq(r, want_union)


def test_add_point():
    # :347-371
    def added(base, *points):
        r = S1Interval(base.lo, base.hi, checked=True)
        for p in points:
            r.add_point(p)
        return r

    assert _eq(added(empty, 0), zero)
    assert _eq(added(empty, PI), pi)
    assert _eq(added(empty, -PI), mipi)
    assert _eq(added(empty, PI, -PI), pi)
    assert _eq(added(empty, -PI, PI), mipi)
    assert _eq(added(empty, mid12.lo, mid12.hi), mid12)
    assert _eq(added(empty, mid23.lo, mid23.hi), mid23)
    assert _eq(added(quad1, -0.9 * PI, -PI_2), quad123)
    assert added(full, 0).is_full()
    assert added(full, PI).is_full()
    assert added(full, -PI).is_full()


def test_from_point_pair():
    # :389-395
    assert _eq(S1Interval.from_point_pair(-PI, PI), pi)
    assert _eq(S1Interval.from_point_pair(PI, -PI), pi)
    assert _eq(S1Interval.from_point_pair(mid34.hi, mid34.lo), mid34)
    assert _eq(S1Interval.from_point_pair(mid23.lo, mid23.hi), mid23)


def test_expanded():
    # :396-414
    assert _eq(empty.expanded(1), empty)
    assert _eq(full.expanded(1), full)
    assert _eq(zero.expanded(1), S1Interval(-1, 1))
    assert _eq(mipi.expanded(0.01), S1Interval(PI - 0.01, -PI + 0.01))
    assert _eq(pi.expanded(27), full)
    assert _eq(pi.expanded(PI_2), quad23)
    assert _eq(pi2.expanded(PI_2), quad12)
    assert _eq(mipi2.expanded(PI_2), quad34)
    assert _eq(empty.expanded(-1), empty)
    assert _eq(full.expanded(-1), full)
    assert _eq(quad123.expanded(-27), empty)
    assert _eq(quad234.expanded(-27), empty)
    assert _eq(quad123.expanded(-PI_2), quad2)
    assert _eq(quad341.expanded(-PI_2), quad4)
    assert _eq(quad412.expanded(-PI_2), quad1)


class TestR1Interval:
    """Port of r1interval_test.cc TestBasic :49-156 (accessors,
    predicates, point/interval ops table, AddPoint, Project,
    FromPointPair, Expanded, Union, Intersection)."""

    @staticmethod
    def _ops(x, y, expected):
        # TestIntervalOps (r1interval_test.cc:29-47)
        from s2geometry_spark.kernel.intervals import R1Interval

        assert x.contains_interval(y) == (expected[0] == "T")
        assert x.interior_contains_interval(y) == (expected[1] == "T")
        assert x.intersects(y) == (expected[2] == "T")
        assert x.interior_intersects(y) == (expected[3] == "T")
        u = x.union(y)
        assert x.contains_interval(y) == (
            (u.lo, u.hi) == (x.lo, x.hi)
            or (u.is_empty() and x.is_empty())
        )
        assert x.intersects(y) == (not x.intersection(y).is_empty())
        z = R1Interval(x.lo, x.hi)
        z.add_interval(y)
        assert (z.lo, z.hi) == (u.lo, u.hi) or (
            z.is_empty() and u.is_empty()
        )

    def test_basic(self):
        from s2geometry_spark.kernel.intervals import R1Interval

        unit = R1Interval(0, 1)
        negunit = R1Interval(-1, 0)
        half = R1Interval(0.5, 0.5)
        empty = R1Interval.empty()

        assert unit.lo == 0 and unit.hi == 1
        assert not unit.is_empty() and not half.is_empty()
        assert empty.is_empty()

        assert unit.get_center() == 0.5
        assert half.get_center() == 0.5
        assert negunit.get_length() == 1.0
        assert half.get_length() == 0
        assert empty.get_length() < 0

        assert unit.contains(0.5) and unit.interior_contains(0.5)
        assert unit.contains(0) and not unit.interior_contains(0)
        assert unit.contains(1) and not unit.interior_contains(1)

        self._ops(empty, empty, "TTFF")
        self._ops(empty, unit, "FFFF")
        self._ops(unit, half, "TTTT")
        self._ops(unit, unit, "TFTT")
        self._ops(unit, empty, "TTFF")
        self._ops(unit, negunit, "FFTF")
        self._ops(unit, R1Interval(0, 0.5), "TFTT")
        self._ops(half, R1Interval(0, 0.5), "FFTF")

        r = R1Interval.empty()
        r.add_point(5)
        assert (r.lo, r.hi) == (5, 5)
        r.add_point(-1)
        assert (r.lo, r.hi) == (-1, 5)
        r.add_point(0)
        assert (r.lo, r.hi) == (-1, 5)

        assert R1Interval(0.1, 0.4).project(0.3) == 0.3
        assert R1Interval(0.1, 0.4).project(-7.0) == 0.1
        assert R1Interval(0.1, 0.4).project(0.6) == 0.4

        assert (R1Interval.from_point_pair(4, 4).lo,
                R1Interval.from_point_pair(4, 4).hi) == (4, 4)
        assert (R1Interval.from_point_pair(-1, -2).lo,
                R1Interval.from_point_pair(-1, -2).hi) == (-2, -1)
        assert (R1Interval.from_point_pair(-5, 3).lo,
                R1Interval.from_point_pair(-5, 3).hi) == (-5, 3)

        assert empty.expanded(0.45).is_empty()
        assert (unit.expanded(0.5).lo, unit.expanded(0.5).hi) == (-0.5, 1.5)
        assert (unit.expanded(-0.5).lo, unit.expanded(-0.5).hi) == (0.5, 0.5)
        assert unit.expanded(-0.51).is_empty()

        assert (R1Interval(99, 100).union(empty).lo,
                R1Interval(99, 100).union(empty).hi) == (99, 100)
        assert (empty.union(R1Interval(99, 100)).lo,
                empty.union(R1Interval(99, 100)).hi) == (99, 100)
        assert R1Interval(5, 3).union(R1Interval(0, -2)).is_empty()
        assert R1Interval(0, -2).union(R1Interval(5, 3)).is_empty()
        u = unit.union(negunit)
        assert (u.lo, u.hi) == (-1, 1)
        assert (half.union(unit).lo, half.union(unit).hi) == (0, 1)
        i = unit.intersection(half)
        assert (i.lo, i.hi) == (0.5, 0.5)
        i = unit.intersection(negunit)
        assert (i.lo, i.hi) == (0, 0)
        assert negunit.intersection(half).is_empty()
        assert unit.intersection(empty).is_empty()
        assert empty.intersection(unit).is_empty()
