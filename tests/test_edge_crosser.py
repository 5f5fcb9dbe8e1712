"""s2edge_crosser_test.cc Crossings port: the 12 adversarial crossing
cases (antipodal intersections, 1e-323 underflow, >2000-bit exact
determinants) under all argument permutations, checking CrossingSign,
EdgeOrVertexCrossing, and SignedEdgeOrVertexCrossing consistency.
"""

from __future__ import annotations

import numpy as np

from s2geometry_spark.kernel.predicates import (
    ORIGIN,
    crossing_sign,
    edge_or_vertex_crossing,
    sign,
    signed_edge_or_vertex_crossing,
)


def _norm(v):
    v = np.asarray(v, float)
    return v / np.linalg.norm(v)


def check_crossing(a, b, c, d, cs_expected, signed_expected):
    """TestCrossing (test.cc:51-90), degenerate-vertex fixup included."""
    if any(np.array_equal(x, y)
           for x in (a, b) for y in (c, d)):
        cs_expected = 0
    if cs_expected == 1:
        assert signed_expected == int(sign(a[None], b[None], c[None])[0])
    elif cs_expected == 0 and signed_expected != 0:
        want = 1 if (np.array_equal(a, c) or np.array_equal(b, d)) else -1
        assert signed_expected == want

    assert crossing_sign(a, b, c, d) == cs_expected, (a, b, c, d)
    assert edge_or_vertex_crossing(a, b, c, d) == (signed_expected != 0)
    assert signed_edge_or_vertex_crossing(a, b, c, d) == signed_expected


def check_crossings(a, b, c, d, cs, signed_cs):
    """TestCrossings (test.cc:122-147): permutation/degeneracy matrix."""
    a, b, c, d = _norm(a), _norm(b), _norm(c), _norm(d)
    check_crossing(a, b, c, d, cs, signed_cs)
    check_crossing(b, a, c, d, cs, -signed_cs)
    check_crossing(a, b, d, c, cs, -signed_cs)
    check_crossing(b, a, d, c, cs, signed_cs)
    check_crossing(a, a, c, d, -1, 0)
    check_crossing(a, b, c, c, -1, 0)
    check_crossing(a, a, c, c, -1, 0)
    check_crossing(a, b, a, b, 0, 1)
    if cs == 0:
        check_crossing(c, d, a, b, cs, 0)
    else:
        check_crossing(c, d, a, b, cs, -signed_cs)


def test_crossings():
    nxt0 = np.nextafter(1, 0)
    nxt2 = np.nextafter(1, 2)
    cases = [
        # 1. two regular edges that cross
        ([1, 2, 1], [1, -3, 0.5], [1, -0.5, -3], [0.1, 0.5, 3], 1, 1),
        # 2. intersect at antipodal points
        ([1, 2, 1], [1, -3, 0.5], [-1, 0.5, 3], [-0.1, -0.5, -3], -1, 0),
        # 3. same great circle starting at antipodal points
        ([0, 0, -1], [0, 1, 0], [0, 0, 1], [0, 1, 1], -1, 0),
        # 4. crossing with one vertex at S2::Origin
        ([1, 0, 0], ORIGIN, [1, -0.1, 1], [1, 1, -0.1], 1, 1),
        # 5. antipodal intersection with one vertex at S2::Origin
        ([1, 0, 0], ORIGIN, [-1, 0.1, -1], [-1, -1, 0.1], -1, 0),
        # 6. shared endpoint, AB further CCW around (2,3,4) than CD
        ([7, -2, 3], [2, 3, 4], [2, 3, 4], [-1, 2, 5], 0, -1),
        # 7. barely cross near the middle of one edge
        ([1, 1, 1], [1, nxt0, -1], [11, -12, -1], [10, 10, 1], 1, -1),
        # 8. separated by ~1e-15
        ([1, 1, 1], [1, nxt2, -1], [1, -1, 0], [1, 1, 0], -1, 0),
        # 9. barely cross near both ends (double underflow)
        ([0, 0, 1], [2, -1e-323, 1], [1, -1, 1], [1e-323, 0, 1], 1, -1),
        # 10. separated by ~1e-640
        ([0, 0, 1], [2, 1e-323, 1], [1, -1, 1], [1e-323, 0, 1], -1, 0),
        # 11. needs >2000 bits of exact determinant precision
        ([1, -1e-323, -1e-323], [1e-323, 1, 1e-323],
         [1, -1, 1e-323], [1, 1, 0], 1, 1),
        # 12. separated by ~1e-640
        ([1, 1e-323, -1e-323], [-1e-323, 1, 1e-323],
         [1, -1, 1e-323], [1, 1, 0], -1, 0),
    ]
    for a, b, c, d, cs, scs in cases:
        check_crossings(np.asarray(a, float), np.asarray(b, float),
                        np.asarray(c, float), np.asarray(d, float), cs, scs)


def test_collinear_edges_that_dont_touch():
    """test.cc CollinearEdgesThatDontTouch: separated collinear edges
    never report a crossing."""
    rng = np.random.RandomState(91)
    from s2geometry_spark.kernel.fractal import random_point

    for _ in range(500):
        a = random_point(rng)
        d = random_point(rng)
        b = _norm(a + 0.05 * (d - a))
        c = _norm(d + 0.05 * (a - d))
        assert crossing_sign(a, b, c, d) < 0
        assert crossing_sign(a, b, c, d) < 0
        assert crossing_sign(c, d, a, b) < 0


def test_coincident_zero_length_edges_that_dont_touch():
    """test.cc CoincidentZeroLengthEdgesThatDontTouch: degenerate edges
    at distinct points never cross."""
    rng = np.random.RandomState(92)
    from s2geometry_spark.kernel.fractal import random_point

    for _ in range(500):
        p = random_point(rng)
        d = 1e-15 * random_point(rng)
        a = _norm(p - d)
        b = _norm(p + d)
        assert crossing_sign(a, a, b, b) < 0
