"""Point-in-polygon kernel tests (FIXTURES.md §4 probes + properties)."""

import numpy as np

from s2geometry_spark.kernel import predicates as P
from s2geometry_spark.kernel.contains import (
    Polygon,
    parse_points,
    parse_polygon,
)
from s2geometry_spark.kernel.coords import latlng_to_xyz

RNG = np.random.default_rng(42)

NEAR0 = "-1:0, 0:1, 1:0, 0:-1"
NEAR1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1"
NEAR2 = "-1:-2, -2:5, 5:-2"
NEAR3 = "-2:-2, -3:6, 6:-3"
NEAR_HEMI = "0:-90, -90:0, 0:90, 90:0"
SOUTH1 = "-90:0, -89.9:0.1, -89.9:-0.1"
SOUTH2 = "-90:0, -89.8:0.2, -89.8:-0.2"
NEAR_PT = "0:0"
SOUTH_PT = "-89.9999:0.001"


def test_near_family_contains_near_point():
    p = parse_points(NEAR_PT)
    for s in (NEAR0, NEAR1, NEAR2, NEAR3, NEAR_HEMI):
        assert parse_polygon(s).contains(p)[0], s


def test_south_family_contains_south_point():
    p = parse_points(SOUTH_PT)
    for s in (SOUTH1, SOUTH2):
        assert parse_polygon(s).contains(p)[0], s
    assert not parse_polygon(NEAR0).contains(p)[0]
    assert not parse_polygon(SOUTH1).contains(parse_points(NEAR_PT))[0]


def test_empty_full():
    pts = parse_points("0:0, 45:45, -89:170")
    assert not parse_polygon("empty").contains(pts).any()
    assert parse_polygon("full").contains(pts).all()


def test_hole_semantics():
    # cross1 with its center hole: hole interior not contained
    shell = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1"
    hole = "-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5"
    poly = parse_polygon(shell + ";" + hole)
    assert not poly.contains(parse_points("0:0"))[0]  # in the hole
    assert poly.contains(parse_points("1.5:0.2"))[0]  # in the shell  # noqa
    assert not poly.contains(parse_points("5:5"))[0]  # outside


def test_semi_open_vertex_model():
    # 4 unit squares sharing corner 0:0 — the shared corner must belong to
    # exactly one square (SEMI_OPEN, s2contains_point_query.h:37-54);
    # ditto every shared edge midpoint belongs to exactly one of 2 squares.
    squares = [
        "0:0, 0:1, 1:1, 1:0",
        "0:-1, 0:0, 1:0, 1:-1",
        "-1:-1, -1:0, 0:0, 0:-1",
        "-1:0, -1:1, 0:1, 0:0",
    ]
    polys = [parse_polygon(s) for s in squares]
    corner = parse_points("0:0")
    count = sum(int(p.contains(corner)[0]) for p in polys)
    assert count == 1
    for probe in ["0:0.5", "0.5:0", "0:-0.5", "-0.5:0"]:
        pt = parse_points(probe)
        assert sum(int(p.contains(pt)[0]) for p in polys) == 1


def test_hemisphere_parity():
    hemi = parse_polygon(NEAR_HEMI)
    # antipodal probe pairs: exactly one of p, -p inside a hemisphere-ish loop
    lat = RNG.uniform(-89, 89, 500)
    lng = RNG.uniform(-180, 180, 500)
    p = np.stack(latlng_to_xyz(lat, lng), -1)
    a = hemi.contains(p)
    b = hemi.contains(-p)
    assert (a ^ b).all()


def test_convex_loop_vs_sign_oracle():
    # random convex-ish CCW rings: interior = all edge signs positive
    for _ in range(10):
        lat0, lng0 = RNG.uniform(-60, 60), RNG.uniform(-170, 170)
        r = RNG.uniform(1, 10)
        angs = np.sort(RNG.uniform(0, 2 * np.pi, 10))
        lats = lat0 + r * np.sin(angs)
        lngs = lng0 + r * np.cos(angs) / np.cos(np.radians(lat0))
        loop_str = ", ".join(f"{a}:{b}" for a, b in zip(lats, lngs))
        poly = parse_polygon(loop_str)
        qlat = lat0 + RNG.uniform(-2 * r, 2 * r, 300)
        qlng = lng0 + RNG.uniform(-2 * r, 2 * r, 300)
        q = np.stack(latlng_to_xyz(qlat, qlng), -1)
        verts = np.stack(latlng_to_xyz(lats, lngs), -1)
        C, D = verts, np.roll(verts, -1, axis=0)
        signs = np.stack(
            [
                P.sign(np.broadcast_to(C[m], q.shape), np.broadcast_to(D[m], q.shape), q)
                for m in range(len(C))
            ],
            axis=1,
        )
        oracle = (signs > 0).all(axis=1)
        assert (poly.contains(q) == oracle).all()


def test_exact_sign_consistency():
    # Sign is antisymmetric and never 0 for distinct points (ExpensiveSign)
    a = np.stack(latlng_to_xyz(RNG.uniform(-90, 90, 200), RNG.uniform(-180, 180, 200)), -1)
    b = np.roll(a, 1, axis=0)
    c = np.roll(a, 2, axis=0)
    s1 = P.sign(a, b, c)
    s2 = P.sign(c, b, a)
    assert (s1 != 0).all()
    assert (s1 == -s2).all()
    # degenerate: collinear points on the equator decided by perturbation
    eq = np.stack(latlng_to_xyz(np.zeros(3), np.array([0.0, 10.0, 20.0])), -1)
    s = P.exact_sign(eq[0], eq[1], eq[2])
    assert s in (-1, 1)
    assert P.exact_sign(eq[2], eq[1], eq[0]) == -s


def test_crossing_sign_basics():
    pts = {k: parse_points(v)[0] for k, v in {
        "a": "0:-1", "b": "0:1", "c": "-1:0", "d": "1:0", "e": "2:5",
    }.items()}
    assert P.crossing_sign(pts["a"], pts["b"], pts["c"], pts["d"]) == 1
    assert P.crossing_sign(pts["a"], pts["b"], pts["c"], pts["e"]) == -1
    # shared vertex → 0
    assert P.crossing_sign(pts["a"], pts["b"], pts["b"], pts["e"]) == 0
