"""Minimal S2Builder snap layer — fixtures ported from
s2builder_test.cc:154-231 plus snapped-boolean robustness."""

import math

import numpy as np

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.builder import (
    IdentitySnapFunction,
    IntLatLngSnapFunction,
    S2CellIdSnapFunction,
    snap_polygon,
    snap_polyline,
)
from s2geometry_spark.kernel.contains import parse_points, parse_polygon
from s2geometry_spark.kernel.coords import latlng_to_xyz


def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
    return np.array([float(x), float(y), float(z)])


def _approx_equal_cyclic(got: np.ndarray, expected: np.ndarray, tol_rad: float):
    """Loops equal up to rotation, each vertex within tol."""
    assert len(got) == len(expected), (len(got), len(expected))
    n = len(got)
    chord_tol = (2 * math.sin(tol_rad / 2)) ** 2
    for off in range(n):
        rolled = np.roll(got, -off, axis=0)
        if all(((rolled[i] - expected[i]) ** 2).sum() <= chord_tol for i in range(n)):
            return
    raise AssertionError(f"no cyclic match within {tol_rad}")


def test_simple_vertex_merging():
    # s2builder_test.cc:154-170
    snap_radius = math.radians(0.5)
    inp = parse_polygon(
        "0:0, 0.2:0.2, 0.1:0.2, 0.1:0.9, 0:1, 0.1:1.1, 0.9:1, 1:1, 1:0.9"
    )
    out = snap_polygon(inp, IdentitySnapFunction(snap_radius))
    expected = parse_polygon("0:0, 0:1, 1:0.9")
    assert len(out.loops) == 1
    _approx_equal_cyclic(
        out.loops[0].vertices, expected.loops[0].vertices, 2 * snap_radius
    )


def test_simple_s2cellid_snapping():
    # s2builder_test.cc:172-193
    level = S2CellIdSnapFunction.level_for_max_snap_radius(math.radians(1))
    snap = S2CellIdSnapFunction(level)
    inp = parse_polygon("2:2, 3:4, 2:6, 4:5, 6:6, 5:4, 6:2, 4:3")
    out = snap_polygon(inp, snap)
    assert len(out.loops) == 1
    v = out.loops[0].vertices
    # every output vertex is the center of a level-`level` cell
    ids = K.parent(K.from_point(v[:, 0], v[:, 1], v[:, 2]), level)
    cx, cy, cz = K.to_point(ids)
    assert np.all(cx == v[:, 0]) and np.all(cy == v[:, 1]) and np.all(cz == v[:, 2])
    # and each input vertex has an output vertex within the snap radius
    for p in inp.loops[0].vertices:
        d2 = ((v - p) ** 2).sum(-1).min()
        assert d2 <= (2 * math.sin(snap.snap_radius / 2)) ** 2 + 1e-30


def test_simple_intlatlng_snapping():
    # s2builder_test.cc:195-209 (E0 coordinates)
    inp = parse_polygon(
        "2.01:2.09, 3.24:4.49, 1.78:6.25, 3.51:5.49, 6.11:6.11, "
        "5.22:3.88, 5.55:2.49, 4.49:2.51"
    )
    out = snap_polygon(inp, IntLatLngSnapFunction(0))
    expected = parse_polygon("2:2, 3:4, 2:6, 4:5, 6:6, 5:4, 6:2, 4:3")
    assert len(out.loops) == 1
    _approx_equal_cyclic(out.loops[0].vertices, expected.loops[0].vertices, 1e-14)


def test_vertices_move_less_than_snap_radius():
    # s2builder_test.cc:211-231: a 1000-vertex regular loop of radius 20°
    # with 1° snap radius keeps 90-100 vertices (none collapse together).
    from s2geometry_spark.kernel.polyline import _get_frame

    center = np.array([1.0, 0.0, 0.0])
    frame = _get_frame(center)
    radius = math.radians(20)
    n = 1000
    verts = []
    for k in range(n):
        theta = 2 * math.pi * k / n
        d = np.array(
            [math.sin(radius) * math.cos(theta),
             math.sin(radius) * math.sin(theta),
             math.cos(radius)]
        )
        p = frame @ d
        verts.append(p / np.linalg.norm(p))
    from s2geometry_spark.kernel.contains import Loop, Polygon

    inp = Polygon([Loop(np.asarray(verts))])
    out = snap_polygon(inp, IdentitySnapFunction(math.radians(1)))
    assert len(out.loops) == 1
    nv = len(out.loops[0].vertices)
    assert 90 <= nv <= 100, nv


def test_snap_polyline_dedupes():
    # S2Polyline::InitToSnapped at a coarse level dedupes vertices
    # (s2polyline_test.cc:510-524)
    v = parse_points("10:10, 10:20, 10:30, 10:15, 10:40")
    snapped = snap_polyline(v, S2CellIdSnapFunction(30))
    assert len(snapped) == 5  # leaf-level snap keeps all
    coarse = snap_polyline(v, S2CellIdSnapFunction(2))
    assert len(coarse) < 5


def test_snapped_boolean_ops_stay_valid():
    # Near-degenerate shared boundary: the right edge of A and left edge
    # of B differ by ~1e-7 degrees.  After snapping both to E5 they share
    # the boundary exactly, and boolean ops produce valid polygons.
    from s2geometry_spark.kernel import booleans as B
    from s2geometry_spark.kernel.validation import find_polygon_validation_error

    a = parse_polygon("0:0, 0:1.0000001, 1:1, 1:0")
    b = parse_polygon("0:1.00000004, 0:2, 1:2, 1:0.99999998")
    snap = IntLatLngSnapFunction(5)
    sa = snap_polygon(a, snap)
    sb = snap_polygon(b, snap)
    # the shared boundary is now bit-identical
    u = B.union(sa, sb)
    i = B.intersection(sa, sb)
    assert find_polygon_validation_error(u) is None
    for loop in u.loops:
        assert len(loop.vertices) >= 3
    # disjoint-interior squares sharing an edge: union is one loop
    assert len(u.loops) == 1
    assert i.is_empty or all(len(l.vertices) >= 3 for l in i.loops)


class TestEdgePhase:
    """SnapEdge semantics: edges split at the sites whose Voronoi
    regions they cross (s2builder.cc:1162-1240, general position)."""

    def test_edge_splits_at_on_edge_vertex(self):
        from s2geometry_spark.kernel.builder import snap_polylines_with_edges
        from s2geometry_spark.kernel.contains import parse_points

        long_line = parse_points("0:0, 0:10")
        crossing = parse_points("-1:5, 0:5, 1:5")  # vertex exactly on the edge
        snap = IdentitySnapFunction(math.radians(0.01))
        out = snap_polylines_with_edges([long_line, crossing], snap)
        # the long edge now passes through the 0:5 site, in order
        chain = out[0]
        assert len(chain) == 3
        mid = _pt(0, 5)
        assert float(((chain[1] - mid) ** 2).sum()) < 1e-20
        # order along the edge preserved (lng increasing)
        from s2geometry_spark.kernel.coords import xyz_to_latlng

        lngs = [float(xyz_to_latlng(*p)[1]) for p in chain]
        assert lngs == sorted(lngs)

    def test_multiple_on_edge_sites_in_order(self):
        from s2geometry_spark.kernel.builder import snap_polylines_with_edges
        from s2geometry_spark.kernel.contains import parse_points
        from s2geometry_spark.kernel.coords import xyz_to_latlng

        line = parse_points("0:0, 0:20")
        marks = parse_points("0:15, 0:5, 0:10")  # unsorted along the line
        snap = IdentitySnapFunction(math.radians(0.01))
        out = snap_polylines_with_edges([line, marks], snap)
        lngs = [round(float(xyz_to_latlng(*p)[1]), 6) for p in out[0]]
        assert lngs == [0.0, 5.0, 10.0, 15.0, 20.0]

    def test_far_vertices_do_not_split(self):
        from s2geometry_spark.kernel.builder import snap_polylines_with_edges
        from s2geometry_spark.kernel.contains import parse_points

        line = parse_points("0:0, 0:10")
        far = parse_points("2:5, 3:5")  # 2° away, snap radius 0.01°
        snap = IdentitySnapFunction(math.radians(0.01))
        out = snap_polylines_with_edges([line, far], snap)
        assert len(out[0]) == 2

    def test_chain_sites_within_edge_radius(self):
        """Every chain site lies within the snap radius of its edge and
        consecutive coverage intervals overlap (continuity)."""
        import numpy as np

        from s2geometry_spark.kernel.builder import snap_edge_chain
        from s2geometry_spark.kernel.contains import parse_points
        from s2geometry_spark.kernel.distance import point_edge_dist2

        rng = np.random.default_rng(9)
        x, y = parse_points("0:0, 0:8")
        # scatter sites near the edge
        from s2geometry_spark.kernel.coords import latlng_to_xyz

        lat = rng.uniform(-0.2, 0.2, 40)
        lng = rng.uniform(-1, 9, 40)
        sx, sy, sz = latlng_to_xyz(lat, lng)
        sites = np.stack([sx, sy, sz], -1)
        r = math.radians(0.3)
        chain = snap_edge_chain(x, y, sites, r)
        assert chain, "no chain despite nearby sites"
        d2 = point_edge_dist2(sites[chain], x[None], y[None])[:, 0]
        assert (d2 <= (2 * math.sin(r / 2)) ** 2 * (1 + 1e-6)).all()
        # chain order: projections onto the edge proceed monotonically
        t_hat = y - x * float(x @ y)
        t_hat = t_hat / np.linalg.norm(t_hat)
        params = [
            math.atan2(float(sites[c] @ t_hat), float(sites[c] @ x))
            for c in chain
        ]
        assert params == sorted(params)


def test_min_edge_vertex_separation_site():
    """MinEdgeVertexSeparation (s2builder_test.cc:233-259): snapping the
    skinny right triangle with 0.5° Identity snap collapses half the
    long leg onto the diagonal, and AddExtraSites inserts a separation
    site — the reference expects it at 4.00021862252687:0."""
    from s2geometry_spark.kernel.builder import snap_polylines_with_separation
    from s2geometry_spark.kernel.coords import xyz_to_latlng

    ring = parse_points(
        "0:0, 0:1, 1:.9, 2:.8, 3:.7, 4:.6, 5:.5, 6:.4, 7:.3, 8:.2, 9:.1, 10:0, 0:0"
    )
    snap = IdentitySnapFunction(math.radians(0.5))
    out = snap_polylines_with_separation([ring], snap)[0]
    sep = [
        (float(xyz_to_latlng(*p)[0]), float(xyz_to_latlng(*p)[1]))
        for p in out
        if 3.5 < float(xyz_to_latlng(*p)[0]) < 4.5
        and abs(float(xyz_to_latlng(*p)[1])) < 0.3
    ]
    assert len(sep) == 1, sep
    lat, lng = sep[0]
    assert abs(lat - 4.00021862252687) < 1e-9, lat
    assert abs(lng) < 1e-12, lng
    # and the overall shape matches the reference's expected polygon
    expected = parse_points(
        "0:0, 0:1, 1:.9, 2:.8, 3:.7, 4:.6, 5:.5, 4.00021862252687:0"
    )
    # chain contains every expected vertex (within 1e-9 chord)
    for e in expected:
        assert min(float(((p - e) ** 2).sum()) for p in out) < 1e-18


class TestMaxEdgeDeviation:
    """Port of the S2Builder.MaxEdgeDeviation property
    (s2builder_test.cc:261-322): after snapping, every snapped chain
    edge must stay within options.max_edge_deviation() of its input
    edge — long edges snapped to nearby sites get mid split sites."""

    def test_long_edge_split_keeps_deviation_bounded(self):
        import math

        import numpy as np

        from s2geometry_spark.kernel.builder import (
            IdentitySnapFunction,
            max_edge_deviation,
            snap_polylines_with_separation,
        )
        from s2geometry_spark.kernel.contains import parse_points
        from s2geometry_spark.kernel.distance import is_edge_b_near_edge_a

        snap = IdentitySnapFunction(math.radians(1.0))
        # the equator edge and a parallel 160°-long edge at lat 0.95°:
        # whichever snaps to the other's endpoints gets a snapped edge
        # bulging ~5.5° away from its input — far beyond the 1.1° budget
        a = parse_points("0:-80, 0:80")
        b = parse_points("0.95:-80, 0.95:80")
        out = snap_polylines_with_separation([a, b], snap)
        max_dev = max_edge_deviation(snap.snap_radius)
        for inp, chain in zip((a, b), out):
            assert len(chain) >= 2
            # extra mid sites must have been added on the deviating side
            for k in range(len(chain) - 1):
                assert is_edge_b_near_edge_a(
                    inp[0], inp[-1], chain[k], chain[k + 1], max_dev
                ), f"chain edge {k} deviates beyond max_edge_deviation"
        # at least one of the two chains needed splitting
        assert max(len(c) for c in out) > 2

    def test_near_antipodal_wrong_way_wrap(self):
        """The reference's randomized construction (deterministic seeds,
        SURVEY §5 note on absl streams), scaled to snap radius 1e-3: B
        is ~5e-4 from -A and C ~5e-4 from A, so AB frequently snaps to
        C and the snapped CB edge wraps the sphere arbitrarily — the
        split pass must bring the chain back within max_edge_deviation.
        (The reference runs this at 5e-16 using exact predicates; the
        double-precision coverage intervals here are sound down to
        ~1e-12 — documented scope.)"""
        import math

        import numpy as np

        from s2geometry_spark.kernel.builder import (
            IdentitySnapFunction,
            max_edge_deviation,
            snap_polylines_with_separation,
        )
        from s2geometry_spark.kernel.distance import is_edge_b_near_edge_a

        rng = np.random.default_rng(42)
        snap = IdentitySnapFunction(1e-3)
        n_effective = 0
        for _ in range(10):
            a = rng.normal(size=3)
            a /= np.linalg.norm(a)
            b = -a + 5e-4 * rng.normal(size=3)
            b /= np.linalg.norm(b)
            c = a + 5e-4 * rng.normal(size=3)
            c /= np.linalg.norm(c)
            out = snap_polylines_with_separation([np.stack([a, b]), c[None]], snap)
            chain = out[0]
            max_dev = max_edge_deviation(snap.snap_radius)
            for k in range(len(chain) - 1):
                assert is_edge_b_near_edge_a(
                    a, b, chain[k], chain[k + 1], max_dev
                )
            if len(chain) > 2:
                n_effective += 1
        assert n_effective >= 2  # reference requires ≥20% effective


def test_cellid_snap_min_edge_vertex_separation_bounds():
    """ADVICE item: the non-identity snap functions must use the
    reference bounds (s2builderutil_snap_functions.cc:157-201, 314-344),
    not the 0.5·r identity fallback — at the minimum snap radius the
    S2CellId bound is 0.565·kMinDiag(level), far below 0.5·r."""
    import math

    from s2geometry_spark.kernel import metrics
    from s2geometry_spark.kernel.builder import (
        IntLatLngSnapFunction,
        S2CellIdSnapFunction,
        min_edge_vertex_separation,
    )

    for level in (5, 10, 20):
        f = S2CellIdSnapFunction(level)
        got = min_edge_vertex_separation(f)
        assert got == 0.565 * metrics.MIN_DIAG.get_value(level)
        # larger-than-minimum snap radius: max of the three other bounds
        g = S2CellIdSnapFunction(level, 3 * f.snap_radius)
        vs = g.min_vertex_separation()
        want = max(
            0.397 * metrics.MIN_DIAG.get_value(level),
            0.219 * g.snap_radius,
            0.5 * (vs / g.snap_radius) * vs,
        )
        assert min_edge_vertex_separation(g) == want
    for exp in (1, 6):
        f = IntLatLngSnapFunction(exp)
        vs = f.min_vertex_separation()
        want = max(
            0.277 * math.radians(f._to_degrees),
            0.222 * f.snap_radius,
            0.5 * (vs / f.snap_radius) * vs,
        )
        assert min_edge_vertex_separation(f) == want


def test_separation_pass_with_cellid_snap_function():
    """Non-identity separation pass (ADVICE item): with
    S2CellIdSnapFunction the pass must converge within the budget and
    leave every non-chain site at least min_edge_vertex_separation()
    from every snapped chain edge."""
    import numpy as np

    from s2geometry_spark.kernel.builder import (
        S2CellIdSnapFunction,
        min_edge_vertex_separation,
        snap_polylines_with_separation,
    )
    from s2geometry_spark.kernel.contains import parse_points
    from s2geometry_spark.kernel.distance import point_edge_dist2

    snap = S2CellIdSnapFunction(10)
    # a long edge passing near (but not through) an isolated vertex
    line = parse_points("0:0, 0:5")
    lone = parse_points("0.02:2.5")
    out = snap_polylines_with_separation([line, lone], snap)
    chain = out[0]
    assert len(chain) >= 2
    min_sep = min_edge_vertex_separation(snap)
    s = 2 * np.sin(0.5 * min_sep)
    min_sep2 = s * s
    # a 1-vertex polyline contributes a site but no snapped edges
    site = snap.snap(lone)[0]
    on_chain = any(np.all(site == v) for v in chain)
    if not on_chain:
        d2 = point_edge_dist2(site[None], chain[:-1], chain[1:])[0]
        assert (d2 >= min_sep2 * (1 - 1e-9)).all()


class TestExactVoronoiPredicates:
    """kernel/voronoi.py — exact GetVoronoiSiteExclusion semantics
    (round-3 directive 4): ties below double precision resolve by the
    reference's symbolic rules, consistently under operand permutation."""

    def test_exact_mirror_tie_resolves_symbolically(self):
        """Edge on the equator; B = A mirrored across z=0 (EXACT in
        doubles), so the Voronoi boundary of {A, B} coincides with the
        edge exactly — the pedestal perturbation must declare the
        lexicographically larger site closer (s2predicates.cc
        SymbolicCompareDistances) and exclude the other."""
        import numpy as np

        from s2geometry_spark.kernel import voronoi as V
        from s2geometry_spark.kernel.coords import latlng_to_xyz

        x0 = np.array([1.0, 0.0, 0.0])
        x1 = np.array(latlng_to_xyz(np.float64(0.0), np.float64(8.0)))
        a = np.array(latlng_to_xyz(np.float64(0.1), np.float64(4.0)))
        b = np.array([a[0], a[1], -a[2]])  # exact reflection
        assert V.compare_distances(x0, a, b) == (-1 if tuple(a) > tuple(b) else 1)
        closer, farther = (a, b) if tuple(a) > tuple(b) else (b, a)
        r = math.radians(0.5)
        assert V.voronoi_site_exclusion(closer, farther, x0, x1, r) == V.SECOND

    def test_sub_picometre_separation_snaps_deterministically(self):
        """Two sites ~1e-13 rad apart along the edge: both keep nonempty
        Voronoi slivers (neither coverage interval contains the other),
        and the exact predicates order them identically regardless of
        input permutation — the sub-double-precision determinism the
        bisection could not guarantee.  A twin displaced PERPENDICULAR
        to the edge, by contrast, is properly contained and excluded."""
        import numpy as np

        from s2geometry_spark.kernel.builder import snap_edge_chain
        from s2geometry_spark.kernel.contains import parse_points
        from s2geometry_spark.kernel.coords import latlng_to_xyz

        x, y = parse_points("0:0, 0:8")
        base = np.array(latlng_to_xyz(np.float64(0.05), np.float64(4.0)))
        twin = base + np.array([0.0, 1e-13, 0.0])  # ~along the edge
        twin = twin / np.linalg.norm(twin)
        assert tuple(twin) != tuple(base)
        r = math.radians(0.5)
        seqs = []
        for sites in (np.stack([base, twin]), np.stack([twin, base])):
            chain = snap_edge_chain(x, y, sites, r)
            seqs.append([tuple(sites[c]) for c in chain])
        assert seqs[0] == seqs[1]
        assert 1 <= len(seqs[0]) <= 2

        # perpendicular twin: slightly farther from the whole edge →
        # its coverage interval is strictly contained → excluded
        perp = base + np.array([0.0, 0.0, 1e-13])
        perp = perp / np.linalg.norm(perp)
        for sites in (np.stack([base, perp]), np.stack([perp, base])):
            chain = snap_edge_chain(x, y, sites, r)
            assert [tuple(sites[c]) for c in chain] == [tuple(base)]

    def test_exclusion_antisymmetry_random(self):
        """FIRST/SECOND swap under operand exchange (with the required
        d(·,x0) ordering re-established), NEITHER is symmetric."""
        import numpy as np

        from s2geometry_spark.kernel import voronoi as V
        from s2geometry_spark.kernel.contains import parse_points
        from s2geometry_spark.kernel.coords import latlng_to_xyz

        rng = np.random.default_rng(17)
        x, y = parse_points("0:0, 0:6")
        r = math.radians(0.4)
        n_checked = 0
        for _ in range(40):
            lat = rng.uniform(-0.3, 0.3, 2)
            lng = rng.uniform(0.0, 6.0, 2)
            sx, sy, sz = latlng_to_xyz(lat, lng)
            s = np.stack([sx, sy, sz], -1)
            a, b = s[0], s[1]
            if V.compare_distances(x, a, b) > 0:
                a, b = b, a
            res = V.voronoi_site_exclusion(a, b, x, y, r)
            n_checked += 1
            # re-run with roles swapped via the mirrored edge direction:
            # d(·, y) ordering makes b the first site along (y, x)
            if V.compare_distances(y, b, a) <= 0:
                res2 = V.voronoi_site_exclusion(b, a, y, x, r)
                swap = {V.FIRST: V.SECOND, V.SECOND: V.FIRST, V.NEITHER: V.NEITHER}
                assert res2 == swap[res], (lat, lng)
        assert n_checked == 40


class TestSnapFunctionMatrix:
    """Deterministic rows of the snap-function matrix
    (s2builderutil_snap_functions_test.cc:76-135)."""

    def test_cellid_level_to_from_snap_radius(self):
        # s2builderutil_snap_functions_test.cc:76-89
        for level in range(31):
            radius = S2CellIdSnapFunction.min_snap_radius_for_level(level)
            assert S2CellIdSnapFunction.level_for_max_snap_radius(radius) == level
            assert S2CellIdSnapFunction.level_for_max_snap_radius(
                0.999 * radius
            ) == min(level + 1, 30)
        assert S2CellIdSnapFunction.level_for_max_snap_radius(5.0) == 0
        assert S2CellIdSnapFunction.level_for_max_snap_radius(1e-30) == 30

    def test_cellid_snap_point_fixed_points(self):
        # s2builderutil_snap_functions_test.cc:91-104: cell centers are
        # fixed points of snapping at their own level (seeded rng points
        # per FIXTURES.md policy).
        import numpy as np

        from s2geometry_spark.kernel.coords import latlng_to_xyz

        rng = np.random.default_rng(42)
        for level in range(0, 31, 3):
            f = S2CellIdSnapFunction(level)
            lat = rng.uniform(-80, 80, 50)
            lng = rng.uniform(-180, 180, 50)
            x, y, z = latlng_to_xyz(lat, lng)
            p = np.stack([x, y, z], -1)
            centers = f.snap(p)
            again = f.snap(centers)
            assert np.array_equal(centers, again), level

    def test_intlatlng_exponent_to_from_snap_radius(self):
        # s2builderutil_snap_functions_test.cc:105-121
        for exponent in range(
            IntLatLngSnapFunction.MIN_EXPONENT, IntLatLngSnapFunction.MAX_EXPONENT + 1
        ):
            radius = IntLatLngSnapFunction.min_snap_radius_for_exponent(exponent)
            assert (
                IntLatLngSnapFunction.exponent_for_max_snap_radius(radius) == exponent
            )
            assert IntLatLngSnapFunction.exponent_for_max_snap_radius(
                0.999 * radius
            ) == min(exponent + 1, IntLatLngSnapFunction.MAX_EXPONENT)
        assert (
            IntLatLngSnapFunction.exponent_for_max_snap_radius(5.0)
            == IntLatLngSnapFunction.MIN_EXPONENT
        )
        assert (
            IntLatLngSnapFunction.exponent_for_max_snap_radius(1e-30)
            == IntLatLngSnapFunction.MAX_EXPONENT
        )

    def test_intlatlng_snap_point_fixed_points(self):
        # s2builderutil_snap_functions_test.cc:122-135: points already on
        # the E5/E6/E7 grid are fixed points of snapping.
        import numpy as np

        from s2geometry_spark.kernel.coords import latlng_to_xyz

        rng = np.random.default_rng(42)
        lat = rng.uniform(-89, 89, 100)
        lng = rng.uniform(-180, 180, 100)
        x, y, z = latlng_to_xyz(lat, lng)
        p = np.stack([x, y, z], -1)
        for exponent in (5, 6, 7):
            f = IntLatLngSnapFunction(exponent)
            on_grid = f.snap(p)
            again = f.snap(on_grid)
            assert np.array_equal(on_grid, again), exponent
