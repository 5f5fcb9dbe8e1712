"""Port of the remaining s2closest_edge_query_test.cc and
s2furthest_edge_query_test.cc cases (shape-index targets, full/empty
polygon targets, conservative predicates, visitor early-break,
random-index furthest harnesses).

Reference citations inline per test.
"""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.closest_edge import (
    Shape,
    find_closest_edges,
    find_furthest_edges,
    furthest_edges_to_shape_target,
    parse_index,
    shape_index_target_distance2,
    shape_index_target_max_distance2,
    visit_closest_edges,
)
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.distance import (
    angle_to_chord2,
    chord2,
    chord2_predecessor,
    chord2_successor,
    get_update_min_distance_max_error,
    update_min_distance,
)
from s2geometry_spark.kernel.fractal import Fractal, random_point, sample_cap_point
from s2geometry_spark.kernel.point_index import ClosestPointQuery, PointIndex, PointTarget
from s2geometry_spark.kernel.voronoi import compare_point_distance_chord2


def _pt(s: str) -> np.ndarray:
    return parse_points(s)[0]


# ---------------------------------------------------------------- options


def test_options_s1angle_setters_closest_and_furthest():
    """OptionsS1AngleSetters (s2closest_edge_query_test.cc:117-133 and
    s2furthest_edge_query_test.cc:106-122): the S1Angle and S1ChordAngle
    option setters must express the same limit.  Our options are plain
    squared chords, so the contract is that the two construction routes —
    angle → chord2 and chord-angle ctor 4·sin²(θ/2) — agree bit-for-bit,
    and that the inclusive/conservative derivations (Successor /
    PlusError+Successor, s2closest_edge_query.h:440-470) are applied to
    both identically."""
    deg1 = math.radians(1.0)
    via_angle = float(angle_to_chord2(deg1))
    via_chord_ctor = 4.0 * math.sin(0.5 * deg1) ** 2
    assert via_angle == via_chord_ctor
    # inclusive: limit.Successor()
    assert float(chord2_successor(via_angle)) == float(
        chord2_successor(via_chord_ctor)
    )
    # conservative: limit.PlusError(GetUpdateMinDistanceMaxError(limit)).Successor()
    lim_a = float(
        chord2_successor(via_angle + get_update_min_distance_max_error(via_angle))
    )
    lim_c = float(
        chord2_successor(
            via_chord_ctor + get_update_min_distance_max_error(via_chord_ctor)
        )
    )
    assert lim_a == lim_c


# ------------------------------------------------- conservative predicates


def test_true_distance_less_than_s1chordangle_distance():
    """s2closest_edge_query_test.cc:160-182: the S1ChordAngle distance is
    ~4 ulps greater than the true distance for this worst pair;
    IsConservativeDistanceLessOrEqual must still accept."""
    p0 = np.array([0.78516762584829192, -0.50200400690845970, -0.36263449417782678])
    p1 = np.array([0.78563011732429433, -0.50187655940493503, -0.36180828883938054])
    dist1 = float(chord2(p0[None], p1[None])[0])
    limit = dist1
    for _ in range(4):
        limit = float(chord2_predecessor(limit))
    # true distance is strictly below the 4-ulp-reduced limit (exact check)
    assert compare_point_distance_chord2(p0, p1, limit) < 0

    index = PointIndex()
    index.add(p0, 0)
    query = ClosestPointQuery(index)
    target1 = PointTarget(p1)
    assert not query.is_distance_less(target1, limit)
    assert not query.is_distance_less_or_equal(target1, limit)
    assert query.is_conservative_distance_less_or_equal(target1, limit)


def test_furthest_true_distance_greater_than_s1chordangle_distance():
    """s2furthest_edge_query_test.cc:159-181: the max-distance analog —
    the chord-angle distance is ~3 ulps above the true distance;
    IsConservativeDistanceGreaterOrEqual must still accept.  The
    furthest predicates mirror s2furthest_edge_query.h:298-320:
    greater ⇔ d > limit; greater-or-equal ⇔ d > limit.Predecessor();
    conservative ⇔ d > (limit − UpdateMinDistanceMaxError).Predecessor()."""
    p0 = np.array([0.72362949088190598, -0.39019820403414807, -0.56930283812266336])
    p1 = np.array([0.54383822931548842, 0.758981734255934404, 0.35803171284238039])
    # GetMaxDistanceToEdge(p0, p1, p1) via the antipode identity
    dist1 = 4.0 - update_min_distance(-p0, p1, p1)
    limit = dist1
    for _ in range(3):
        limit = float(chord2_successor(limit))
    # true distance exceeds the 3-ulp-raised limit (exact check)
    assert compare_point_distance_chord2(p0, p1, limit) > 0

    d = 4.0 - update_min_distance(-p1, p0, p0)
    assert not d > limit  # IsDistanceGreater
    assert not d > float(chord2_predecessor(limit))  # IsDistanceGreaterOrEqual
    conservative_min = float(
        chord2_predecessor(limit - get_update_min_distance_max_error(limit))
    )
    assert d > conservative_min  # IsConservativeDistanceGreaterOrEqual


def test_furthest_distance_equal_to_limit():
    """s2furthest_edge_query_test.cc:133-157: predicate behavior when the
    distance exactly equals the limit."""
    p0, p1 = _pt("23:12"), _pt("47:11")
    # antipodal target: distance is exactly Straight (4.0)
    d0 = 4.0 - update_min_distance(p0, p0, p0)  # target -p0 → reflect = p0
    assert d0 == 4.0
    dist_max = 4.0
    assert not d0 > dist_max
    assert d0 > float(chord2_predecessor(dist_max))
    assert d0 > float(
        chord2_predecessor(dist_max - get_update_min_distance_max_error(dist_max))
    )
    # non-maximal distance, exactly equal to the limit
    d1 = 4.0 - update_min_distance(p1, p0, p0)  # target -p1 → reflect = p1
    assert not d1 > d1
    assert d1 > float(chord2_predecessor(d1))


# -------------------------------------------------------- query semantics


def test_reuse_of_query():
    """s2closest_edge_query_test.cc:184-194 (b/71646017): result
    de-duplication state must reset between queries — two identical
    FindClosestEdges calls return identical results."""
    index = parse_index("2:2 # #")
    target = parse_index("## 0:0, 0:5, 5:5, 5:0")
    r1 = shape_index_target_distance2(index, target)
    r2 = shape_index_target_distance2(index, target)
    assert r1 == r2
    e1 = find_closest_edges(index, _pt("0:0")[None], k=4)
    e2 = find_closest_edges(index, _pt("0:0")[None], k=4)
    assert e1 == e2


def test_can_break_from_brute_force():
    """VisitClosestEdgesTest.CanBreakFromBruteForce
    (s2closest_edge_query_test.cc:345-355): a visitor that returns False
    immediately sees exactly one result."""
    index = parse_index("## 1:1, 1:-1, -1:-1, -1:1 | 2:2, 2:-2, -2:-2, -2:2")
    n = visit_closest_edges(
        index, _pt("0:0"), lambda sid, eid, d2: False, include_interiors=False
    )
    assert n == 1


def test_can_break_from_normal_iteration():
    """VisitClosestEdgesTest.CanBreakFromNormalIteration
    (s2closest_edge_query_test.cc:357-368): same early-break contract on
    a fractal-loop index (the reference's FractalQuery fixture)."""
    rng = np.random.RandomState(42)
    f = Fractal(rng)
    f.set_max_level(6)
    verts = f.make_vertices(np.eye(3), 0.1)
    shape = Shape(0, 2, verts, np.roll(verts, -1, axis=0))
    n = visit_closest_edges(
        [shape], _pt("0:0"), lambda sid, eid, d2: False, include_interiors=False
    )
    assert n == 1


def test_closest_full_s2polygon_target():
    """S2ClosestEdgeQuery.FullS2PolygonTarget
    (s2closest_edge_query_test.cc:551-573): distances to a full-polygon
    target — empty index → Infinity, point/full index → Zero."""
    empty_index = parse_index("# # empty")
    point_index = parse_index("1:1 # #")
    full_index = parse_index("# # full")
    target = parse_index("# # full")
    assert shape_index_target_distance2(empty_index, target) == math.inf
    assert shape_index_target_distance2(point_index, target) == 0.0
    assert shape_index_target_distance2(full_index, target) == 0.0


# ----------------------------------------------------- furthest targets


def test_furthest_empty_polygon_target():
    """s2furthest_edge_query_test.cc:285-304: empty target → Negative
    from every index (empty, point, full)."""
    target = parse_index("# # empty")
    for idx in ("# # empty", "1:1 # #", "# # full"):
        assert shape_index_target_max_distance2(parse_index(idx), target) == -1.0


@pytest.mark.parametrize("full_kind", ["lax", "s2"])
def test_furthest_full_polygon_target(full_kind):
    """FullLaxPolygonTarget / FullS2PolygonTarget
    (s2furthest_edge_query_test.cc:306-351): full target → Negative from
    an empty index, Straight from point and full indexes.  (Our engine
    has one full-polygon representation, exercised for both reference
    spellings.)"""
    target = parse_index("# # full")
    assert shape_index_target_max_distance2(parse_index("# # empty"), target) == -1.0
    assert shape_index_target_max_distance2(parse_index("1:1 # #"), target) == 4.0
    assert shape_index_target_max_distance2(parse_index("# # full"), target) == 4.0


def test_furthest_check_settings():
    """s2furthest_edge_query_test.cc:352-363: target option accessors.
    Our ShapeIndexTarget options are plain keyword arguments; the
    contract worth keeping is that include-interiors defaults to the
    reference's set value and actually changes the answer."""
    point_index = parse_index("1:1 # #")
    target = parse_index("# # full")
    with_int = shape_index_target_max_distance2(
        point_index, target, include_interiors=True
    )
    without = shape_index_target_max_distance2(
        point_index, target, include_interiors=False
    )
    assert with_int == 4.0
    assert without == -1.0  # full polygon has no edges


def test_target_polygon_containing_indexed_points():
    """s2furthest_edge_query_test.cc:236-256: four indexed points, a
    two-shape target (polyline loop + polygon), no min_distance: all
    four points return, ordered by decreasing distance — 2:2 first
    (furthest, to 5:15), then 3:12 (to 0:0)."""
    index = parse_index("2:2 | 4:4 | 1:11 | 3:12 # #")
    target = parse_index("# 0:0, 0:5, 5:5, 5:0 # 0:10, 0:15, 5:15, 5:10")
    results = furthest_edges_to_shape_target(index, target)
    assert len(results) == 4
    assert results[0][2] != 0.0
    assert (results[0][0], results[0][1]) == (0, 0)  # 2:2
    assert results[1][2] != 0.0
    assert (results[1][0], results[1][1]) == (0, 3)  # 3:12


def test_antipodal_polygon_containing_indexed_points():
    """s2furthest_edge_query_test.cc:258-283: points antipodal to the
    target polygon's interior are at exactly Straight distance; the
    min_distance=179° filter keeps only those two, ordered by edge id."""
    pts = parse_points("2:2, 3:3, 1:11, 3:13")
    anti = Shape(0, 0, -pts, -pts)
    target = parse_index("# 0:0, 0:5, 5:5, 5:0 # 0:10, 0:15, 5:15, 5:10")
    results = furthest_edges_to_shape_target(
        [anti], target, min_distance_rad=math.radians(179)
    )
    assert len(results) == 2
    assert results[0] == (0, 2, 4.0)  # 1:11
    assert results[1] == (0, 3, 4.0)  # 3:13


# -------------------------------------- random-index furthest harnesses


def _check_furthest_against_sampling(shapes, query_pts, rng):
    """TestFindFurthestEdges analog (s2furthest_edge_query_test.cc:
    420-470): validate find_furthest_edges against an independent
    dense sampling of each edge (the reference validates optimized vs
    brute force; our kernel is single-tier, so the independent check is
    a sampled evaluation of max_x∈edge chord2(target, x))."""
    results = find_furthest_edges(shapes, query_pts, k=3)
    all_edges = [
        (s.shape_id, e, s.edges_c[e], s.edges_d[e])
        for s in shapes
        for e in range(len(s.edges_c))
    ]
    t = np.linspace(0.0, 1.0, 33)[:, None]
    for qi, q in enumerate(np.asarray(query_pts, float).reshape(-1, 3)):
        got = results[qi]
        assert len(got) == min(3, len(all_edges))
        # distances nonincreasing
        ds = [d for _, _, d in got]
        assert all(ds[i] >= ds[i + 1] for i in range(len(ds) - 1))
        # reported distance matches a dense sample of the winning edge
        sid, eid, d2 = got[0]
        c = next(c for s, e, c, dd in all_edges if (s, e) == (sid, eid))
        d = next(dd for s, e, cc, dd in all_edges if (s, e) == (sid, eid))
        seg = c[None, :] * (1 - t) + d[None, :] * t
        seg = seg / np.linalg.norm(seg, axis=1, keepdims=True)
        sampled = float(chord2(q[None], seg).max())
        assert d2 >= sampled - 1e-12
        assert d2 <= sampled + 1e-3  # sampling is coarse; d2 is exact
        # no other edge beats the winner (sampled lower bounds)
        for s, e, cc, dd in all_edges:
            seg2 = cc[None, :] * (1 - t) + dd[None, :] * t
            seg2 = seg2 / np.linalg.norm(seg2, axis=1, keepdims=True)
            assert d2 >= float(chord2(q[None], seg2).max()) - 1e-12


def test_furthest_circle_edges():
    """S2FurthestEdgeQuery.CircleEdges (s2furthest_edge_query_test.cc:538):
    regular-loop indexes validated against independent sampling."""
    from s2geometry_spark.kernel.fractal import make_regular_points

    rng = np.random.RandomState(7)
    for _ in range(5):
        center = random_point(rng)
        verts = make_regular_points(center, 10.0 / 6371.0, 24)
        shape = Shape(0, 2, verts, np.roll(verts, -1, axis=0))
        qs = np.stack([sample_cap_point(rng, center, 20.0 / 6371.0) for _ in range(4)])
        _check_furthest_against_sampling([shape], qs, rng)


def test_furthest_fractal_edges():
    """S2FurthestEdgeQuery.FractalEdges (s2furthest_edge_query_test.cc:545)."""
    rng = np.random.RandomState(11)
    for _ in range(3):
        center = random_point(rng)
        f = Fractal(rng)
        f.set_max_level(4)
        from s2geometry_spark.kernel.fractal import frame_at

        verts = f.make_vertices(frame_at(rng, center), 10.0 / 6371.0)
        shape = Shape(0, 2, verts, np.roll(verts, -1, axis=0))
        qs = np.stack([sample_cap_point(rng, center, 20.0 / 6371.0) for _ in range(3)])
        _check_furthest_against_sampling([shape], qs, rng)


def test_furthest_point_cloud_edges():
    """S2FurthestEdgeQuery.PointCloudEdges (s2furthest_edge_query_test.cc:552)."""
    rng = np.random.RandomState(13)
    for _ in range(3):
        center = random_point(rng)
        pts = np.stack(
            [sample_cap_point(rng, center, 10.0 / 6371.0) for _ in range(30)]
        )
        shape = Shape(0, 0, pts, pts)
        qs = np.stack([sample_cap_point(rng, center, 20.0 / 6371.0) for _ in range(3)])
        _check_furthest_against_sampling([shape], qs, rng)
