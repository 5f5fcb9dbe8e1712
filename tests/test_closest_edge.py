"""S2ClosestEdgeQuery golden fixtures (FIXTURES.md §5) + properties."""

import math

import numpy as np

from s2geometry_spark.kernel.closest_edge import find_closest_edges, parse_index
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.distance import chord2, point_edge_dist2

RNG = np.random.default_rng(42)
INDEX = "# 0:0, 0:5, 5:5, 5:0 # 0:10, 0:15, 5:15, 5:10"


def test_target_point_inside_indexed_polygon():
    """s2closest_edge_query_test.cc:197-214: exactly one result —
    shape 1 (the polygon), edge -1, distance 0, is_interior."""
    shapes = parse_index(INDEX)
    assert len(shapes) == 2
    assert shapes[0].dim == 1 and shapes[1].dim == 2
    target = parse_points("2:12")
    results = find_closest_edges(
        shapes, target, k=10,
        max_distance_rad=math.radians(1), include_interiors=True,
    )[0]
    assert len(results) == 1
    sid, eid, d2 = results[0]
    assert (sid, eid, d2) == (1, -1, 0.0)


def test_target_point_outside_indexed_polygon():
    """s2closest_edge_query_test.cc:449-461: target inside the polyline
    loop (no interior) → no results."""
    shapes = parse_index(INDEX)
    target = parse_points("2:2")
    results = find_closest_edges(
        shapes, target, k=10,
        max_distance_rad=math.radians(1), include_interiors=True,
    )[0]
    assert results == []


def test_distance_equal_to_limit_query_semantics():
    """s2closest_edge_query_test.cc:135-159 via the query layer: the
    max_distance bound is exclusive."""
    shapes = parse_index("23:12 # #")
    t2 = parse_points("47:11")
    exact = chord2(t2[0], parse_points("23:12")[0])
    exact_rad = 2 * math.asin(0.5 * math.sqrt(exact))
    # IsDistanceLess(limit) == False at the exact limit...
    res = find_closest_edges(shapes, t2, k=1, max_distance_rad=exact_rad)
    assert res[0] == []
    # ...but True for any larger limit
    res2 = find_closest_edges(
        shapes, t2, k=1, max_distance_rad=math.nextafter(exact_rad, 4.0)
    )
    assert len(res2[0]) == 1


def test_knn_edges_vs_brute_force():
    # random polylines; top-k edges match an independent argsort oracle
    for _ in range(5):
        lats = RNG.uniform(-60, 60, 12)
        lngs = RNG.uniform(-170, 170, 12)
        line = ", ".join(f"{a}:{b}" for a, b in zip(lats, lngs))
        shapes = parse_index(f"# {line} #")
        targets = np.stack(
            __import__(
                "s2geometry_spark.kernel.coords", fromlist=["latlng_to_xyz"]
            ).latlng_to_xyz(RNG.uniform(-80, 80, 20), RNG.uniform(-180, 180, 20)),
            -1,
        )
        got = find_closest_edges(shapes, targets, k=3)
        d2 = point_edge_dist2(targets, shapes[0].edges_c, shapes[0].edges_d)
        for i in range(len(targets)):
            want = np.sort(d2[i])[:3]
            have = [d for (_, _, d) in got[i]]
            np.testing.assert_allclose(have, want, rtol=1e-15)


def test_target_polygon_containing_indexed_points():
    """s2closest_edge_query_test.cc:463-480: 4 indexed points, target =
    polyline loop + polygon; only the 2 points in the polygon (and any
    point within 1° of target edges) are returned with distance 0."""
    from s2geometry_spark.kernel.closest_edge import closest_to_shape_targets

    pts = parse_points("2:2, 3:3, 1:11, 3:13")
    target = parse_index(INDEX)
    res = closest_to_shape_targets(
        pts, target, max_distance_rad=math.radians(1), include_interiors=True
    )
    zero = {i for i, d in res if d == 0.0}
    assert zero == {2, 3}  # the two points inside the polygon
    # 2:2 and 3:3 are inside the polyline LOOP (no interior) and > 1° from
    # its edges? 2:2 is 1°+ from all polyline edges... ensure none report 0
    assert all(i in (2, 3) or d > 0 for i, d in res)


def test_furthest_edges():
    from s2geometry_spark.kernel.closest_edge import find_furthest_edges

    shapes = parse_index("# 0:0, 0:10 #")
    t = parse_points("0:5, 0:-170")
    res = find_furthest_edges(shapes, t, k=1)
    # for 0:5 furthest vertex is either end (5°); for 0:-170 it's 0:10 (180°)
    d_near = res[0][0][2]
    d_far = res[1][0][2]
    assert d_far > d_near
    assert abs(d_far - chord2(t[1], parse_points("0:10")[0])) < 1e-15


def test_furthest_edge_interior_maximum():
    """Edge passing near the target's antipode: the true maximum distance
    is attained in the edge INTERIOR (s2edge_distances.cc:236-249
    antipode-reflection branch), strictly greater than both vertex
    distances — the case the vertex-only formula got wrong."""
    import numpy as np

    from s2geometry_spark.kernel.closest_edge import find_furthest_edges, parse_index

    # target at 0:0; its antipode is 0:180.  Edge from 5:170 to -5:-170
    # passes near the antipode but its vertices stay ~9° away from it.
    shapes = parse_index("# 5:170, -5:-170 #")
    t = parse_points("0:0")
    res = find_furthest_edges(shapes, t, k=1)
    d2 = res[0][0][2]
    # brute force: sample the edge densely via slerp
    a, b = shapes[0].edges_c[0], shapes[0].edges_d[0]
    omega = math.acos(max(-1.0, min(1.0, float(a @ b))))
    best = 0.0
    for i in range(20001):
        f = i / 20000
        p = (math.sin((1 - f) * omega) * a + math.sin(f * omega) * b) / math.sin(omega)
        p = p / np.linalg.norm(p)
        best = max(best, float(((t[0] - p) ** 2).sum()))
    assert abs(d2 - best) < 1e-7, (d2, best)
    # strictly greater than both vertex distances
    dva = float(((t[0] - a) ** 2).sum())
    dvb = float(((t[0] - b) ** 2).sum())
    assert d2 > max(dva, dvb) + 1e-4


def test_true_distance_less_than_chord_angle_distance():
    """s2closest_edge_query_test.cc:160-182: the S1ChordAngle distance
    between the pinned pair is ~4 ulps above the TRUE distance; the
    plain comparisons reject the 4-ulp-tighter limit but the
    CONSERVATIVE comparison still accepts it."""
    import numpy as np

    from s2geometry_spark.kernel.distance import chord2, chord2_predecessor
    from s2geometry_spark.kernel.point_index import (
        ClosestPointQuery,
        PointIndex,
        PointTarget,
    )
    from s2geometry_spark.kernel.voronoi import compare_point_distance_chord2

    p0 = np.array([0.78516762584829192, -0.50200400690845970,
                   -0.36263449417782678])
    p1 = np.array([0.78563011732429433, -0.50187655940493503,
                   -0.36180828883938054])
    d2 = float(chord2(p0, p1))
    limit2 = d2
    for _ in range(4):
        limit2 = float(chord2_predecessor(limit2))
    # the exact predicate confirms the true distance is BELOW the limit
    assert compare_point_distance_chord2(p0, p1, limit2) < 0
    index = PointIndex()
    index.add(p0, None)
    q = ClosestPointQuery(index)
    t = PointTarget(p1)
    assert not q.is_distance_less(t, limit2)
    assert not q.is_distance_less_or_equal(t, limit2)
    assert q.is_conservative_distance_less_or_equal(t, limit2)


def test_full_polygon_targets():
    """s2closest_edge_query_test.cc:551-574 (+ the furthest-edge
    mirror): distances to a FULL polygon target — infinity from an
    empty index, zero from any non-empty index."""
    from s2geometry_spark.kernel.closest_edge import (
        find_closest_edges,
        parse_index,
    )

    full = parse_index("# # full")
    # empty index: no results (infinity)
    assert find_closest_edges([], np.array([[1.0, 0, 0]]), 1) == [[]]
    # a full polygon CONTAINS any target point: interior hit at 0
    res = find_closest_edges(
        full, np.array([[1.0, 0, 0]]), 1, include_interiors=True)
    assert res[0] and res[0][0][2] == 0.0 and res[0][0][1] == -1
