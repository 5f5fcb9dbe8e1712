"""kNN ring-expansion join vs brute-force oracle + golden distance fixtures."""

import math

import numpy as np
import pandas as pd
import pytest

from s2geometry_spark.kernel import distance as D
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.operators.indexing import index_points
from s2geometry_spark.operators.knn import brute_force_knn, knn_join
from s2geometry_spark.sources.pages import extract_mentions, synthesize_pages

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def points(spark):
    pages = synthesize_pages(spark, 600, partitions=4)
    return index_points(
        extract_mentions(pages), level=30, with_xyz=True
    ).cache()


def _queries(n):
    # half near hotspots (dense), half uniform (sparse → ring growth)
    lat = np.concatenate([40.7 + RNG.uniform(-1, 1, n // 2), RNG.uniform(-80, 80, n - n // 2)])
    lng = np.concatenate([-74.0 + RNG.uniform(-1, 1, n // 2), RNG.uniform(-179, 179, n - n // 2)])
    return pd.DataFrame(
        {"query_id": [f"q{i}" for i in range(n)], "lat": lat, "lng": lng}
    )


def test_knn_matches_brute_force(spark, points):
    q = _queries(12)
    got = (
        knn_join(q, points, k=5, level=8)
        .select("query_id", "url", "mention_idx", "chord2")
        .toPandas()
        .sort_values(["query_id", "chord2", "url", "mention_idx"])
        .reset_index(drop=True)
    )
    pts_pdf = points.select("url", "mention_idx", "lat", "lng").toPandas()
    want = (
        brute_force_knn(q, pts_pdf, k=5)
        .sort_values(["query_id", "chord2", "url", "mention_idx"])
        .reset_index(drop=True)
    )
    assert (got.groupby("query_id").size() == 5).all()
    pd.testing.assert_frame_equal(
        got[["query_id", "url", "mention_idx"]],
        want[["query_id", "url", "mention_idx"]],
        check_dtype=False,
    )
    np.testing.assert_allclose(got.chord2.to_numpy(), want.chord2.to_numpy(), rtol=1e-12)


def test_knn_radius_limit(spark, points):
    q = _queries(8)
    radius = 0.02  # ~127 km
    got = (
        knn_join(q, points, k=1000, level=8, max_distance_rad=radius)
        .select("query_id", "url", "mention_idx", "chord2")
        .toPandas()
    )
    pts_pdf = points.select("url", "mention_idx", "lat", "lng").toPandas()
    want = brute_force_knn(q, pts_pdf, k=1000, max_distance_rad=radius)
    got_k = got.sort_values(["query_id", "url", "mention_idx"]).reset_index(drop=True)
    want_k = want[["query_id", "url", "mention_idx"]].sort_values(
        ["query_id", "url", "mention_idx"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_k[["query_id", "url", "mention_idx"]], want_k, check_dtype=False
    )
    limit2 = 4 * math.sin(radius / 2) ** 2
    assert (got.chord2 <= limit2).all()


# ------------------------- golden distance fixtures (FIXTURES.md §5) -------
def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.array([lat], float), np.array([lng], float))
    return np.array([x[0], y[0], z[0]])


def test_distance_equal_to_limit():
    """s2closest_edge_query_test.cc:135-159: strict-vs-nonstrict compares
    at the exact limit distance."""
    p = _pt(23, 12)
    q1 = _pt(23, 12)
    q2 = _pt(47, 11)
    # distance p→q1 is zero
    d0 = D.chord2(p, q1)
    assert not (d0 < 0.0)  # IsDistanceLess(zero) == false
    assert d0 <= 0.0  # IsDistanceLessOrEqual(zero) == true
    # distance p→q2 equals the limit exactly
    lim = D.chord2(p, q2)
    assert not (D.chord2(p, q2) < lim)
    assert D.chord2(p, q2) <= lim
    # conservative compare: expand the limit by its construction error
    lim_cons = lim + D.s2point_constructor_max_error(lim)
    assert D.chord2(p, q2) <= lim_cons


def test_true_distance_less_than_chord_angle_distance():
    """s2closest_edge_query_test.cc:160-183: chord angle ~4 ulps above the
    true distance; conservative compare must still accept."""
    p0 = np.array([0.78516762584829192, -0.50200400690845970, -0.36263449417782678])
    p1 = np.array([0.78563011732429433, -0.50187655940493503, -0.36180828883938054])
    d2 = D.chord2(p0, p1)
    # conservative comparison accepts at the limit even with rounding
    lim_cons = d2 + D.s2point_constructor_max_error(d2)
    assert d2 <= lim_cons
    # exact squared chord via rational arithmetic (the reference uses long
    # double: EXPECT_LT(S1ChordAngle(ToLD(p0), ToLD(p1)), limit))
    from fractions import Fraction

    exact_d2 = sum((Fraction(a) - Fraction(b)) ** 2 for a, b in zip(p0, p1))
    # the double-rounded chord distance overestimates the true distance...
    assert exact_d2 < Fraction(d2)
    # ...but by less than the documented constructor error bound, so the
    # conservative comparison accepts a true-distance-at-the-limit pair
    assert Fraction(d2) - exact_d2 <= Fraction(float(D.s2point_constructor_max_error(d2)))


def test_point_edge_distance_kernel():
    # point on the equator vs meridian edge
    x = _pt(0, 5)
    a = _pt(-10, 0)
    b = _pt(10, 0)
    d2 = D.update_min_distance(x, a, b)
    # closest point is (0,0): distance 5 degrees
    expect = float(D.angle_to_chord2(math.radians(5)))
    assert abs(d2 - expect) < 1e-15
    # beyond the endpoints → vertex distance
    y = _pt(20, 0)
    d2v = D.update_min_distance(y, a, b)
    expect_v = D.chord2(y, b)
    assert abs(d2v - expect_v) < 1e-15
    # random consistency: edge distance ≤ both vertex distances
    for _ in range(100):
        pts = np.stack(
            latlng_to_xyz(RNG.uniform(-80, 80, 3), RNG.uniform(-180, 180, 3)), -1
        )
        dd = D.update_min_distance(pts[0], pts[1], pts[2])
        assert dd <= D.chord2(pts[0], pts[1]) + 1e-15
        assert dd <= D.chord2(pts[0], pts[2]) + 1e-15


def test_knn_dataframe_queries_distributed(spark, points):
    """The query side as a Spark DataFrame (no pandas, no driver loop):
    200 deterministic queries vs the brute-force oracle."""
    from pyspark.sql import functions as F

    qdf = spark.range(200).select(
        F.concat(F.lit("q"), F.col("id")).alias("query_id"),
        (((F.col("id") * 7907) % 16000) / 100.0 - 80.0 + 0.005).alias("lat"),
        (((F.col("id") * 104723) % 35000) / 100.0 - 175.0 + 0.005).alias("lng"),
    )
    got = (
        knn_join(qdf, points, k=3, level=8)
        .select("query_id", "url", "mention_idx", "chord2")
        .toPandas()
        .sort_values(["query_id", "chord2", "url", "mention_idx"])
        .reset_index(drop=True)
    )
    q_pdf = qdf.toPandas()
    pts_pdf = points.select("url", "mention_idx", "lat", "lng").toPandas()
    want = (
        brute_force_knn(q_pdf, pts_pdf, k=3)
        .sort_values(["query_id", "chord2", "url", "mention_idx"])
        .reset_index(drop=True)
    )
    assert (got.groupby("query_id").size() == 3).all()
    pd.testing.assert_frame_equal(
        got[["query_id", "url", "mention_idx"]],
        want[["query_id", "url", "mention_idx"]],
        check_dtype=False,
    )
    np.testing.assert_allclose(
        got.chord2.to_numpy(), want.chord2.to_numpy(), rtol=1e-12
    )
