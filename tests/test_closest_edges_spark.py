"""Distributed closest-edge join vs the driver kernel."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.closest_edge import find_closest_edges, parse_index
from s2geometry_spark.operators.closest_edges import closest_edges_join
from s2geometry_spark.operators.indexing import index_points
from s2geometry_spark.sources.pages import extract_mentions, synthesize_pages

INDEX = "# 0:0, 0:5, 5:5, 5:0 # 0:10, 0:15, 5:15, 5:10"


def test_closest_edges_join_matches_kernel(spark):
    shapes = parse_index(INDEX)
    pages = synthesize_pages(spark, 300, partitions=4)
    pts = index_points(extract_mentions(pages), level=30)
    out = closest_edges_join(
        pts, shapes, k=2, max_distance_rad=math.radians(30), include_interiors=True
    )
    pdf = out.select("lat", "lng", "shape_id", "edge_id", "dist2").toPandas()
    base = pts.select("lat", "lng").toPandas()
    from s2geometry_spark.kernel.coords import latlng_to_xyz

    x, y, z = latlng_to_xyz(base.lat.to_numpy(), base.lng.to_numpy())
    want = find_closest_edges(
        shapes, np.stack([x, y, z], -1), k=2,
        max_distance_rad=math.radians(30), include_interiors=True,
    )
    want_rows = sorted(
        (round(la, 9), round(ln, 9), sid, eid, round(d, 12))
        for (la, ln), row in zip(zip(base.lat, base.lng), want)
        for sid, eid, d in row
    )
    got_rows = sorted(
        (round(r.lat, 9), round(r.lng, 9), r.shape_id, r.edge_id, round(r.dist2, 12))
        for r in pdf.itertuples()
    )
    assert got_rows == want_rows
    assert len(got_rows) > 0


def test_expanded_by_distance_uv():
    # expanding the face-cell rect by a positive distance grows it
    u_lo, u_hi, v_lo, v_hi = K.expanded_by_distance_uv(
        np.array([-0.5]), np.array([0.5]), np.array([-0.5]), np.array([0.5]), 0.1
    )
    assert u_lo[0] < -0.5 and u_hi[0] > 0.5
    assert v_lo[0] < -0.5 and v_hi[0] > 0.5
    # shrinking by more than the half-width collapses
    s_lo, s_hi, t_lo, t_hi = K.expanded_by_distance_uv(
        np.array([-0.01]), np.array([0.01]), np.array([-0.01]), np.array([0.01]), -0.5
    )
    assert s_lo[0] == s_hi[0] == t_lo[0]
