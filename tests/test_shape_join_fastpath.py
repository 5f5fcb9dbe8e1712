"""Round-6 fast-path internals of indexed_closest_edges_join.

The fast path lifts index cells to the probe level; cells COARSER than
the probe level descend into their probe-level children.  A sparse edge
set (few edges → cells stay at the seed level 6) probed with a small
radius (probe level 9) exercises exactly that descent; results must
match the brute-force oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from s2geometry_spark.kernel.closest_edge import Shape
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.operators.shape_index import (
    _descend_cells,
    build_shape_index,
    edges_to_df,
    indexed_closest_edges_join,
)
from s2geometry_spark.kernel import cellid as K


def test_descend_cells_matches_child_iteration():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-80, 80, 20)
    lng = rng.uniform(-180, 180, 20)
    x, y, z = latlng_to_xyz(lat, lng)
    leafs = K.from_point(x, y, z)
    for frm, to in ((4, 7), (6, 9), (9, 9)):
        cells = K.parent(leafs, frm)
        got = set(_descend_cells(np.unique(cells), frm, to).tolist())
        want = set()
        for c in np.unique(cells):
            lo = int(K.range_min(np.array([c], np.uint64))[0])
            hi = int(K.range_max(np.array([c], np.uint64))[0])
            lsb_t = 1 << (2 * (30 - to))
            cur = lo - 1 + lsb_t
            while cur <= hi:
                want.add(cur)
                cur += 2 * lsb_t
        assert got == want


def test_coarse_descend_join_matches_brute(spark):
    # 30 edges along a sparse arc: every index cell stays at seed level 6
    t = np.linspace(0, 1, 31)
    slat = 10 + 20 * t
    slng = 40 + 25 * t
    sx, sy, sz = latlng_to_xyz(slat, slng)
    sv = np.stack([sx, sy, sz], -1)
    shape = Shape(0, 1, sv[:-1], sv[1:])
    index = build_shape_index(
        edges_to_df(spark, [shape], partitions=4), max_edges_per_cell=10
    )
    levels = {int(r.level) for r in index.select("level").distinct().collect()}
    assert max(levels) < 9, "fixture must keep cells coarser than probe level"

    rng = np.random.RandomState(3)
    pts = pd.DataFrame(
        {
            "query_id": [f"p{i}" for i in range(400)],
            "lat": rng.uniform(5, 35, 400),
            "lng": rng.uniform(35, 70, 400),
        }
    )
    pdf = spark.createDataFrame(pts)
    from s2geometry_spark.operators.indexing import index_points

    points = index_points(pdf, level=30).withColumn(
        "key", F.xxhash64("query_id")
    )
    out = indexed_closest_edges_join(
        points, index, k=1, max_distance_rad=0.002
    ).toPandas()

    # brute force
    from s2geometry_spark.kernel.distance import point_edge_dist2_rowwise

    px, py, pz = latlng_to_xyz(pts.lat.to_numpy(), pts.lng.to_numpy())
    P = np.stack([px, py, pz], -1)
    import math

    limit2 = (2 * math.sin(0.5 * 0.002)) ** 2
    want = {}
    for qi in range(len(P)):
        best = None
        for e in range(len(sv) - 1):
            d2 = float(
                point_edge_dist2_rowwise(
                    P[qi : qi + 1], sv[e : e + 1], sv[e + 1 : e + 2]
                )[0]
            )
            if d2 < limit2 and (best is None or d2 < best[1]):
                best = (e, d2)
        if best is not None:
            want[pts.query_id.iloc[qi]] = best
    got = {
        r.query_id: (int(r.edge_id), float(r.dist2)) for r in out.itertuples()
    }
    assert set(got) == set(want)
    for q, (e, d2) in want.items():
        assert got[q][0] == e
        assert got[q][1] == d2  # bit-identical distances
