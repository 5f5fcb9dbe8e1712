"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship geo pipeline (pages → mentions →
S2 cells → point-in-polygon join) at sf0.001.  ``queries()`` exposes one
entry per implemented operator family (SURVEY.md §2 + the training-data
extensions); ``oracle_sql()`` gives exact DuckDB oracles wherever the
semantics are SQL-expressible (cell-id bit algebra, text analysis,
dedup, similarity, windows); Hilbert-curve / spherical-geometry ops have
pytest-level brute-force oracles instead (tests/) and get rows-only
checks here.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_PAGES_FLAGSHIP = 2000


def _mentions(spark: SparkSession, n_pages: int):
    from s2geometry_spark.operators.indexing import index_points
    from s2geometry_spark.sources.pages import extract_mentions, synthesize_pages

    pages = synthesize_pages(spark, n_pages, partitions=8)
    return index_points(extract_mentions(pages), level=30)


def _fixture_polygons():
    from s2geometry_spark.kernel.contains import parse_polygon

    return [
        ("nyc", parse_polygon("40.2:-74.5, 40.2:-73.5, 41.2:-73.5, 41.2:-74.5")),
        ("london", parse_polygon("51.0:-0.7, 51.0:0.4, 52.0:0.4, 52.0:-0.7")),
        ("tokyo_w_hole", parse_polygon(
            "35.1:139.2, 35.1:140.2, 36.2:140.2, 36.2:139.2;"
            "35.5:139.5, 35.5:139.9, 35.9:139.9, 35.9:139.5"
        )),
        ("near0", parse_polygon("-1:0, 0:1, 1:0, 0:-1")),
        ("big_triangle", parse_polygon("-10:-30, -10:30, 45:0")),
    ]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial join of geotagged mentions against polygons,
    aggregated to (polygon, level-8 tile) counts."""
    from s2geometry_spark.functions import columns as CC
    from s2geometry_spark.operators.spatial_join import point_in_polygon_join

    pts = _mentions(spark, N_PAGES_FLAGSHIP)
    joined = point_in_polygon_join(pts, _fixture_polygons())
    return (
        joined.groupBy(
            "polygon_id", CC.parent("cell_id_s", 8).alias("tile8_s")
        )
        .agg(F.count("*").alias("n_mentions"))
        .orderBy("polygon_id", "tile8_s")
    )


# --------------------------------------------------------------- queries
_KNN_QUERIES = [
    ("nyc", 40.71, -74.0),
    ("london", 51.51, -0.13),
    ("tokyo", 35.68, 139.69),
    ("sparse_ocean", -40.0, -140.0),
]


def _tile_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global scatter from the customer table — the same
    formula the DuckDB oracles recompute (functions/oracles.py)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return cust.selectExpr(
        "c_custkey AS key", f"{_TILE_LAT} AS lat", f"{_TILE_LNG} AS lng"
    )


def _q_geo_mentions_per_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaf-cell encode + decode roundtrip histogram: from_latlng →
    ToFaceIJOrientation → (face, i8, j8) counts; the oracle recomputes
    (face, i, j) Hilbert-free via the coordinate tower in SQL, so a
    Hilbert/coords bug on either leg breaks the hash."""
    from s2geometry_spark.functions.udfs import s2_cell_to_face_ij
    from s2geometry_spark.operators.indexing import index_points

    pts = index_points(_tile_points(spark, sf_dir), level=30)
    fij = pts.withColumn("_f", s2_cell_to_face_ij(F.col("cell_id_s")))
    return (
        fij.groupBy(
            F.col("_f.face").alias("face"),
            F.shiftright(F.col("_f.i"), 22).alias("i8"),
            F.shiftright(F.col("_f.j"), 22).alias("j8"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("face", "i8", "j8")
    )


def _continental_polygons():
    """Continental-scale convex polygons (one with a hole) so the global
    customer scatter yields meaningful per-polygon counts; all loops are
    convex, which is what makes the side-test SQL oracle exact."""
    from s2geometry_spark.kernel.contains import parse_polygon

    return [
        ("north_america", parse_polygon("20:-130, 20:-60, 55:-60, 55:-130")),
        ("europe", parse_polygon("35:-10, 35:40, 65:40, 65:-10")),
        ("asia_w_hole", parse_polygon(
            "5:60, 5:140, 55:140, 55:60; 20:80, 20:110, 40:110, 40:80"
        )),
        ("south_ocean", parse_polygon("-60:-120, -60:-30, -20:-30, -20:-120")),
        ("big_triangle", parse_polygon("-10:-30, -10:30, 45:0")),
    ]


def _q_geo_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from s2geometry_spark.operators.indexing import index_points
    from s2geometry_spark.operators.spatial_join import point_in_polygon_join

    pts = index_points(_tile_points(spark, sf_dir), level=30)
    out = point_in_polygon_join(pts, _continental_polygons())
    return (
        out.groupBy("polygon_id")
        .agg(F.count("*").alias("n_points"))
        .orderBy("polygon_id")
    )


def _q_geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from s2geometry_spark.operators.indexing import index_points
    from s2geometry_spark.operators.knn import knn_join

    pts = index_points(_tile_points(spark, sf_dir), level=30, with_xyz=True)
    queries = pd.DataFrame(_KNN_QUERIES, columns=["query_id", "lat", "lng"])
    out = knn_join(queries, pts, k=5, level=8, point_cols=("key",))
    return out.select(
        "query_id", "key", F.round("dist_rad", 9).alias("dist_rad_r")
    ).orderBy("query_id", "dist_rad_r", "key")


def _q_geo_polygon_covering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from s2geometry_spark.functions import columns as CC
    from s2geometry_spark.operators.spatial_join import coverings_df

    df = coverings_df(spark, _fixture_polygons())
    return df.select(
        "polygon_id", "cell_id_s", CC.token("cell_id_s").alias("token"), "is_interior"
    ).orderBy("polygon_id", "cell_id_s")


def _q_cell_hierarchy(spark, sf_dir):
    from s2geometry_spark.operators.cellops import cell_hierarchy

    return cell_hierarchy(spark, sf_dir).orderBy("key")


def _q_cell_containment(spark, sf_dir):
    from s2geometry_spark.operators.cellops import cell_containment_join

    return cell_containment_join(spark, sf_dir)


def _q_cell_histogram(spark, sf_dir):
    from s2geometry_spark.operators.cellops import cell_histogram_q

    return cell_histogram_q(spark, sf_dir)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _q_text_token_stats(spark, sf_dir):
    from s2geometry_spark.operators.text import token_stats

    return token_stats(_docs(spark, sf_dir)).orderBy("doc_id")


def _q_text_quality(spark, sf_dir):
    from s2geometry_spark.operators.text import quality_score

    return quality_score(_docs(spark, sf_dir)).orderBy("doc_id")


def _q_text_lang_id(spark, sf_dir):
    from s2geometry_spark.operators.text import lang_id

    return lang_id(_docs(spark, sf_dir)).orderBy("doc_id")


def _q_text_fingerprint(spark, sf_dir):
    from s2geometry_spark.operators.text import fingerprint

    return fingerprint(_docs(spark, sf_dir)).orderBy("doc_id")


def _q_dedup_exact(spark, sf_dir):
    from s2geometry_spark.operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_docs(spark, sf_dir)).orderBy("text_hash")


def _q_dedup_ngram(spark, sf_dir):
    from s2geometry_spark.operators.dedup import (
        ngram_jaccard_pairs_blocked_baseline,
    )

    return ngram_jaccard_pairs_blocked_baseline(
        _docs(spark, sf_dir), threshold=0.2
    ).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard_r")
    ).orderBy("doc_a", "doc_b")


def _q_dedup_jaccard_prefix(spark, sf_dir):
    """Exact GLOBAL Jaccard pairs via prefix filtering (AllPairs/PPJoin)
    — the scale path that replaces the O(block²) blocked join."""
    from s2geometry_spark.operators.dedup import ngram_jaccard_pairs_prefix

    return ngram_jaccard_pairs_prefix(_docs(spark, sf_dir), threshold=0.2).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard_r")
    ).orderBy("doc_a", "doc_b")


def _q_dedup_minhash(spark, sf_dir):
    from s2geometry_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir)).select(
        "doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard_r")
    ).orderBy("doc_a", "doc_b")


def _q_dedup_components(spark, sf_dir):
    """MinHash pairs → duplicate CLUSTERS via Large-Star/Small-Star
    connected components (operators/components.py): every document
    labeled with its cluster minimum + cluster size."""
    from s2geometry_spark.operators.components import dedup_components
    from s2geometry_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    return dedup_components(docs, pairs).orderBy("doc_id")


def _q_dedup_simhash(spark, sf_dir):
    from s2geometry_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir)).orderBy("doc_id")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_ann_cosine_topk(spark, sf_dir):
    from s2geometry_spark.operators.similarity import cosine_topk

    return cosine_topk(_emb(spark, sf_dir)).orderBy("query_id", "rank")


def _q_ann_lsh_topk(spark, sf_dir):
    from s2geometry_spark.operators.similarity import ann_lsh_topk

    return ann_lsh_topk(_emb(spark, sf_dir)).orderBy("query_id", "rank")


def _q_ann_ivf_topk(spark, sf_dir):
    from s2geometry_spark.operators.similarity import ann_ivf_topk

    return ann_ivf_topk(_emb(spark, sf_dir)).orderBy("query_id", "rank")


def _q_ann_pq_topk(spark, sf_dir):
    from s2geometry_spark.operators.similarity import ann_pq_topk

    return ann_pq_topk(_emb(spark, sf_dir)).orderBy("query_id", "rank")


def _q_embedding_near_dup(spark, sf_dir):
    from s2geometry_spark.operators.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _emb(spark, sf_dir), threshold=0.4, bits=6
    ).orderBy("vec_a", "vec_b")


def _q_multimodal_features(spark, sf_dir):
    from s2geometry_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    media = synthesize_media(spark, 500)
    return extract_features(media).orderBy("media_id")


def _q_sample_stratified(spark, sf_dir):
    """Deterministic keyed sampling (uniform + per-language stratified):
    reproducible across engines — the oracle recomputes the exact same
    md5-threshold decisions."""
    from s2geometry_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
    )

    docs = _docs(spark, sf_dir)
    uni = deterministic_sample(docs, "doc_id", 0.25).select(
        F.lit("uniform").alias("mode"), "doc_id", "lang"
    )
    strat = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.1, "de": 0.6, "fr": 0.4}
    ).select(F.lit("stratified").alias("mode"), "doc_id", "lang")
    return uni.unionByName(strat).orderBy("mode", "doc_id")


def _q_events_window(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("w_start", "event_type")
    )


_TILE_LAT = "((c_custkey * 7919) % 17000) / 100.0 - 85.0 + 0.005"
_TILE_LNG = "((c_custkey * 104729) % 36000) / 100.0 - 180.0 + 0.005"


def _q_tiling_web_tiles(spark, sf_dir):
    from s2geometry_spark.operators.tiling import assign_web_tiles

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pts = cust.selectExpr(
        "c_custkey AS key", f"{_TILE_LAT} AS lat", f"{_TILE_LNG} AS lng"
    )
    return (
        assign_web_tiles(pts, zoom=6)
        .select("key", "tile_x", "tile_y")
        .orderBy("key")
    )


def _named_loops():
    return [
        (f"{pid}_{i}", loop.vertices)
        for pid, poly in _fixture_polygons()
        for i, loop in enumerate(poly.loops)
    ]


def _q_geo_loop_measures(spark, sf_dir):
    from s2geometry_spark.operators.measures import edges_df, loop_measures

    out = loop_measures(edges_df(spark, _named_loops()))
    return out.select(
        "loop_id",
        F.round("area", 9).alias("area_r"),
        F.round("perimeter", 9).alias("perimeter_r"),
    ).orderBy("loop_id")


def _cellunion_inputs(spark, sf_dir):
    from s2geometry_spark.functions import columns as CC
    from s2geometry_spark.operators.cellops import synth_cell_expr
    from s2geometry_spark.operators.unionops import normalize_unions

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def side(pred):
        return normalize_unions(
            cust.filter(pred).select(
                F.lit("r").alias("region_id"),
                CC.parent(synth_cell_expr("c_custkey"), 8).alias("cell_id_s"),
            )
        )

    return side("c_custkey % 2 = 0"), side("c_custkey % 3 = 0")


def _q_geo_cellunion_ops(spark, sf_dir):
    """Union / intersection / difference of two normalized cell unions,
    denormalized back to level 8 for output — the level-8 leaf set is the
    exact region semantics, which the oracle recomputes as plain int64
    set algebra (UNION / INTERSECT / EXCEPT)."""
    from s2geometry_spark.operators.unionops import (
        denormalize_unions,
        intersect_unions,
        subtract_unions,
        union_unions,
    )

    a, b = _cellunion_inputs(spark, sf_dir)
    u = denormalize_unions(union_unions(a, b), 8).withColumn("op", F.lit("union"))
    i = denormalize_unions(intersect_unions(a, b), 8).withColumn(
        "op", F.lit("intersect")
    )
    d = denormalize_unions(subtract_unions(a, b), 8).withColumn(
        "op", F.lit("difference")
    )
    return (
        u.unionByName(i).unionByName(d)
        .select("op", "cell_id_s")
        .orderBy("op", "cell_id_s")
    )


_CLOSEST_EDGE_INDEX = "1:1, 2:2 # 0:0, 0:5, 5:5, 5:0 # 0:10, 0:15, 5:15, 5:10"


def _q_geo_closest_edge(spark, sf_dir):
    """S2ClosestEdgeQuery over the customer scatter: top-3 hits within
    0.3 rad against a multipoint + polyline + polygon index (interior
    hits report edge_id -1 at distance 0)."""
    from s2geometry_spark.kernel.closest_edge import parse_index
    from s2geometry_spark.operators.closest_edges import closest_edges_join

    shapes = parse_index(_CLOSEST_EDGE_INDEX)
    pts = _tile_points(spark, sf_dir)
    out = closest_edges_join(
        pts, shapes, k=3, max_distance_rad=0.3, include_interiors=True
    )
    return out.select(
        "key", "shape_id", "edge_id", F.round("dist2", 12).alias("dist2_r")
    ).orderBy("key", "shape_id", "edge_id")


def _q_geo_furthest_edge(spark, sf_dir):
    """S2FurthestEdgeQuery over the customer scatter: top-2 furthest
    hits against the same multipoint + polyline + polygon index as
    geo_closest_edge (antipode-interior hits report edge_id -1 at
    Straight = 4.0).  The oracle re-derives max_d2 = 4 - min_d2(-x)
    (s2edge_distances.cc:236-249) on negated point columns in SQL."""
    from s2geometry_spark.kernel.closest_edge import parse_index
    from s2geometry_spark.operators.closest_edges import furthest_edges_join

    shapes = parse_index(_CLOSEST_EDGE_INDEX)
    pts = _tile_points(spark, sf_dir)
    out = furthest_edges_join(pts, shapes, k=2, include_interiors=True)
    return out.select(
        "key", "shape_id", "edge_id", F.round("dist2", 12).alias("dist2_r")
    ).orderBy("key", "shape_id", "edge_id")


def _q_cell_density_rollup(spark, sf_dir):
    """S2DensityTree cell→weight rollup at levels 4/6/8 over synthetic
    cells — the partitioning-planner input (plans/density.py), with a
    pure int64 bit-algebra oracle."""
    from s2geometry_spark.operators.cellops import synth_cell_expr
    from s2geometry_spark.plans.density import density_rollup

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pts = cust.select(synth_cell_expr("c_custkey").alias("cell_id_s"))
    return density_rollup(pts, [4, 6, 8]).orderBy("level", "cell_id_s")


def _q_cell_density_tree(spark, sf_dir):
    """S2DensityTree distributed build (s2density_tree.cc
    BreadthFirstTreeBuilder): a cell is in the tree iff every coarser
    ancestor's weight exceeds the split threshold — one explode+agg
    plus a cascade of broadcast joins between adjacent LEVEL AGGREGATES
    (the fact table never re-shuffles).  Kernel parity is gated in
    tests/test_density_tree_spark.py; here the oracle re-derives the
    prune with the same int64 bit algebra in SQL."""
    from s2geometry_spark.operators.cellops import synth_cell_expr
    from s2geometry_spark.plans.density import density_tree

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pts = cust.select(synth_cell_expr("c_custkey").alias("cell_id_s"))
    return density_tree(pts, [0, 2, 4, 6], split_weight=10).orderBy(
        "level", "cell_id_s"
    )


def _q_cell_index_labels(spark, sf_dir):
    from s2geometry_spark.functions import columns as CC
    from s2geometry_spark.operators.cell_index import (
        build_cell_index,
        intersecting_labels,
    )
    from s2geometry_spark.operators.cellops import synth_cell_expr

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cells = cust.select(
        (F.col("c_custkey") % 25).alias("label"),
        synth_cell_expr("c_custkey").alias("cell_id_s"),
    )
    index = build_cell_index(cells)
    targets = nation.select(
        F.col("n_nationkey").alias("target_id"),
        CC.parent(synth_cell_expr("n_nationkey"), 6).alias("cell_id_s"),
    )
    return (
        intersecting_labels(index, targets)
        .groupBy("target_id")
        .agg(F.count("*").alias("n_labels"))
        .orderBy("target_id")
    )



def _q_geo_rect_filter(spark, sf_dir):
    """S2LatLngRect containment as a pure-JVM filter (exact SQL oracle);
    includes an inverted (date-line-wrapping) longitude interval."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pts = cust.selectExpr(
        "c_custkey AS key", f"{_TILE_LAT} AS lat", f"{_TILE_LNG} AS lng"
    )
    in_band = (F.col("lat") >= 10.0) & (F.col("lat") <= 60.0)
    # rect A: normal lng interval [-30, 40]; rect B: inverted [150, -150]
    in_a = in_band & (F.col("lng") >= -30.0) & (F.col("lng") <= 40.0)
    in_b = in_band & ((F.col("lng") >= 150.0) | (F.col("lng") <= -150.0))
    return pts.select(
        "key",
        in_a.cast("int").alias("in_rect_a"),
        in_b.cast("int").alias("in_rect_b"),
    ).filter((F.col("in_rect_a") == 1) | (F.col("in_rect_b") == 1)).orderBy("key")



_BOOLEAN_FIXTURES = [
    ("sq_overlap", "0:0, 0:4, 4:4, 4:0", "2:2, 2:6, 6:6, 6:2"),
    ("nested", "0:0, 0:4, 4:4, 4:0", "1:1, 1:3, 3:3, 3:1"),
]
# touch-only pairs whose CLOSED-model boolean outputs carry degenerate
# rows (sibling-pair edges / point shells+holes; s2boolean_operation.h
# PolygonEdge/VertexClosedPolygon* cases) — used by geo_boolean_ops
# (kernel path emits degeneracies); the sharded query keeps the base
# proper-output fixtures
_BOOLEAN_FIXTURES_TOUCH = [
    ("edge_touch", "0:0, 0:4, 2:4, 2:0", "0:4, 1:5, 2:4"),
    ("corner_touch", "0:0, 0:5, 1:5", "0:0, 5:3, 5:2"),
]
_BOOLEAN_OPS = ("difference", "intersection", "symmetric_difference", "union")
# partially-overlapping COLLINEAR boundaries — the input class only the
# snap-composed path admits (boolean_op_snapped; the plain overlay
# raises "identical great circles")
_SNAPPED_FIXTURES = [
    ("collinear_overlap", "0:0, 0:10, 10:10, 10:0", "0:4, 0:14, 10:14, 10:4"),
    ("collinear_touch", "0:0, 0:10, 10:10, 10:0", "-10:4, -10:14, 0:14, 0:4"),
    ("plain_overlap", "0:0, 0:4, 4:4, 4:0", "2:2, 2:6, 6:6, 6:2"),
]


# mixed-dimension fixtures spanning the boundary-model matrix
# (s2boolean_operation_test.cc: PointSemiOpenPolyline,
# PointClosedPolygonVertex, PolylineEdgePolylineEdgeOverlap,
# PolylineEdgeSemiOpen/ClosedPolygonEdgeOverlap,
# PolylineCrossingRectangleTwice, PolygonVertexClosedPolygonVertex)
_MIXED_FIXTURES = [
    ("pt_polyline", "0:0 | 1:0 | 2:0 | 3:0 | 4:0 | 5:0 # #",
     "# 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0, 4:0 #",
     "SEMI_OPEN", "SEMI_OPEN", True),
    ("pt_polygon", "0:1 | 1:0 # #", "# # 0:0, 0:1, 1:0",
     "CLOSED", "CLOSED", True),
    ("line_overlap", "# 0:0, 1:0, 2:0, 2:5 | 3:0, 3:0 | 6:0, 5:0, 4:0 #",
     "# 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0 #",
     "SEMI_OPEN", "CLOSED", True),
    ("line_poly_semi", "# 1:1, 1:3, 3:3 | 3:3, 1:3 #",
     "# # 1:1, 1:3, 3:3, 3:1", "SEMI_OPEN", "CLOSED", True),
    ("line_poly_closed", "# 1:1, 1:3, 3:3 | 3:3, 1:3 #",
     "# # 1:1, 1:3, 3:3, 3:1", "CLOSED", "CLOSED", True),
    ("line_cross_rect", "# 0:-5, 0:5 | 5:0, -5:0 #",
     "# # 1:1, 1:-1, -1:-1, -1:1", "SEMI_OPEN", "CLOSED", True),
    ("poly_vertex_touch", "# # 0:0, 0:5, 1:5", "# # 0:0, 5:3, 5:2",
     "CLOSED", "CLOSED", True),
]


def _simplify_fixtures():
    """Simplification jobs: the reference's simplify_edge_chains
    fixtures (s2builder_test.cc:866-1019) plus two generated
    stress shapes.  Each job = (name, snap_kind, snap_param,
    polylines-as-latlng-lists)."""
    import math

    arc = [
        (0.4 * math.sin(i * math.pi / 40), i * 0.25) for i in range(201)
    ]
    jitter = [(0.02 * ((i * 2654435761) % 7 - 3), i * 0.2) for i in range(101)]
    return [
        ("one_edge", "identity", math.radians(1),
         [[(0, 0), (1, 0.5), (2, -0.5), (3, 0.5), (4, -0.5), (5, 0)]]),
        ("backtrack", "identity", math.radians(0.5),
         [[(0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (4, 0),
           (3, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (7, 0)]]),
        ("opposite", "identity", math.radians(0.5),
         [[(-4, 0.83), (-3, 0.46), (-2, 0.2), (-1, 0.05), (0, 0),
           (1, 0.5), (2, 0.2), (3, 0.46), (4, 0.83)],
          [(4, 0.83), (3, 0.46), (2, 0.2), (1, 0.05), (0, 0),
           (-1, 0.5), (-2, 0.2), (-3, 0.46), (-4, 0.83)]]),
        ("keeps_sep", "identity", math.radians(1.0),
         [[(0, -10), (0.99, 0), (0, 10)], [(-5, -5), (-0.2, 0), (-5, 5)]]),
        ("avoid_backtrack", "identity", math.radians(1.0),
         [[(0, 0), (1, 0.1), (1, 2)], [(0, 1.05), (-10, 1.05)]]),
        ("limits_deviation", "intlatlng", 0,
         [[(-30.49, -29.51), (29.51, 30.49)]]),
        ("arc200", "identity", math.radians(0.5), [arc]),
        ("cellid_jitter", "cellid", 8, [jitter]),
    ]


def _layer_fixtures():
    """Assembly jobs for the layer contract query: the reference layer
    suites' segment network + joining polylines (polyline-vector,
    WALK) and the triangle-pyramid + nested-diamond polygons
    (left-turn-map loop assembly)."""
    def pl(s):
        return [
            tuple(float(x) for x in v.split(":"))
            for v in s.split(",")
        ]

    network = [
        "0:0, 1:1, 2:2", "2:2, 2:3, 2:4", "2:4, 3:4, 4:4",
        "2:2, 3:2, 4:2", "4:2, 4:3, 4:4", "1:0, 2:2", "0:1, 2:2",
        "5:4, 4:4", "4:5, 4:4", "2:4, 2:5, 1:5, 1:4, 2:4",
        "4:2, 6:1, 5:0", "4:2, 7:0, 6:-1",
        "11:1, 11:0, 10:0, 10:1, 11:1",
    ]
    joining = ["1:1, 2:2", "3:3, 2:2", "0:0, 1:1"]
    pyramid = [
        "0:0, 0:2, 0:4, 0:6, 1:5, 2:4, 3:3, 2:2, 1:1",
        "0:2, 1:1, 1:3", "0:4, 1:3, 1:5", "1:3, 2:2, 2:4",
    ]
    diamonds = [
        "0:10, -10:0, 0:-10, 10:0", "0:-20, -10:0, 0:20, 10:0",
        "0:-10, -5:0, 0:10, 5:0", "0:5, -5:0, 0:-5, 5:0",
    ]
    return [
        ("network", "polyline_vector", [pl(s) for s in network]),
        ("joining", "polyline_vector", [pl(s) for s in joining]),
        ("pyramid", "polygon", [pl(s) for s in pyramid]),
        ("diamonds", "polygon", [pl(s) for s in diamonds]),
    ]


def _meridian_fixtures():
    """Antimeridian-splitting jobs: the five reference MeridianSplitting
    cases (s2boolean_operation_test.cc:1753-1795) plus a Fiji-style
    crossing box, a repeatedly-crossing polyline, and a no-op
    passthrough."""
    def pl(s):
        return [
            tuple(float(x) for x in v.split(":"))
            for v in s.split(",")
        ]

    return [
        ("equator_line", "polyline", [pl("0:-160, 0:170")]),
        ("north_hemisphere", "polygon", [pl("0:0, 0:120, 0:-120")]),
        ("small_square", "polygon",
         [pl("9:179, 9:-179, 10:-179, 10:179")]),
        ("annulus", "polygon",
         [pl("8:178, 8:-178, 11:-178, 11:178"),
          pl("9:179, 10:179, 10:-179, 9:-179")]),
        ("world_minus_square", "polygon",
         [pl("9:-179, 9:179, 10:179, 10:-179")]),
        ("fiji_box", "polygon",
         [pl("-18:177, -18:-178, -16:-178, -16:177")]),
        ("zigzag_line", "polyline",
         [pl("5:170, 6:-170, 7:170, 8:-170")]),
        ("no_cross", "polyline", [pl("1:10, 2:20, 3:30")]),
    ]


def _q_geo_meridian_split(spark, sf_dir):
    """Distributed antimeridian splitting (the GeoJSON transform,
    s2boolean_operation_test.cc MeridianSplitting): every feature
    splits against the 180-degree degenerate sliver in ONE
    applyInPandas group — the groupBy(job) is the whole plan.  Split
    semantics are reference-pinned in
    tests/test_mixed_ops.py::test_meridian_splitting; the oracle gates
    this distributed path with kernel-pinned digests and the
    no-edge-crosses-the-meridian contract flag."""
    from s2geometry_spark.operators.meridian import (
        meridian_jobs_df,
        split_meridian_join,
    )

    jobs = meridian_jobs_df(spark, _meridian_fixtures())
    return split_meridian_join(jobs).orderBy("job", "piece_idx")


def _q_geo_layer_assembly(spark, sf_dir):
    """S2Builder output layers as a distributed job table
    (s2builderutil_s2polyline_vector_layer.cc + s2polygon_layer.cc):
    each job assembles an edge soup into polylines (WALK) or polygon
    loops (left-turn map) in ONE applyInPandas group — the groupBy(job)
    is the whole plan.  Layer semantics are reference-pinned in
    tests/test_builder_layers.py + tests/test_polygon_layer.py; the
    oracle gates this distributed path with kernel-pinned digests."""
    from s2geometry_spark.operators.layer_ops import (
        assemble_layers_join,
        layer_jobs_df,
    )

    jobs = layer_jobs_df(spark, _layer_fixtures())
    return assemble_layers_join(jobs).orderBy("job", "piece_idx")


def _q_geo_polyline_simplify(spark, sf_dir):
    """S2Builder simplify_edge_chains (s2builder.h:119,425) as a
    distributed job table: each job (a group of polylines sharing one
    snap function) snaps + simplifies on an executor via the
    EdgeChainSimplifier port (kernel/simplifier.py) inside ONE
    applyInPandas — the only shuffle is the groupBy(job).  Output is
    per-polyline vertex counts and the canonical simplified-chain
    digest; the oracle pins the kernel's values, whose semantics are
    pinned against the reference's own fixtures in
    tests/test_simplifier.py."""
    from s2geometry_spark.operators.polyline_ops import (
        simplify_jobs_df,
        simplify_polylines_join,
    )

    jobs = simplify_jobs_df(spark, _simplify_fixtures())
    out = simplify_polylines_join(jobs)
    return out.orderBy("job", "line_idx")


def _hull_fixtures():
    """Deterministic point clusters for the convex-hull contract query:
    compact clouds (ordinary hulls), a collinear-ish band, a cluster
    spanning more than a hemisphere (full marker), and a singleton."""
    import math

    clusters = []
    # compact jittered clouds at three latitudes
    for gi, (lat0, lng0) in enumerate([(10, 20), (-35, 100), (55, -120)]):
        pts = []
        for i in range(40):
            # deterministic low-discrepancy jitter
            a = (i * 2654435761 % 1000) / 1000.0 - 0.5
            b = (i * 40503 % 1000) / 1000.0 - 0.5
            pts.append((lat0 + 4 * a, lng0 + 4 * b))
        clusters.append((f"cloud{gi}", pts))
    # near-collinear band along a parallel
    clusters.append(
        ("band", [(20 + 0.001 * ((i * 7) % 5), i * 1.5) for i in range(30)])
    )
    # spans more than a hemisphere → full
    clusters.append(
        ("wide", [(0, lng) for lng in (0, 90, -135)] + [(45, 45), (-45, -45)])
    )
    # a single repeated point → 3-vertex degenerate loop
    clusters.append(("single", [(5, 5)] * 4))
    return clusters


def _q_geo_convex_hull(spark, sf_dir):
    """S2ConvexHullQuery per group (s2convex_hull_query.cc) as a
    distributed applyInPandas over (group_id, x, y, z) rows — ONE
    groupBy shuffle; each group runs the exact monotone-chain kernel
    (kernel/hull.py).  Output is the per-group hull size, status
    (loop/full/empty), and canonical vertex digest; the oracle pins the
    kernel's values, whose semantics are reference-gated in
    tests/test_hull_query.py."""
    import hashlib

    from s2geometry_spark.kernel.coords import latlng_to_xyz
    from s2geometry_spark.operators.hull import convex_hulls

    rows = []
    for gid, pts in _hull_fixtures():
        import numpy as np

        lat = np.array([p[0] for p in pts], float)
        lng = np.array([p[1] for p in pts], float)
        x, y, z = latlng_to_xyz(lat, lng)
        for i in range(len(pts)):
            rows.append((gid, float(x[i]), float(y[i]), float(z[i])))
    df = spark.createDataFrame(
        rows, "group_id string, x double, y double, z double"
    ).repartition(4)
    hulls = convex_hulls(df)

    @F.pandas_udf("string")
    def _latlng9(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.Series:
        import numpy as np

        from s2geometry_spark.kernel.coords import xyz_to_latlng

        lat, lng = xyz_to_latlng(
            x.to_numpy(float), y.to_numpy(float), z.to_numpy(float)
        )
        return pd.Series(
            [f"{round(a, 9):.9f},{round(b, 9):.9f}" for a, b in zip(lat, lng)]
        )

    out = (
        hulls.withColumn("ll", _latlng9("x", "y", "z"))
        .groupBy("group_id")
        .agg(
            F.max("status").alias("status"),
            F.sum(F.when(F.col("hull_idx") >= 0, 1).otherwise(0)).alias(
                "n_vertices"
            ),
            F.md5(
                F.concat_ws(
                    ";", F.array_sort(F.collect_list(F.concat_ws("@", F.col("hull_idx").cast("string"), "ll")))
                )
            ).alias("digest"),
        )
    )
    return out.orderBy("group_id")


def _q_geo_mixed_ops(spark, sf_dir):
    """Mixed-dimension S2BooleanOperation (points x polylines x
    polygons) with the full PolygonModel x PolylineModel boundary-model
    matrix (s2boolean_operation.h:100-183), computed on executors as a
    pair table (mapInPandas, no shuffle — operators/mixed_ops.py).
    Each row carries per-dimension output feature counts and the
    canonical multiset digest; the oracle pins the kernel's values,
    whose semantics are themselves pinned against the reference's own
    test matrix in tests/test_mixed_ops.py."""
    from s2geometry_spark.operators.mixed_ops import (
        mixed_ops_join,
        mixed_pairs_df,
    )

    rows = []
    for name, a_s, b_s, pgm, plm, lhb in _MIXED_FIXTURES:
        for op in _BOOLEAN_OPS:
            rows.append((name, a_s, b_s, op, pgm, plm, lhb))
    out = mixed_ops_join(mixed_pairs_df(spark, rows))
    return out.orderBy("pair", "op")


def _q_geo_boolean_ops(spark, sf_dir):
    """Polygon boolean ops as a distributed pair table: region area
    (S2Polygon::GetArea depth semantics — holes subtract) and loop count
    of a−b, a∩b, aΔb, a∪b per pair (all four OpTypes, s2boolean_operation.h:202-215), computed by the executors (mapInPandas
    overlay kernel, operators/overlay.py).  Oracled by pinned output
    loops + inclusion-exclusion identities over input-only areas."""
    from s2geometry_spark.operators.overlay import boolean_ops_join, polygon_pairs_df

    pairs = polygon_pairs_df(
        spark, _BOOLEAN_FIXTURES + _BOOLEAN_FIXTURES_TOUCH
    )
    out = boolean_ops_join(pairs, ops=_BOOLEAN_OPS, with_degeneracies=True)
    return out.select(
        "pair", "op", "n_loops", F.round("signed_area", 9).alias("area_r"),
        "n_deg_edges", "n_deg_points",
    ).orderBy("pair", "op")




def _q_geo_boolean_ops_snapped(spark, sf_dir):
    """S2BooleanOperation WITH snap rounding composed in front
    (s2boolean_operation.h snap_function → S2Builder): both operands
    snap through one joint site set with the exact Voronoi edge phase,
    so partially-overlapping COLLINEAR boundaries — which the
    general-position overlay rejects — regularize into exactly-shared
    sub-chains.  Same executor pair-table shape as geo_boolean_ops;
    oracled by pinned snapped-output loops + the inclusion-exclusion
    identities over input-only areas."""
    from s2geometry_spark.operators.overlay import boolean_ops_join, polygon_pairs_df

    pairs = polygon_pairs_df(spark, _SNAPPED_FIXTURES)
    out = boolean_ops_join(pairs, ops=_BOOLEAN_OPS, snapped=True)
    return out.select(
        "pair", "op", "n_loops", F.round("signed_area", 9).alias("area_r")
    ).orderBy("pair", "op")


def _q_geo_boolean_ops_sharded(spark, sf_dir):
    """The SAME boolean fixtures computed by the DISTRIBUTED arrangement
    (operators/arrangement.py — index-sharded crossings, hierarchical
    containment anchors, per-shard assembly) instead of the single-task
    mapInPandas kernel: must reproduce the kernel loop-for-loop, so it
    shares geo_boolean_ops' pinned-golden + inclusion-exclusion oracle.
    This is the hard signal for SURVEY §7.1 #1 (one continental
    arrangement distributed across executors)."""
    import pandas as pd

    from s2geometry_spark.kernel.contains import parse_polygon
    from s2geometry_spark.kernel.measures import even_odd_area
    from s2geometry_spark.operators import arrangement as AR

    rows = []
    for pair, sa, sb in _BOOLEAN_FIXTURES:
        pa, pb = parse_polygon(sa), parse_polygon(sb)
        ea = AR.polygon_to_edges_df(spark, pa, 0, partitions=4)
        eb = AR.polygon_to_edges_df(spark, pb, 1, partitions=4)
        # one shared infrastructure pass (index/anchors/crossings/split)
        # serves all four ops of the pair
        results = AR.distributed_boolean_ops(ea, eb, _BOOLEAN_OPS)
        for op in _BOOLEAN_OPS:
            res = results[op]
            area = even_odd_area([l.vertices for l in res.loops]) if res.loops else 0.0
            rows.append((pair, op, len(res.loops), round(float(area), 9)))
    out = spark.createDataFrame(
        pd.DataFrame(rows, columns=["pair", "op", "n_loops", "area_r"]).astype(
            {"n_loops": "int32"}
        )
    )
    return out.orderBy("pair", "op")



def _ring_polyline_shape():
    """Deterministic 64-edge closed ring polyline around (10°, 10°) —
    shared by the shape-index query and its SQL oracle."""
    import numpy as np

    from s2geometry_spark.kernel.closest_edge import Shape
    from s2geometry_spark.kernel.coords import latlng_to_xyz

    t = np.arange(65) / 64.0
    lat = 10 + 5 * np.cos(2 * np.pi * t)
    lng = 10 + 5 * np.sin(2 * np.pi * t)
    x, y, z = latlng_to_xyz(lat, lng)
    v = np.stack([x, y, z], -1)
    return Shape(0, 1, v[:-1], v[1:])


def _q_geo_shape_index_join(spark, sf_dir):
    """Distributed shape index (MutableS2ShapeIndex analog) routing a
    radius-bounded closest-edge join: build the index from the edge
    DataFrame, expand cells by the radius, ancestor-explode + equi-join
    the scatter points, exact distance kernel, per-point top-1."""
    from s2geometry_spark.operators.indexing import index_points
    from s2geometry_spark.operators.shape_index import (
        build_shape_index,
        edges_to_df,
        indexed_closest_edges_join,
    )

    shape = _ring_polyline_shape()
    index = build_shape_index(
        edges_to_df(spark, [shape]), max_edges_per_cell=4
    )
    pts = index_points(_tile_points(spark, sf_dir), level=30)
    out = indexed_closest_edges_join(pts, index, k=1, max_distance_rad=0.2)
    return out.select(
        "key", "shape_id", "edge_id", F.round("dist2", 12).alias("dist2_r")
    ).orderBy("key", "shape_id", "edge_id")


def _project_polyline_vertices():
    """Open 4-segment polyline shared by geo_polyline_project and its
    SQL oracle."""
    from s2geometry_spark.kernel.contains import parse_points

    return parse_points("0:-60, 10:-30, 0:0, -10:30, 0:60")


_CAP_FIXTURES = [
    ("nyc", 40.71, -74.0, 15.0),
    ("sydney", -33.87, 151.21, 20.0),
    ("ocean", -40.0, -140.0, 8.0),
]


def _caps():
    import math as _math

    import numpy as np

    from s2geometry_spark.kernel.coords import latlng_to_xyz
    from s2geometry_spark.kernel.region import Cap

    out = []
    for name, lat, lng, deg in _CAP_FIXTURES:
        x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
        out.append(
            (name, Cap.from_center_angle(
                np.array([float(x), float(y), float(z)]), _math.radians(deg)
            ))
        )
    return out


def _q_geo_cap_filter(spark, sf_dir):
    """S2Cap membership over the scatter via the kernel Cap region
    (Arrow batch), one flag column per cap; the oracle recomputes the
    squared-chord comparisons from the same center/length2 doubles."""
    import pandas as pd

    caps = _caps()

    @F.pandas_udf("array<int>")
    def flags(lat: pd.Series, lng: pd.Series) -> pd.Series:
        import numpy as np

        from s2geometry_spark.kernel.coords import latlng_to_xyz

        x, y, z = latlng_to_xyz(lat.to_numpy(), lng.to_numpy())
        P = np.stack([x, y, z], -1)
        cols = []
        for _name, cap in caps:
            d2 = ((P - cap.center) ** 2).sum(-1)
            cols.append((d2 <= cap.length2).astype(np.int32))
        return pd.Series([list(v) for v in np.stack(cols, -1)])

    pts = _tile_points(spark, sf_dir)
    out = pts.withColumn("_f", flags("lat", "lng"))
    for k, (name, _cap) in enumerate(caps):
        out = out.withColumn(f"in_{name}", F.col("_f").getItem(k))
    cond = None
    for name, _cap in caps:
        c = F.col(f"in_{name}") == 1
        cond = c if cond is None else (cond | c)
    return out.filter(cond).select(
        "key", *[f"in_{name}" for name, _ in caps]
    ).orderBy("key")


def _cap_filter_oracle() -> str:
    import numpy as np

    from s2geometry_spark.functions import oracles as OR

    # generation-time stability guarantee (oracles.LIBM_GUARD): no
    # scatter point may straddle any cap boundary within the guard
    P = OR.scatter_xyz()
    for name, cap in _caps():
        d2 = ((P - cap.center) ** 2).sum(-1)
        OR.verify_threshold_margin(d2, cap.length2, f"cap {name}")

    cols, conds = [], []
    for name, cap in _caps():
        c = cap.center
        d2 = (
            f"((px-({c[0]!r}))*(px-({c[0]!r})) + (py-({c[1]!r}))*(py-({c[1]!r}))"
            f" + (pz-({c[2]!r}))*(pz-({c[2]!r})))"
        )
        cols.append(
            f"CASE WHEN {d2} <= {cap.length2!r} THEN 1 ELSE 0 END AS in_{name}"
        )
        conds.append(f"{d2} <= {cap.length2!r}")
    return f"""
    WITH {OR.pts_cte()}
    SELECT key, {', '.join(cols)}
    FROM xyz WHERE {' OR '.join(conds)} ORDER BY key
    """


def _q_geo_polyline_interpolate(spark, sf_dir):
    """S2ChainInterpolationQuery semantics over the scatter: each key
    interpolates the fixture polyline at fraction (key%1000)/1000."""
    verts = _project_polyline_vertices()

    @F.pandas_udf("px double, py double, pz double")
    def interp(key: pd.Series) -> pd.DataFrame:
        from s2geometry_spark.kernel.measures import polyline_interpolate

        rows = [
            polyline_interpolate(verts, (int(k) % 1000) / 1000.0)
            for k in key
        ]
        return pd.DataFrame(
            {"px": [r[0] for r in rows], "py": [r[1] for r in rows],
             "pz": [r[2] for r in rows]}
        )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = cust.select(F.col("c_custkey").alias("key")).withColumn(
        "_p", interp("key")
    )
    return out.select(
        "key",
        F.round("_p.px", 9).alias("px_r"),
        F.round("_p.py", 9).alias("py_r"),
        F.round("_p.pz", 9).alias("pz_r"),
    ).orderBy("key")


def _alignment_fixture():
    """Deterministic trajectory clusters for geo_polyline_alignment:
    4 groups of 2-5 trajectories (the 2-trajectory group exercises the
    reference's lowest-index medoid tie-break), 8-14 vertices each,
    group g3 ragged-length to cover non-square DP tables.  lat/lng are
    Python doubles whose repr feeds BOTH engines, so the fixture is
    bit-identical on the Spark and DuckDB sides."""
    out = []
    for g in range(4):
        for m in range(2 + g):
            n_v = (8 + 2 * g) if g < 3 else (8 + m)
            lls = []
            for v in range(n_v):
                lat = (
                    5.0 * g + 0.3 * v + 0.07 * m
                    + 0.01 * ((7 * g + 3 * m + v * v) % 13)
                )
                lng = 10.0 * g + 0.4 * v + 0.02 * ((5 * m + 2 * v) % 11)
                lls.append((lat, lng))
            out.append((f"g{g}", m, lls))
    return out


def _q_geo_polyline_alignment(spark, sf_dir):
    """Distributed Dynamic-Timewarp vertex alignment
    (s2polyline_alignment.h:125-180): exact per-pair alignment costs +
    per-group medoid over the trajectory clusters.  Each pair's
    operands co-locate under one pair_id shuffle (vectorized kernel DP
    per pair, O(A*B) bounded by trajectory length); the medoid is the
    argmin of mirrored pair-cost sums with the lowest-ord tie-break."""
    from s2geometry_spark.kernel.contains import parse_points
    from s2geometry_spark.operators.alignment_ops import (
        alignment_cost_pairs,
        group_pairs,
    )

    vrows, prows = [], []
    for grp, ordv, lls in _alignment_fixture():
        pid = f"{grp}|{ordv}"
        pts = parse_points(", ".join(f"{la}:{ln}" for la, ln in lls))
        prows.append((grp, pid, ordv))
        for vi, p in enumerate(pts):
            vrows.append((pid, vi, float(p[0]), float(p[1]), float(p[2])))
    vertices = spark.createDataFrame(
        vrows, "polyline_id string, vertex_idx int, x double, y double, z double"
    ).repartition(8)
    polylines = spark.createDataFrame(prows, "grp string, polyline_id string, ord int")
    pairs = group_pairs(polylines)
    costs = alignment_cost_pairs(
        vertices, pairs.select("pair_id", "id_a", "id_b")
    ).localCheckpoint(eager=False)
    per_pair = pairs.select("pair_id", "grp", "ord_a", "ord_b").join(costs, "pair_id")
    charged = per_pair.select(
        "grp", F.col("ord_a").alias("ord"), "cost"
    ).unionByName(per_pair.select("grp", F.col("ord_b").alias("ord"), "cost"))
    totals = charged.groupBy("grp", "ord").agg(F.sum("cost").alias("total"))
    med = totals.groupBy("grp").agg(
        F.min(F.struct("total", "ord")).alias("_m")
    ).select("grp", F.col("_m.ord").alias("medoid_ord"))
    return (
        per_pair.join(med, "grp")
        .select(
            "grp", "ord_a", "ord_b",
            F.round("cost", 6).alias("cost_r"), "medoid_ord",
        )
        .orderBy("grp", "ord_a", "ord_b")
    )


def _nesting_fixture():
    """Nested-ring shapes for shape_nesting_join: a lone ring, a donut,
    a depth-4 alternating concentric stack, a button with two sibling
    holes, and a two-pair forest (disjoint shell+hole islands in one
    shape).  Rings are 24-gon lat/lng circles; every ring's disc-vs-rep
    containment margin clears the oracle's 0.05·sin(r) guard (checked
    at build time by nesting_fixture_sql), so polygonal chord sag
    cannot flip a classification between the engines.

    Returns [(shape, ring, vertices(24,3), center_xyz, cos_radius)]."""
    import math

    import numpy as np

    from s2geometry_spark.kernel.coords import latlng_to_xyz

    K = 24
    specs = [
        ("s0", [(0.0, 0.0, 10.0, False)]),
        ("s1", [(0.0, 60.0, 20.0, False), (0.0, 60.0, 10.0, True)]),
        ("s2", [(0.0, 120.0, 40.0, False), (0.0, 120.0, 24.0, True),
                (0.0, 120.0, 14.0, False), (0.0, 120.0, 7.0, True)]),
        ("s3", [(0.0, -100.0, 20.0, False), (0.0, -107.0, 5.0, True),
                (0.0, -93.0, 5.0, True)]),
        ("s4", [(0.0, 150.0, 15.0, False), (0.0, 150.0, 6.0, True),
                (0.0, 185.0, 12.0, False), (0.0, 185.0, 4.0, True)]),
    ]
    out = []
    for shape, rs in specs:
        for ring, (clat, clng, r, reverse) in enumerate(rs):
            ang = 2.0 * math.pi * np.arange(K) / K
            lat = clat + r * np.sin(ang)
            lng = clng + r * np.cos(ang)
            x, y, z = latlng_to_xyz(lat, lng)
            v = np.stack([x, y, z], -1)
            if reverse:
                v = v[::-1]
            cx, cy, cz = latlng_to_xyz(np.float64(clat), np.float64(clng))
            out.append(
                (shape, ring, v,
                 np.array([float(cx), float(cy), float(cz)]),
                 math.cos(math.radians(0.8 * r)))
            )
    return out


def _q_shape_nesting(spark, sf_dir):
    """Distributed shell/hole nesting classification
    (S2ShapeNestingQuery, s2shape_nesting_query.h:76-160): ONE
    groupBy(shape_id) shuffle; the crossing-parity kernel runs per
    shape inside applyInPandas, so per-task cost is bounded by shape
    size, never table size — the plan a lake of millions of multi-ring
    polygons needs."""
    from s2geometry_spark.operators.nesting_ops import shape_nesting_join

    rows = []
    for shape, ring, v, _c, _t in _nesting_fixture():
        for vi, p in enumerate(v):
            rows.append(
                (shape, int(ring), vi, float(p[0]), float(p[1]), float(p[2]))
            )
    chain_vertices = spark.createDataFrame(
        rows,
        "shape_id string, chain_id int, vertex_idx int,"
        " x double, y double, z double",
    ).repartition(8)
    return shape_nesting_join(chain_vertices).orderBy("shape_id", "chain_id")


_LOOPREL_PAIRS = [
    # (pair_id, (clat, clng, radius_deg) for a, same for b): nested
    # concentric, nested offset, contained, disjoint, crossing equal,
    # crossing unequal — margins from both disc thresholds ≥ 4°
    # (guard-checked at oracle build time).
    ("p1", (0.0, 0.0, 20.0), (0.0, 0.0, 8.0)),
    ("p2", (0.0, 40.0, 18.0), (0.0, 45.0, 6.0)),
    ("p3", (0.0, 80.0, 6.0), (0.0, 80.0, 15.0)),
    ("p4", (0.0, 120.0, 8.0), (0.0, 140.0, 8.0)),
    ("p5", (0.0, 170.0, 10.0), (0.0, 178.0, 10.0)),
    ("p6", (0.0, -100.0, 12.0), (0.0, -88.0, 6.0)),
]


def _looprel_fixture():
    """(pair_id, side, vertices(24,3), center_xyz, radius_rad) rows for
    geo_loop_relations — 24-gon CCW lat/lng circles (same construction
    as _nesting_fixture)."""
    import math

    import numpy as np

    from s2geometry_spark.kernel.coords import latlng_to_xyz

    K = 24
    out = []
    for pid, spec_a, spec_b in _LOOPREL_PAIRS:
        for side, (clat, clng, r) in (("a", spec_a), ("b", spec_b)):
            ang = 2.0 * math.pi * np.arange(K) / K
            x, y, z = latlng_to_xyz(clat + r * np.sin(ang), clng + r * np.cos(ang))
            cx, cy, cz = latlng_to_xyz(np.float64(clat), np.float64(clng))
            out.append(
                (pid, side, np.stack([x, y, z], -1),
                 np.array([float(cx), float(cy), float(cz)]),
                 math.radians(r))
            )
    return out


def _q_geo_loop_relations(spark, sf_dir):
    """Distributed loop↔loop relation classification
    (S2Loop::Contains/Intersects/CompareBoundary, s2loop.cc:1056-1235):
    ONE groupBy(pair_id) shuffle, the kernel's vectorized crossing/wedge
    sweep per pair in applyInPandas — per-task cost bounded by loop
    size, never table size."""
    from s2geometry_spark.operators.looprel_ops import loop_relations_join

    rows = []
    for pid, side, v, _c, _r in _looprel_fixture():
        for vi, p in enumerate(v):
            rows.append((pid, side, vi, float(p[0]), float(p[1]), float(p[2])))
    pair_vertices = spark.createDataFrame(
        rows,
        "pair_id string, side string, vertex_idx int,"
        " x double, y double, z double",
    ).repartition(8)
    return loop_relations_join(pair_vertices).orderBy("pair_id")


def _q_geo_hausdorff(spark, sf_dir):
    """Directed Hausdorff per point group (key % 8) to the ring
    polyline — max-of-min squared-chord distances, exact SQL oracle."""
    from s2geometry_spark.operators.closest_edges import directed_hausdorff_join

    pts = _tile_points(spark, sf_dir).withColumn("grp", F.col("key") % 8)
    out = directed_hausdorff_join(pts, [_ring_polyline_shape()], "grp")
    return out.select(
        "grp", F.round("hausdorff_d2", 12).alias("hausdorff_d2_r")
    ).orderBy("grp")


def _hausdorff_oracle() -> str:
    from s2geometry_spark.functions import oracles as OR

    shape = _ring_polyline_shape()
    exprs = [
        OR.edge_dist2_sql(shape.edges_c[e], shape.edges_d[e])
        for e in range(len(shape.edges_c))
    ]
    min_d2 = "least(" + ", ".join(exprs) + ")"
    return f"""
    WITH {OR.pts_cte()},
    d AS (SELECT key % 8 AS grp, {min_d2} AS d2 FROM xyz)
    SELECT grp, round(max(d2), 12) AS hausdorff_d2_r
    FROM d GROUP BY grp ORDER BY grp
    """


_WINDING_SQUARES = (
    "0:0, 0:4, 4:4, 4:0; 1:1, 1:5, 5:5, 5:1; 2:2, 2:6, 6:6, 6:2;"
    " 3:3, 3:7, 7:7, 7:3; 4:4, 4:8, 8:8, 8:4"
)
_WINDING_JOBS = [
    ("rect_pos", "0:0, 0:10, 10:10, 10:0", "5:5", 1, "POSITIVE", 0),
    ("rect_neg", "0:0, 0:10, 10:10, 10:0", "5:5", 1, "NEGATIVE", 0),
    ("bowtie_odd", "5:-5, -5:5, 5:5, -5:-5", "10:0", 0, "ODD", 0),
    ("bowtie_nonzero", "5:-5, -5:5, 5:5, -5:-5", "10:0", 0, "NON_ZERO", 0),
    ("stairs_union", _WINDING_SQUARES, "0.5:0.5", 1, "POSITIVE", 0),
    ("stairs_ge2", _WINDING_SQUARES, "0.5:0.5", 0, "POSITIVE", 0),
    ("stairs_ge3", _WINDING_SQUARES, "0.5:0.5", -1, "POSITIVE", 0),
    ("stairs_ge4", _WINDING_SQUARES, "0.5:0.5", -2, "POSITIVE", 0),
    ("stairs_ge5", _WINDING_SQUARES, "0.5:0.5", -3, "POSITIVE", 0),
    # degenerate boundaries (include_degeneracies,
    # s2winding_operation.h:96-124): a triangle plus its exact reverse
    # cancels to three sibling-pair arcs under ODD; point shells emit
    # only where the winding number is 0 under POSITIVE
    ("degen_tri_pair", "0:0, 0:5, 5:0; 5:0, 0:5, 0:0", "80:80", 0, "ODD", 1),
    (
        "degen_point_union",
        "0:0, 0:10, 10:10, 10:0; 20:20; 5:5; 30:4, 30:6",
        "80:80", 0, "POSITIVE", 1,
    ),
]


_BUFFER_JOBS = [
    # (job, loops, radius_deg, circle_segments); convex jobs are
    # Steiner-gated in the oracle
    ("buf_sq", "0:0, 0:4, 4:4, 4:0", 1.0, 64.0),
    ("buf_sq_big", "0:0, 0:4, 4:4, 4:0", 5.0, 64.0),
    ("buf_tri", "10:10, 10:20, 20:15", 2.0, 64.0),
    ("buf_lshape", "0:0, 0:4, 2:4, 2:2, 4:2, 4:0", 1.0, 64.0),
    ("buf_holed", "0:0, 0:6, 6:6, 6:0; 2:2, 2:4, 4:4, 4:2", 0.5, 64.0),
]
_BUFFER_CONVEX = {"buf_sq", "buf_sq_big", "buf_tri"}


def _q_geo_buffer(spark, sf_dir):
    """Distributed S2BufferOperation job table (offset trace → winding
    resolution per executor): convex, reflex, and holed fixtures; the
    oracle gates the convex rows on the exact spherical Steiner formula
    computed from input vertices only."""
    from s2geometry_spark.operators.overlay import buffer_ops_join

    jobs = spark.createDataFrame(
        _BUFFER_JOBS,
        "job string, loops string, radius_deg double, segments double",
    ).repartition(3)
    return buffer_ops_join(jobs).select(
        "job", "n_loops", F.round("signed_area", 9).alias("area_r")
    ).orderBy("job")


def _q_geo_winding_ops(spark, sf_dir):
    """Distributed S2WindingOperation job table: rectangle, bow tie
    (ODD + NON_ZERO rules), and the 5-square staircase at every winding
    threshold 1..5 (the full layer-cake, which the oracle checks against
    the input squares' summed areas)."""
    from s2geometry_spark.operators.overlay import winding_ops_join

    jobs = spark.createDataFrame(
        _WINDING_JOBS,
        "job string, loops string, ref string, ref_winding int,"
        " rule string, degen int",
    ).repartition(3)
    return winding_ops_join(jobs).select(
        "job", "n_loops", "is_full", F.round("signed_area", 9).alias("area_r"),
        "n_deg_points", "n_deg_edges",
    ).orderBy("job")


def _q_geo_raster_roundtrip(spark, sf_dir):
    """Raster ↔ vector round trip (north-rule item): rasterize a polygon
    at level 7 (center sampling over the full 6·4^7 grid), vectorize the
    raster back to its boundary polygon, re-rasterize the vector — the
    result must be the fixed point, which the oracle computes as one
    direct rasterization of the original polygon."""
    from s2geometry_spark.operators.raster import (
        rasterize_polygon,
        vectorize_cells,
    )

    poly = dict(_continental_polygons())["europe"]
    r1 = rasterize_polygon(spark, poly, level=7)
    vec = vectorize_cells(r1, level=7)
    r2 = rasterize_polygon(spark, vec, level=7)
    return r2.orderBy("face", "i", "j")


def _q_geo_polyline_project(spark, sf_dir):
    """S2Polyline::Project + UnInterpolate over the scatter: every point
    projects onto a broadcast polyline; output is the projected point and
    the fraction along the line (one scan, zero shuffles)."""
    from s2geometry_spark.operators.polyline_ops import (
        project_points_onto_polyline,
    )

    out = project_points_onto_polyline(
        _tile_points(spark, sf_dir), _project_polyline_vertices()
    )
    return out.select(
        "key",
        F.round("proj_x", 9).alias("proj_x_r"),
        F.round("proj_y", 9).alias("proj_y_r"),
        F.round("proj_z", 9).alias("proj_z_r"),
        F.round("fraction", 9).alias("fraction_r"),
    ).orderBy("key")


_CLOSEST_EDGES_JOIN_INDEX = "# 0:0, 0:5, 5:5, 5:0 # 0:10, 0:15, 5:15, 5:10"


def _q_geo_closest_edges_join(spark, sf_dir):
    """Nearest-edge join (k=1) for every scatter point within 45°."""
    import math

    from s2geometry_spark.kernel.closest_edge import parse_index
    from s2geometry_spark.operators.closest_edges import closest_edges_join

    shapes = parse_index(_CLOSEST_EDGES_JOIN_INDEX)
    pts = _tile_points(spark, sf_dir)
    out = closest_edges_join(
        pts, shapes, k=1, max_distance_rad=math.radians(45), include_interiors=True
    )
    return out.select(
        "key", "shape_id", "edge_id", F.round("dist2", 12).alias("dist2_r")
    ).orderBy("key", "shape_id", "edge_id")


def _q_geo_relation_matrix(spark, sf_dir):
    """Polygon relation matrix (probe-based overlay relations) as a
    distributed pair table, covering shared-boundary and hemisphere rows
    of s2polygon_test — each pair's relations computed on an executor."""
    from s2geometry_spark.operators.overlay import (
        polygon_pairs_df,
        relation_matrix_join,
    )

    kNear0 = "-1:0, 0:1, 1:0, 0:-1;"
    kNear1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1;"
    kNear2 = "-1:-2, -2:5, 5:-2;"
    kNear3 = "-2:-2, -3:6, 6:-3;"
    kNearHemi = "0:-90, -90:0, 0:90, 90:0;"
    polys = {
        "near_10": kNear0 + kNear1,
        "near_30": kNear3 + kNear0,
        "near_32": kNear2 + kNear3,
        "near_3210": kNear0 + kNear2 + kNear3 + kNear1,
        "near_H3210": kNear0 + kNear2 + kNear3 + kNearHemi + kNear1,
    }
    names = sorted(polys)
    rows = [
        (f"{na}|{nb}", polys[na], polys[nb])
        for i, na in enumerate(names)
        for nb in names[i:]
    ]
    out = relation_matrix_join(polygon_pairs_df(spark, rows), normalize=True)
    return out.select(
        "a", "b", "contains", "contained", "intersects"
    ).orderBy("a", "b")


# Validation fixtures: every row traces to a ported s2validation_query
# test case with the documented error codes for BOTH queries
# (tests/test_valid_query.py; s2validation_query_test.cc).  Geometry is
# encoded as 'points # polylines # polygon-loops' with '|' separating
# shapes and ';' separating loops; 'full' is the 0-vertex loop and
# 'antipodal' the exact-xyz antipodal quad.
_VALIDATE_FIXTURES = [
    # (geom_id, geometry, code, legacy_code)
    ("g01_basic", "## 1:0, 0:-1, -1:0, 0:1", "OK", "OK"),
    ("g02_hole_ok", "## 2:0, 0:-2, -2:0, 0:2; 0:1, -1:0, 0:-1, 1:0", "OK", "OK"),
    ("g03_bad_hole", "## 2:0, 0:-2, -2:0, 0:2; 1:0, 0:-1, -1:0, 0:1",
     "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS",
     "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS"),
    ("g04_dup_edges", "## 2:0, 0:-2, -2:0, 0:2 | 2:0, 0:-2, 0:0",
     "OVERLAPPING_GEOMETRY", "OVERLAPPING_GEOMETRY"),
    ("g05_point_shell", "## 0:0", "OK", "LOOP_NOT_ENOUGH_VERTICES"),
    ("g06_sibling_ring", "## 0:0, 1:1", "OK", "LOOP_NOT_ENOUGH_VERTICES"),
    ("g07_split_interior", "## 3:0, 0:-3, -3:0, 0:3; 3:0, 0:1, -3:0, 0:-1",
     "OK", "OK"),
    ("g08_point_in_polygon", "0:0 ## 2:0, 0:-2, -2:0, 0:2",
     "OVERLAPPING_GEOMETRY", "INVALID_DIMENSION"),
    ("g09_point_outside", "5:5 ## 1:0, 0:-1, -1:0, 0:1",
     "OK", "INVALID_DIMENSION"),
    ("g10_crossing_polylines", "# 0:0, 1:1, 0:2, 1:3 | 1:0, 0:1, 1:2, 0:3 #",
     "OK", "OK"),
    ("g11_antipodal", "antipodal",
     "ANTIPODAL_VERTICES", "ANTIPODAL_VERTICES"),
    ("g12_tangent", "## 1:0, 0:-1, -1:0, 0:1 | 0:1, -1:2, 0:3, 1:2",
     "OK", "OK"),
    ("g13_nested_shells", "## 2:0, 0:-2, -2:0, 0:2; 1:0, 0:-1, -1:0, 0:1;",
     "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS",
     "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS"),
    ("g14_full", "## full", "OK", "OK"),
]


def _validate_fixture_rows():
    import math as _math

    from s2geometry_spark.kernel.contains import parse_points

    rows = []
    for geom_id, geometry, _c, _lc in _VALIDATE_FIXTURES:
        if geometry == "antipodal":
            s = _math.sqrt(0.5)
            quad = [(s, s, 0.0), (0.0, 1.0, 0.0), (-1.0, 0.0, 0.0),
                    (1.0, 0.0, 0.0)]
            for vi, (x, y, z) in enumerate(quad):
                rows.append((geom_id, 0, 2, 0, vi, x, y, z))
            continue
        parts = geometry.split("#")
        while len(parts) < 3:
            parts.append("")
        shape_id = 0
        pts_str = parts[0].strip()
        if pts_str:
            pts = parse_points(pts_str.replace("|", ","))
            for ci, p in enumerate(pts):
                rows.append(
                    (geom_id, shape_id, 0, ci, 0,
                     float(p[0]), float(p[1]), float(p[2]))
                )
            shape_id += 1
        for tok in parts[1].split("|"):
            tok = tok.strip()
            if not tok:
                continue
            for vi, p in enumerate(parse_points(tok)):
                rows.append(
                    (geom_id, shape_id, 1, 0, vi,
                     float(p[0]), float(p[1]), float(p[2]))
                )
            shape_id += 1
        for tok in parts[2].split("|"):
            tok = tok.strip()
            if not tok:
                continue
            for ci, ltok in enumerate(
                t for t in tok.split(";") if t.strip()
            ):
                ltok = ltok.strip()
                if ltok == "full":
                    rows.append((geom_id, shape_id, 2, ci, -1, 0.0, 0.0, 0.0))
                    continue
                for vi, p in enumerate(parse_points(ltok)):
                    rows.append(
                        (geom_id, shape_id, 2, ci, vi,
                         float(p[0]), float(p[1]), float(p[2]))
                    )
            shape_id += 1
    return rows


def _q_geo_validate(spark, sf_dir):
    """Distributed geometry validation (S2ValidQuery +
    S2LegacyValidQuery, s2validation_query.h): ONE groupBy(geom_id)
    shuffle; both validation queries run per geometry inside
    applyInPandas, so a task is bounded by one geometry's edge count —
    the plan for validating millions of extracted geometries before an
    ingest."""
    from s2geometry_spark.operators.validate_ops import validate_geometries

    geoms = spark.createDataFrame(
        _validate_fixture_rows(),
        "geom_id string, shape_id int, dim int, chain_id int,"
        " vertex_idx int, x double, y double, z double",
    ).repartition(8)
    return validate_geometries(geoms).orderBy("geom_id")


def _validate_oracle_sql() -> str:
    vals = ",\n              ".join(
        f"('{g}', {1 if c == 'OK' else 0}, '{c}',"
        f" {1 if lc == 'OK' else 0}, '{lc}')"
        for g, _geom, c, lc in _VALIDATE_FIXTURES
    )
    return f"""
        SELECT * FROM (VALUES
              {vals}
        ) AS t(geom_id, valid_i, code, legacy_valid_i, legacy_code)
        ORDER BY geom_id
    """



# Buffer-shapes jobs: points and polylines through the full
# S2BufferOperation facade (end caps, one-sided buffering, signed and
# degenerate radii) — the polygon paths are covered by geo_buffer.
# Kernel semantics are pinned by the s2buffer_operation_test.cc port
# (tests/test_buffer_operation.py: exact CompareEdgePairDistance
# separation + sampled Hausdorff harnesses); this query gates the
# DISTRIBUTED applyInPandas path row-for-row on kernel digests.
_BUFFER_SHAPE_JOBS = [
    # (job, kind, radius_rad, error_fraction, end_cap, side, latlngs)
    ("pt_round", "point", 0.0872664625997164, 0.02, "round", "both",
     [(10.0, 20.0)]),
    ("pt_zero", "point", 0.0, 0.01, "round", "both", [(3.0, 4.0)]),
    ("pt_full", "point", 3.49065850398866, 0.1, "round", "both",
     [(0.0, 0.0)]),
    ("pl_round", "polyline", 0.0349065850398866, 0.02, "round", "both",
     [(0.0, 0.0), (0.0, 4.0), (3.0, 7.0)]),
    ("pl_flat", "polyline", 0.0349065850398866, 0.02, "flat", "both",
     [(0.0, 0.0), (0.0, 4.0), (3.0, 7.0)]),
    ("pl_left", "polyline", 0.0349065850398866, 0.02, "round", "left",
     [(0.0, 0.0), (0.0, 4.0), (3.0, 7.0)]),
    ("pl_negative", "polyline", -0.0349065850398866, 0.02, "round", "both",
     [(0.0, 0.0), (0.0, 4.0)]),
    ("loop_shrink", "loop", -0.0174532925199433, 0.02, "round", "both",
     [(-3.0, -3.0), (-3.0, 3.0), (3.0, 3.0), (3.0, -3.0)]),
]


def _buffer_shape_rows():
    rows = []
    for job, kind, radius, ef, cap, side, lls in _BUFFER_SHAPE_JOBS:
        for vi, (lat, lng) in enumerate(lls):
            rows.append(
                (job, kind, float(radius), float(ef), cap, side, vi,
                 float(lat), float(lng))
            )
    return rows


def _q_geo_buffer_shapes(spark, sf_dir):
    """Distributed point/polyline buffering (S2BufferOperation,
    s2buffer_operation.h): ONE groupBy(job-key) shuffle; the kernel
    facade (offset arcs, end caps, sweep-edge winding tracking, winding
    resolution) runs per job inside applyInPandas — a task is bounded
    by one job's offset-path size, never the table's."""
    from s2geometry_spark.operators.buffer_ops import buffer_shapes_join

    jobs = spark.createDataFrame(
        _buffer_shape_rows(),
        "job string, kind string, radius_rad double,"
        " error_fraction double, end_cap string, side string,"
        " vertex_idx int, lat double, lng double",
    ).repartition(8)
    return buffer_shapes_join(jobs).orderBy("job", "loop_idx")


def _buffer_shapes_oracle_sql() -> str:
    import numpy as np

    from s2geometry_spark.kernel.buffer import (
        BufferOperation,
        BufferOptions,
    )
    from s2geometry_spark.kernel.coords import latlng_to_xyz
    from s2geometry_spark.operators.polyline_ops import simplify_digest

    rows = []
    for job, kind, radius, ef, cap, side, lls in _BUFFER_SHAPE_JOBS:
        options = BufferOptions(radius)
        options.set_error_fraction(ef)
        options.end_cap_style = cap
        options.polyline_side = side
        op = BufferOperation(options)
        lat = np.array([p[0] for p in lls], np.float64)
        lng = np.array([p[1] for p in lls], np.float64)
        x, y, z = latlng_to_xyz(lat, lng)
        v = np.stack([x, y, z], -1)
        if kind == "point":
            for p in v:
                op.add_point(p)
        elif kind == "polyline":
            op.add_polyline(v)
        else:
            op.add_loop(v)
        result = op.build()
        if not result.loops:
            rows.append(
                f"('{job}', -1, 0, '{simplify_digest(np.empty((0, 3)))}',"
                f" {int(result.is_full())}, {int(result.is_empty())})"
            )
        else:
            for li, loop in enumerate(result.loops):
                rows.append(
                    f"('{job}', {li}, {len(loop)},"
                    f" '{simplify_digest(loop)}', 0, 0)"
                )
    values = ", ".join(rows)
    return f"""
    SELECT job, CAST(loop_idx AS INTEGER) AS loop_idx,
           CAST(n_vertices AS INTEGER) AS n_vertices, digest,
           CAST(full_i AS INTEGER) AS full_i,
           CAST(empty_i AS INTEGER) AS empty_i
    FROM (VALUES {values})
         AS t(job, loop_idx, n_vertices, digest, full_i, empty_i)
    ORDER BY job, loop_idx
    """


# Region wire-format fixtures: every geometry is one of the version-1 /
# version-4 golden cases from s2region_test.cc:50-169, so the expected
# hex below is the REFERENCE's own encoder output (authoritative,
# C++-sourced), not a pinned output of this engine.
# (geom_id, kind, [(chain_latlngs_or_special, depth), ...], golden_hex)
_ENCODE_FIXTURES = [
    ("loop_cross", "loop",
     [("-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1", 0)],
     "0108000000D44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA1BFB4825F3C81FD"
     "EF3F27DCF7C958DE913F1EDD892B0BDF91BFB4825F3C81FDEF3F27DCF7C958DE913F1E"
     "DD892B0BDF913FD44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA13FD44A8442"
     "C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA13FB4825F3C81FDEF3F27DCF7C958DE91"
     "BF1EDD892B0BDF913FB4825F3C81FDEF3F27DCF7C958DE91BF1EDD892B0BDF91BFD44A"
     "8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA1BF0000000000013EFC10E8F8DFA1"
     "BF3EFC10E8F8DFA13F389D52A246DF91BF389D52A246DF913F"),
    ("loop_empty", "loop", [("@empty", 0)],
     "010100000000000000000000000000000000000000000000000000F03F000000000001"
     "000000000000F03F0000000000000000182D4454FB210940182D4454FB2109C0"),
    ("loop_full", "loop", [("@full", 0)],
     "010100000000000000000000000000000000000000000000000000F0BF010000000001"
     "182D4454FB21F9BF182D4454FB21F93F182D4454FB2109C0182D4454FB210940"),
    ("polygon_cross", "polygon",
     [("-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1", 0)],
     "010100010000000108000000D44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA1"
     "BFB4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF91BFB4825F3C81FDEF3F27DC"
     "F7C958DE913F1EDD892B0BDF913FD44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958"
     "DEA13FD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA13FB4825F3C81FDEF3F"
     "27DCF7C958DE91BF1EDD892B0BDF913FB4825F3C81FDEF3F27DCF7C958DE91BF1EDD89"
     "2B0BDF91BFD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA1BF000000000001"
     "3EFC10E8F8DFA1BF3EFC10E8F8DFA13F389D52A246DF91BF389D52A246DF913F013EFC"
     "10E8F8DFA1BF3EFC10E8F8DFA13F389D52A246DF91BF389D52A246DF913F"),
    ("polygon_cross_hole", "polygon",
     [("-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1", 0),
      ("-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5", 1)],
     "010101020000000108000000D44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA1"
     "BFB4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF91BFB4825F3C81FDEF3F27DC"
     "F7C958DE913F1EDD892B0BDF913FD44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958"
     "DEA13FD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA13FB4825F3C81FDEF3F"
     "27DCF7C958DE91BF1EDD892B0BDF913FB4825F3C81FDEF3F27DCF7C958DE91BF1EDD89"
     "2B0BDF91BFD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA1BF000000000001"
     "3EFC10E8F8DFA1BF3EFC10E8F8DFA13F389D52A246DF91BF389D52A246DF913F010400"
     "0000C5D7FA4B60FFEF3F1EDD892B0BDF813F214C95C437DF81BFC5D7FA4B60FFEF3F1E"
     "DD892B0BDF813F214C95C437DF813FC5D7FA4B60FFEF3F1EDD892B0BDF81BF214C95C4"
     "37DF813FC5D7FA4B60FFEF3F1EDD892B0BDF81BF214C95C437DF81BF00010000000190"
     "0C5E3B73DF81BF900C5E3B73DF813F399D52A246DF81BF399D52A246DF813F013EFC10"
     "E8F8DFA1BF3EFC10E8F8DFA13F389D52A246DF91BF389D52A246DF913F"),
    ("polygon_empty_compact", "polygon_compact", [("@none", 0)], "041E00"),
    ("polygon_full_compact", "polygon_compact", [("@full", 0)],
     "040001010B000100"),
    ("polyline_empty", "polyline", [("@none", 0)], "0100000000"),
    ("polyline_semi_equator", "polyline", [("0:0, 0:90, 0:180", 0)],
     "0103000000000000000000F03F00000000000000000000000000000000075C143326A6"
     "913C000000000000F03F0000000000000000000000000000F0BF075C143326A6A13C00"
     "00000000000000"),
    ("polyline_3segments", "polyline", [("0:0, 0:10, 10:20, 20:30", 0)],
     "0104000000000000000000F03F00000000000000000000000000000000171C818C8B83"
     "EF3F89730B7E1A3AC63F000000000000000061B46C3A039DED3FE2DC829F868ED53F89"
     "730B7E1A3AC63F1B995E6FA10AEA3F1B2D5242F611DE3FF50B8A74A8E3D53F"),
]


def _encode_fixture_rows():
    from s2geometry_spark.kernel.contains import parse_points

    rows = []
    for geom_id, kind, chains, _hex in _ENCODE_FIXTURES:
        for ci, (spec, depth) in enumerate(chains):
            if spec == "@none":
                rows.append((geom_id, kind, ci, depth, -1, 0.0, 0.0, 0.0))
            elif spec == "@empty":
                rows.append((geom_id, kind, ci, depth, 0, 0.0, 0.0, 1.0))
            elif spec == "@full":
                rows.append((geom_id, kind, ci, depth, 0, 0.0, 0.0, -1.0))
            else:
                for vi, p in enumerate(parse_points(spec)):
                    rows.append(
                        (geom_id, kind, ci, depth, vi,
                         float(p[0]), float(p[1]), float(p[2]))
                    )
    return rows


def _q_geo_encode_regions(spark, sf_dir):
    """Distributed wire-format export (s2region Encode/Decode,
    s2loop.cc:640, s2polygon.cc:731, s2polyline.cc:425): ONE
    groupBy(geom_id) shuffle; the byte-exact kernel encoders run per
    geometry inside applyInPandas, so a task holds one geometry's
    vertices — the plan for exporting millions of Parquet geometries to
    the reference's wire format."""
    from s2geometry_spark.operators.encode_ops import encode_geometries

    geoms = spark.createDataFrame(
        _encode_fixture_rows(),
        "geom_id string, kind string, chain_id int, depth int,"
        " vertex_idx int, x double, y double, z double",
    ).repartition(8)
    return encode_geometries(geoms).orderBy("geom_id")


def _encode_oracle_sql() -> str:
    vals = ",\n              ".join(
        f"('{g}', '{hx}', {len(hx) // 2})"
        for g, _k, _c, hx in _ENCODE_FIXTURES
    )
    return f"""
        SELECT geom_id, encoding_hex, CAST(n_bytes AS INTEGER) AS n_bytes
        FROM (VALUES
              {vals}
        ) AS t(geom_id, encoding_hex, n_bytes)
        ORDER BY geom_id
    """


def _encode_vector_rows():
    from s2geometry_spark.functions.encode_vector_fixtures import fixtures

    rows = []
    for vec_id, kind, elements, _ref in fixtures():
        for idx, el in enumerate(elements):
            if kind in ("cellid_vector", "uint_vector"):
                # two's-complement into the signed long column
                v = el - (1 << 64) if el >= (1 << 63) else el
                rows.append((vec_id, kind, idx, v, 0.0, 0.0, 0.0, ""))
            elif kind == "string_vector":
                rows.append((vec_id, kind, idx, 0, 0.0, 0.0, 0.0, el))
            else:
                x, y, z = el
                rows.append((vec_id, kind, idx, 0, x, y, z, ""))
    return rows


def _q_geo_encode_vectors(spark, sf_dir):
    """Distributed encoded-vector export (EncodeS2CellIdVector,
    EncodeS2PointVector FAST/COMPACT, EncodeUintVector,
    StringVectorEncoder — encoded_s2cell_id_vector.cc:61,
    encoded_s2point_vector.cc:108): ONE groupBy(vec_id) shuffle, the
    byte-exact kernel encoders inside applyInPandas; gated on the
    reference's own expected sizes (CoveringCells 488 B, SixFaceCells
    8 B, PointsAtMultipleLevels 83 B, …) via the pinned oracle."""
    from s2geometry_spark.operators.encode_ops import encode_vectors

    vecs = spark.createDataFrame(
        _encode_vector_rows(),
        "vec_id string, kind string, idx int, cell_id long,"
        " x double, y double, z double, s string",
    ).repartition(8)
    return encode_vectors(vecs).orderBy("vec_id")


def _encode_vectors_oracle_sql() -> str:
    from s2geometry_spark.functions.encode_vector_fixtures import fixtures
    from s2geometry_spark.operators.encode_ops import _encode_vector_one
    import pandas as pd

    vals = []
    for vec_id, kind, elements, ref_bytes in fixtures():
        if kind in ("cellid_vector", "uint_vector"):
            pdf = pd.DataFrame({
                "kind": kind, "idx": range(len(elements)),
                "cell_id": [int(e) for e in elements],
            })
        elif kind == "string_vector":
            pdf = pd.DataFrame({
                "kind": kind, "idx": range(len(elements)), "s": elements,
            })
        else:
            pdf = pd.DataFrame({
                "kind": kind, "idx": range(len(elements)),
                "x": [e[0] for e in elements],
                "y": [e[1] for e in elements],
                "z": [e[2] for e in elements],
            })
        raw = _encode_vector_one(pdf)
        # the REFERENCE's expected size is the hard gate: pin it, not len(raw)
        vals.append(f"('{vec_id}', '{raw.hex().upper()}', {ref_bytes})")
    joined = ",\n              ".join(vals)
    return f"""
        SELECT vec_id, encoding_hex, CAST(n_bytes AS INTEGER) AS n_bytes
        FROM (VALUES
              {joined}
        ) AS t(vec_id, encoding_hex, n_bytes)
        ORDER BY vec_id
    """


def _shape_index_rows():
    from s2geometry_spark.functions.encode_vector_fixtures import (
        shape_index_fixtures,
    )

    rows = []
    for index_id, shapes, _rb, _rh in shape_index_fixtures():
        for sid, (kind, chains) in enumerate(shapes):
            if kind == "released":
                rows.append((index_id, sid, kind, 0, -1, 0.0, 0.0, 0.0))
                continue
            for ci, chain in enumerate(chains):
                for vi, p in enumerate(chain):
                    rows.append((index_id, sid, kind, ci, vi,
                                 float(p[0]), float(p[1]), float(p[2])))
    return rows


def _q_geo_encode_shape_index(spark, sf_dir):
    """Distributed exact shape-index snapshot export: each task builds
    the reference-exact MutableS2ShapeIndex for one geometry group
    (padded-cell recursion + Hilbert interior tracking + short-edge
    rule, mutable_s2shape_index.cc:1380-1925) and emits the byte-exact
    wire format (cc:1988-2008).  ONE groupBy(index_id) shuffle; gated
    on the reference's own RegularLoops size table and the
    JavaByteCompatibility golden hex."""
    from s2geometry_spark.operators.encode_ops import encode_shape_indexes

    shapes = spark.createDataFrame(
        _shape_index_rows(),
        "index_id string, shape_id int, kind string, chain_id int,"
        " vertex_idx int, x double, y double, z double",
    ).repartition(8)
    return encode_shape_indexes(shapes).orderBy("index_id")


def _shape_index_oracle_sql() -> str:
    import pandas as pd

    from s2geometry_spark.functions.encode_vector_fixtures import (
        shape_index_fixtures,
    )
    from s2geometry_spark.operators.encode_ops import _build_index_one

    vals = []
    for index_id, shapes, ref_bytes, ref_hex in shape_index_fixtures():
        rows = []
        for sid, (kind, chains) in enumerate(shapes):
            if kind == "released":
                rows.append((sid, kind, 0, -1, 0.0, 0.0, 0.0))
                continue
            for ci, chain in enumerate(chains):
                for vi, p in enumerate(chain):
                    rows.append((sid, kind, ci, vi,
                                 float(p[0]), float(p[1]), float(p[2])))
        pdf = pd.DataFrame(
            rows, columns=["shape_id", "kind", "chain_id", "vertex_idx",
                           "x", "y", "z"])
        n_cells, raw = _build_index_one(pdf)
        # prefer the REFERENCE's published values as the pinned truth
        hx = ref_hex if ref_hex is not None else raw.hex().upper()
        nb = ref_bytes if ref_bytes is not None else len(raw)
        vals.append(f"('{index_id}', {n_cells}, '{hx}', {nb})")
    joined = ",\n              ".join(vals)
    return f"""
        SELECT index_id, CAST(n_cells AS INTEGER) AS n_cells,
               encoding_hex, CAST(n_bytes AS INTEGER) AS n_bytes
        FROM (VALUES
              {joined}
        ) AS t(index_id, n_cells, encoding_hex, n_bytes)
        ORDER BY index_id
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cell_hierarchy": _q_cell_hierarchy,
        "cell_containment_join": _q_cell_containment,
        "cell_histogram": _q_cell_histogram,
        "geo_mentions_per_cell": _q_geo_mentions_per_cell,
        "geo_pip_join": _q_geo_pip_join,
        "geo_knn": _q_geo_knn,
        "geo_polygon_covering": _q_geo_polygon_covering,
        "text_token_stats": _q_text_token_stats,
        "text_quality": _q_text_quality,
        "text_lang_id": _q_text_lang_id,
        "text_fingerprint": _q_text_fingerprint,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram,
        "dedup_jaccard_prefix": _q_dedup_jaccard_prefix,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_components": _q_dedup_components,
        "dedup_simhash": _q_dedup_simhash,
        "ann_cosine_topk": _q_ann_cosine_topk,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ann_pq_topk": _q_ann_pq_topk,
        "embedding_near_dup": _q_embedding_near_dup,
        "multimodal_features": _q_multimodal_features,
        "sample_stratified": _q_sample_stratified,
        "events_window": _q_events_window,
        "tiling_web_tiles": _q_tiling_web_tiles,
        "cell_index_labels": _q_cell_index_labels,
        "cell_density_rollup": _q_cell_density_rollup,
        "cell_density_tree": _q_cell_density_tree,
        "geo_rect_filter": _q_geo_rect_filter,
        "geo_loop_measures": _q_geo_loop_measures,
        "geo_cellunion_ops": _q_geo_cellunion_ops,
        "geo_closest_edge": _q_geo_closest_edge,
        "geo_furthest_edge": _q_geo_furthest_edge,
        "geo_boolean_ops": _q_geo_boolean_ops,
        "geo_mixed_ops": _q_geo_mixed_ops,
        "geo_boolean_ops_snapped": _q_geo_boolean_ops_snapped,
        "geo_boolean_ops_sharded": _q_geo_boolean_ops_sharded,
        "geo_relation_matrix": _q_geo_relation_matrix,
        "geo_closest_edges_join": _q_geo_closest_edges_join,
        "geo_shape_index_join": _q_geo_shape_index_join,
        "geo_polyline_project": _q_geo_polyline_project,
        "geo_raster_roundtrip": _q_geo_raster_roundtrip,
        "geo_winding_ops": _q_geo_winding_ops,
        "geo_buffer": _q_geo_buffer,
        "geo_cap_filter": _q_geo_cap_filter,
        "geo_polyline_interpolate": _q_geo_polyline_interpolate,
        "geo_polyline_simplify": _q_geo_polyline_simplify,
        "geo_layer_assembly": _q_geo_layer_assembly,
        "geo_meridian_split": _q_geo_meridian_split,
        "geo_convex_hull": _q_geo_convex_hull,
        "geo_hausdorff": _q_geo_hausdorff,
        "geo_polyline_alignment": _q_geo_polyline_alignment,
        "shape_nesting_join": _q_shape_nesting,
        "geo_loop_relations": _q_geo_loop_relations,
        "geo_validate": _q_geo_validate,
        "geo_buffer_shapes": _q_geo_buffer_shapes,
        "geo_encode_regions": _q_geo_encode_regions,
        "geo_encode_vectors": _q_geo_encode_vectors,
        "geo_encode_shape_index": _q_geo_encode_shape_index,
    }


# Published relation constants: s2polygon_test.cc:697-779 cross rows for
# the near_* family + reflexive self rows (a polygon contains, is
# contained by, and intersects itself).
_RELATION_EXPECTED = [
    ("near_10", "near_10", 1, 1, 1),
    ("near_10", "near_30", 0, 1, 1),
    ("near_10", "near_32", 0, 0, 0),
    ("near_10", "near_3210", 0, 1, 1),
    ("near_10", "near_H3210", 0, 0, 0),
    ("near_30", "near_30", 1, 1, 1),
    ("near_30", "near_32", 1, 0, 1),
    ("near_30", "near_3210", 1, 0, 1),
    ("near_30", "near_H3210", 0, 0, 1),
    ("near_32", "near_32", 1, 1, 1),
    ("near_32", "near_3210", 0, 1, 1),
    ("near_32", "near_H3210", 0, 0, 0),
    ("near_3210", "near_3210", 1, 1, 1),
    ("near_3210", "near_H3210", 0, 0, 0),
    ("near_H3210", "near_H3210", 1, 1, 1),
]


def _relation_matrix_oracle() -> str:
    """VALUES oracle of the reference-published relation matrix — the
    hard signal that the *distributed* relation path reproduces the
    s2polygon_test constants."""
    vals = ", ".join(
        f"('{a}', '{b}', {c}, {d}, {i})" for a, b, c, d, i in _RELATION_EXPECTED
    )
    return f"""
    SELECT a, b, "contains", contained, intersects
    FROM (VALUES {vals}) AS t(a, b, "contains", contained, intersects)
    ORDER BY a, b
    """


def _covering_oracle() -> str:
    """Golden-pinned coverer oracle (the reference pins coverer output
    per snapshot too, s2region_coverer_test.cc:534-558): VALUES of the
    (polygon_id, cell_id_s, is_interior) goldens, with two INDEPENDENT
    recomputations layered on top — the token column is re-derived in
    SQL from cell_id_s (nibble hex + trailing-zero strip, bias removed
    by xor-ing the top nibble), and the result is gated on range-algebra
    disjointness within each polygon plus the is_valid bit pattern
    (s2cell_id.h:583-585)."""
    from s2geometry_spark.functions.golden_covering import GOLDEN_COVERING

    vals = ", ".join(
        f"('{pid}', {cid}::BIGINT, {'TRUE' if it else 'FALSE'})"
        for pid, cid, it in GOLDEN_COVERING
    )
    nibs = [
        "substr('0123456789abcdef', (xor((cell_id_s >> 60) & 15, 8))::INT + 1, 1)"
    ]
    for i in range(14, -1, -1):
        nibs.append(
            f"substr('0123456789abcdef', ((cell_id_s >> {4 * i}) & 15)::INT + 1, 1)"
        )
    hex_full = " || ".join(nibs)
    return f"""
    WITH g(polygon_id, cell_id_s, is_interior) AS (VALUES {vals}),
    r AS (
      SELECT polygon_id, cell_id_s,
             cell_id_s - ((cell_id_s & -cell_id_s) - 1) AS lo,
             cell_id_s + ((cell_id_s & -cell_id_s) - 1) AS hi
      FROM g),
    checks AS (
      SELECT
        (SELECT count(*) FROM r a JOIN r b
           ON a.polygon_id = b.polygon_id AND a.cell_id_s < b.cell_id_s
          AND a.lo <= b.hi AND b.lo <= a.hi) = 0
        AND
        (SELECT count(*) FROM g
          WHERE (cell_id_s & 1537228672809129301) = 0
             OR xor((cell_id_s >> 61) & 7, 4) >= 6) = 0
      AS ok)
    SELECT polygon_id, cell_id_s,
           CASE WHEN ({hex_full}) = '0000000000000000' THEN 'X'
                ELSE rtrim({hex_full}, '0') END AS token,
           is_interior
    FROM g WHERE (SELECT ok FROM checks)
    ORDER BY polygon_id, cell_id_s
    """


# ----------------------------------------------------------- oracle SQL
_STOPWORDS_SQL = "['a','and','das','de','der','des','die','el','et','ist','la','le','les','los','of','que','the','to','und','我','了','在','是','的']"

_LANG_MARKERS_SQL = {
    "en": "['the','and','of','to','a']",
    "de": "['der','die','und','das','ist']",
    "fr": "['le','la','et','les','des']",
    "es": "['el','la','los','que','de']",
    "zh": "['的','是','了','在','我']",
}


def _lang_score(lang: str) -> str:
    return (
        f"length(list_filter(string_split(text,' '), "
        f"w -> list_contains({_LANG_MARKERS_SQL[lang]}, w)))"
    )


def _closest_edge_oracle(index_str: str, k: int, max_distance_rad: float) -> str:
    from s2geometry_spark.functions import oracles as OR
    from s2geometry_spark.kernel.closest_edge import parse_index

    return OR.closest_edges_sql(
        parse_index(index_str), k, max_distance_rad, include_interiors=True
    )


def _cellunion_ops_oracle() -> str:
    from s2geometry_spark.operators.cellops import synth_cell_sql

    lsb8 = 1 << (2 * 22)
    cell8 = f"(({synth_cell_sql('c_custkey')}) & -({lsb8}::BIGINT)) | {lsb8}::BIGINT"
    return f"""
    WITH a8 AS (SELECT DISTINCT {cell8} AS cell_id_s FROM customer WHERE c_custkey % 2 = 0),
    b8 AS (SELECT DISTINCT {cell8} AS cell_id_s FROM customer WHERE c_custkey % 3 = 0)
    SELECT 'union' AS op, cell_id_s FROM (SELECT cell_id_s FROM a8 UNION SELECT cell_id_s FROM b8)
    UNION ALL
    SELECT 'intersect' AS op, cell_id_s FROM (SELECT cell_id_s FROM a8 INTERSECT SELECT cell_id_s FROM b8)
    UNION ALL
    SELECT 'difference' AS op, cell_id_s FROM (SELECT cell_id_s FROM a8 EXCEPT SELECT cell_id_s FROM b8)
    ORDER BY op, cell_id_s
    """


_ORACLE_CACHE: dict[str, str] | None = None


def oracle_sql() -> dict[str, str]:
    """Memoized: generating the overlay/winding/buffer oracles runs the
    driver-side kernels to pin output loops — ~30 s of pure-Python
    geometry that must not repeat per query (the contract test suite
    calls oracle_sql() once per parametrized case)."""
    global _ORACLE_CACHE
    if _ORACLE_CACHE is None:
        _ORACLE_CACHE = _oracle_sql_impl()
    return dict(_ORACLE_CACHE)


def _oracle_sql_impl() -> dict[str, str]:
    from s2geometry_spark.functions import oracles as OR
    from s2geometry_spark.operators.cellops import (
        cell_containment_join_oracle,
        cell_hierarchy_oracle,
        cell_histogram_oracle,
    )

    norm = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
    words = "string_split(text, ' ')"
    nwords = f"string_split({norm}, ' ')"
    sh = (
        f"list_distinct(list_transform(generate_series(1, greatest(length({nwords}) - 2, 1)),"
        f" i -> array_to_string(({nwords})[i:i+2], ' ')))"
    )
    # hash 4a+b = 8-hex slice b of md5(a|s) — mirrors
    # operators/dedup.minhash_signatures_df (3 md5 calls per shingle)
    minhash_sig = (
        "["
        + ", ".join(
            f"list_min(list_transform(sh,"
            f" s -> substring(md5('{a}|' || s), {8 * b + 1}, 8)))"
            for a in range(3)
            for b in range(4)
        )
        + "]"
    )
    simhash_bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) >= 0 THEN (1::BIGINT << {j}) ELSE 0 END)"
        for j in range(32)
    )
    # fold the dot products in double precision, sequentially, to match
    # Spark's aggregate() fold exactly (float32 kernels differ in the ulps)
    ddot = (
        "list_aggregate(list_transform(list_zip({a}, {b}),"
        " p -> p[1]::DOUBLE * p[2]::DOUBLE), 'sum')"
    )
    cos = (
        f"round({ddot.format(a='qe', b='ce')} / "
        f"(sqrt({ddot.format(a='qe', b='qe')}) * sqrt({ddot.format(a='ce', b='ce')})), 6)"
    )
    from s2geometry_spark.operators.cellops import synth_cell_sql

    cell_c = synth_cell_sql("c_custkey")
    cell_n = synth_cell_sql("n_nationkey")
    lsb6 = 1 << (2 * 24)
    return {
        "geo_mentions_per_cell": f"""
            WITH {OR.pts_cte()}, {OR.face_ij_sql(8)}
            SELECT face, i8, j8, count(*) AS n
            FROM fij GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "geo_pip_join": OR.pip_join_sql(_continental_polygons()),
        "geo_knn": OR.knn_sql(_KNN_QUERIES, 5),
        "geo_loop_measures": OR.loop_measures_sql(_named_loops()),
        "ann_lsh_topk": OR.ann_lsh_sql(n_queries=10, k=5, bits=6, dim=64),
        "ann_ivf_topk": OR.ann_ivf_sql(n_queries=10, k=5, n_centroids=8, nprobe=2),
        "ann_pq_topk": OR.ann_pq_sql(
            n_queries=10, k=5, n_codewords=8, m_subspaces=4, r_candidates=20
        ),
        "embedding_near_dup": OR.near_dup_sql(threshold=0.4, bits=6, dim=64),
        "multimodal_features": OR.multimodal_sql(500),
        "geo_cellunion_ops": _cellunion_ops_oracle(),
        "geo_closest_edge": _closest_edge_oracle(_CLOSEST_EDGE_INDEX, 3, 0.3),
        "geo_furthest_edge": OR.furthest_edges_sql(
            __import__("s2geometry_spark.kernel.closest_edge",
                       fromlist=["parse_index"]).parse_index(
                _CLOSEST_EDGE_INDEX),
            2, include_interiors=True,
        ),
        "geo_closest_edges_join": _closest_edge_oracle(
            _CLOSEST_EDGES_JOIN_INDEX, 1, __import__("math").radians(45)
        ),
        "geo_shape_index_join": OR.closest_edges_sql(
            [_ring_polyline_shape()], 1, 0.2, include_interiors=False
        ),
        "geo_polyline_project": OR.polyline_project_sql(
            _project_polyline_vertices()
        ),
        "geo_raster_roundtrip": OR.rasterize_sql(
            dict(_continental_polygons())["europe"], level=7
        ),
        "geo_cap_filter": _cap_filter_oracle(),
        "geo_polyline_interpolate": OR.polyline_interpolate_sql(
            _project_polyline_vertices()
        ),
        "geo_polyline_simplify": OR.simplify_fixture_sql(_simplify_fixtures()),
        "geo_layer_assembly": OR.layer_fixture_sql(_layer_fixtures()),
        "geo_meridian_split": OR.meridian_fixture_sql(_meridian_fixtures()),
        "geo_convex_hull": OR.convex_hull_fixture_sql(_hull_fixtures()),
        "geo_hausdorff": _hausdorff_oracle(),
        "geo_polyline_alignment": OR.dtw_fixture_sql(_alignment_fixture()),
        "shape_nesting_join": OR.nesting_fixture_sql(
            [(s, r, c, t, v[0]) for s, r, v, c, t in _nesting_fixture()]
        ),
        "geo_loop_relations": OR.loop_relations_fixture_sql(
            [
                (pid, ca, ra, cb, rb)
                for (pid, _sa, _va, ca, ra), (_p, _sb, _vb, cb, rb) in zip(
                    _looprel_fixture()[0::2], _looprel_fixture()[1::2]
                )
            ]
        ),
        "geo_polygon_covering": _covering_oracle(),
        "geo_boolean_ops_snapped": OR.boolean_fixture_sql(
            _SNAPPED_FIXTURES, _BOOLEAN_OPS, snapped=True,
        ),
        "geo_boolean_ops": OR.boolean_fixture_sql(
            _BOOLEAN_FIXTURES + _BOOLEAN_FIXTURES_TOUCH, _BOOLEAN_OPS,
            degeneracies=True,
        ),
        "geo_boolean_ops_sharded": OR.boolean_fixture_sql(_BOOLEAN_FIXTURES, _BOOLEAN_OPS),
        "geo_mixed_ops": OR.mixed_fixture_sql(_MIXED_FIXTURES, _BOOLEAN_OPS),
        "geo_winding_ops": OR.winding_fixture_sql(_WINDING_JOBS),
        "geo_buffer": OR.buffer_fixture_sql(_BUFFER_JOBS, _BUFFER_CONVEX),
        "geo_relation_matrix": _relation_matrix_oracle(),
        "geo_validate": _validate_oracle_sql(),
        "geo_buffer_shapes": _buffer_shapes_oracle_sql(),
        "geo_encode_regions": _encode_oracle_sql(),
        "geo_encode_vectors": _encode_vectors_oracle_sql(),
        "geo_encode_shape_index": _shape_index_oracle_sql(),
        "cell_hierarchy": cell_hierarchy_oracle() + " ORDER BY key",
        "cell_index_labels": f"""
            WITH cells AS (
              SELECT c_custkey % 25 AS label,
                     {cell_c} AS cell_id_s
              FROM customer),
            idx AS (
              SELECT label,
                     cell_id_s - ((cell_id_s & -cell_id_s) - 1) AS range_start_s,
                     cell_id_s + ((cell_id_s & -cell_id_s) - 1) AS range_end_s
              FROM cells),
            targets AS (
              SELECT n_nationkey AS target_id,
                     (({cell_n} & -({lsb6}::BIGINT)) | {lsb6}::BIGINT) AS cell_s
              FROM nation),
            t AS (
              SELECT target_id,
                     cell_s - ({lsb6}::BIGINT - 1) AS tlo,
                     cell_s + ({lsb6}::BIGINT - 1) AS thi
              FROM targets)
            SELECT target_id, count(*) AS n_labels FROM (
              SELECT DISTINCT target_id, label
              FROM t JOIN idx
                ON t.tlo <= idx.range_end_s AND t.thi >= idx.range_start_s)
            GROUP BY target_id ORDER BY target_id
        """,
        "cell_containment_join": cell_containment_join_oracle(),
        "cell_density_rollup": f"""
            WITH pts AS (SELECT {synth_cell_sql('c_custkey')} AS cell_id_s FROM customer),
            lv(level) AS (VALUES (4), (6), (8)),
            rolled AS (
              SELECT level,
                     (cell_id_s & -((1::BIGINT << (2 * (30 - level)))))
                       | (1::BIGINT << (2 * (30 - level))) AS cell_id_s
              FROM pts CROSS JOIN lv)
            SELECT level, cell_id_s, count(*) AS weight
            FROM rolled GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "cell_density_tree": f"""
            WITH pts AS (SELECT {synth_cell_sql('c_custkey')} AS cell_id_s FROM customer),
            lv(level) AS (VALUES (0), (2), (4), (6)),
            rolled AS (
              SELECT level,
                     (cell_id_s & -((1::BIGINT << (2 * (30 - level)))))
                       | (1::BIGINT << (2 * (30 - level))) AS cell_id_s
              FROM pts CROSS JOIN lv),
            w AS (SELECT level, cell_id_s, count(*) AS weight
                  FROM rolled GROUP BY 1, 2),
            q0 AS (SELECT * FROM w WHERE level = 0),
            q2 AS (SELECT w.* FROM w JOIN q0 p
                   ON w.level = 2 AND p.weight > 10
                  AND ((w.cell_id_s & -(1::BIGINT << 60)) | (1::BIGINT << 60)) = p.cell_id_s),
            q4 AS (SELECT w.* FROM w JOIN q2 p
                   ON w.level = 4 AND p.weight > 10
                  AND ((w.cell_id_s & -(1::BIGINT << 56)) | (1::BIGINT << 56)) = p.cell_id_s),
            q6 AS (SELECT w.* FROM w JOIN q4 p
                   ON w.level = 6 AND p.weight > 10
                  AND ((w.cell_id_s & -(1::BIGINT << 52)) | (1::BIGINT << 52)) = p.cell_id_s)
            SELECT level, cell_id_s, weight FROM (
              SELECT * FROM q0 UNION ALL SELECT * FROM q2
              UNION ALL SELECT * FROM q4 UNION ALL SELECT * FROM q6)
            ORDER BY level, cell_id_s
        """,
        "cell_histogram": cell_histogram_oracle(),
        "text_token_stats": f"""
            SELECT doc_id,
                   length({words})::INT AS n_tokens,
                   length(list_distinct({words}))::INT AS n_distinct_tokens,
                   length(text)::INT AS n_chars_computed,
                   length(text) / length({words}) AS avg_token_len
            FROM documents ORDER BY doc_id
        """,
        "text_quality": f"""
            SELECT doc_id,
                   length({words})::INT AS n_tokens,
                   length(list_intersect(list_distinct({words}), {_STOPWORDS_SQL}))::INT AS n_stopword_types,
                   length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::INT AS n_punct,
                   length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / length(text) AS punct_ratio,
                   CASE WHEN length({words}) >= 10
                         AND length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / length(text) < 0.1
                        THEN 1 ELSE 0 END AS is_quality
            FROM documents ORDER BY doc_id
        """,
        "text_lang_id": f"""
            WITH s AS (
              SELECT doc_id, lang AS lang_true,
                     {_lang_score('en')} AS s_en, {_lang_score('de')} AS s_de,
                     {_lang_score('fr')} AS s_fr, {_lang_score('es')} AS s_es,
                     {_lang_score('zh')} AS s_zh
              FROM documents)
            SELECT doc_id, lang_true,
              CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
                   WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
                   WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                   WHEN s_es >= s_zh THEN 'es'
                   ELSE 'zh' END AS lang_pred
            FROM s ORDER BY doc_id
        """,
        "text_fingerprint": f"""
            SELECT doc_id, md5({norm}) AS fp_full,
                   md5(array_to_string((string_split({norm}, ' '))[1:8], ' ')) AS fp_prefix
            FROM documents ORDER BY doc_id
        """,
        "dedup_exact": f"""
            SELECT md5({norm}) AS text_hash,
                   min(doc_id) AS keeper_doc_id,
                   count(*) AS group_size
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH sh AS (SELECT doc_id, source AS blk, {sh} AS sh FROM documents)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(length(list_intersect(a.sh, b.sh))::DOUBLE
                         / length(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard_r
            FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
            WHERE length(list_intersect(a.sh, b.sh))::DOUBLE
                  / length(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
            ORDER BY doc_a, doc_b
        """,
        "dedup_jaccard_prefix": f"""
            WITH sh AS (SELECT doc_id, {sh} AS sh FROM documents)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(length(list_intersect(a.sh, b.sh))::DOUBLE
                         / length(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard_r
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE length(list_intersect(a.sh, b.sh))::DOUBLE
                  / length(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
            ORDER BY doc_a, doc_b
        """,
        "dedup_minhash_lsh": f"""
            WITH sh AS (SELECT doc_id, {sh} AS sh FROM documents),
            sig AS (SELECT doc_id, {minhash_sig} AS sig FROM sh),
            banded AS (
              SELECT doc_id, sig, b AS band,
                     md5(array_to_string(sig[b*3+1:b*3+3], '|')) AS bucket
              FROM sig, (SELECT unnest(generate_series(0,3)) AS b)
            ),
            pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                              a.sig AS sig_a, b.sig AS sig_b
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b,
                   round(length(list_filter(list_zip(sig_a, sig_b), p -> p[1] = p[2]))::DOUBLE
                         / length(sig_a), 6) AS est_jaccard_r
            FROM pairs ORDER BY doc_a, doc_b
        """,
        "dedup_components": f"""
            WITH RECURSIVE sh AS (SELECT doc_id, {sh} AS sh FROM documents),
            sig AS (SELECT doc_id, {minhash_sig} AS sig FROM sh),
            banded AS (
              SELECT doc_id, b AS band,
                     md5(array_to_string(sig[b*3+1:b*3+3], '|')) AS bucket
              FROM sig, (SELECT unnest(generate_series(0,3)) AS b)
            ),
            pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            ),
            edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs
            ),
            reach(u, v) AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
              WHERE e.v <> r.u
            ),
            comp AS (
              SELECT u AS doc_id, least(u, min(v)) AS component_id
              FROM reach GROUP BY u
            ),
            labeled AS (
              SELECT d.doc_id,
                     coalesce(c.component_id, d.doc_id) AS component_id
              FROM documents d LEFT JOIN comp c USING (doc_id)
            ),
            sizes AS (
              SELECT component_id, count(*) AS component_size
              FROM labeled GROUP BY component_id
            )
            SELECT l.doc_id, l.component_id, s.component_size
            FROM labeled l JOIN sizes s USING (component_id)
            ORDER BY l.doc_id
        """,
        "dedup_simhash": f"""
            WITH h AS (
              SELECT doc_id,
                     list_transform(string_split({norm}, ' '),
                                    w -> ('0x' || substr(md5(w), 1, 8))::BIGINT) AS hs
              FROM documents)
            SELECT doc_id, ({simhash_bits}) AS simhash32 FROM h ORDER BY doc_id
        """,
        "ann_cosine_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
            scored AS (
              SELECT query_id, cand_id, {cos} AS cosine
              FROM c CROSS JOIN q WHERE cand_id <> query_id),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
              FROM scored)
            SELECT query_id, cand_id, cosine, rank::INT AS rank FROM ranked
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "sample_stratified": f"""
            SELECT 'uniform' AS mode, doc_id, lang FROM documents
            WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                  < {int(0.25 * (1 << 32))}
            UNION ALL
            SELECT 'stratified' AS mode, doc_id, lang FROM documents
            WHERE ('0x' || substr(md5(lang || '|' || doc_id::VARCHAR), 1, 8))::BIGINT
                  < CASE lang WHEN 'en' THEN {int(0.1 * (1 << 32))}
                              WHEN 'de' THEN {int(0.6 * (1 << 32))}
                              WHEN 'fr' THEN {int(0.4 * (1 << 32))}
                              ELSE 0 END
            ORDER BY mode, doc_id
        """,
        "events_window": """
            SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
                   event_type,
                   count(*) AS n,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,

        "geo_rect_filter": f"""
            WITH p AS (
              SELECT c_custkey AS key, {_TILE_LAT} AS lat, {_TILE_LNG} AS lng
              FROM customer)
            SELECT key,
              CASE WHEN lat >= 10.0 AND lat <= 60.0 AND lng >= -30.0 AND lng <= 40.0
                   THEN 1 ELSE 0 END AS in_rect_a,
              CASE WHEN lat >= 10.0 AND lat <= 60.0 AND (lng >= 150.0 OR lng <= -150.0)
                   THEN 1 ELSE 0 END AS in_rect_b
            FROM p
            WHERE (lat >= 10.0 AND lat <= 60.0 AND lng >= -30.0 AND lng <= 40.0)
               OR (lat >= 10.0 AND lat <= 60.0 AND (lng >= 150.0 OR lng <= -150.0))
            ORDER BY key
        """,
        "tiling_web_tiles": f"""
            WITH p AS (
              SELECT c_custkey AS key, {_TILE_LAT} AS lat, {_TILE_LNG} AS lng
              FROM customer)
            SELECT key,
              greatest(0, least(63,
                floor((lng + 180.0) / 360.0 * 64)))::BIGINT AS tile_x,
              greatest(0, least(63,
                floor((1.0 - ln(tan(radians(least(greatest(lat, -85.05112878), 85.05112878)))
                               + 1.0 / cos(radians(least(greatest(lat, -85.05112878), 85.05112878))))
                       / pi()) / 2.0 * 64)))::BIGINT AS tile_y
            FROM p ORDER BY key
        """,
    }
