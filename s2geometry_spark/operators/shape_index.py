"""Distributed shape index — the MutableS2ShapeIndex analog.

The reference's index maps each S2CellId to the edges that intersect it,
subdividing until a cell holds at most ~10 edges
(mutable_s2shape_index.h:59-140, kMaxEdgesPerCell default,
mutable_s2shape_index.cc:75); that is what lets distance/containment
queries over "hundreds of millions of edges" touch only a neighborhood.

Spark re-expression:
  1. seed (map side): each edge row emits the seed-level cells it
     intersects — a recursive descent from the 6 faces using the exact
     edge-clipping test (kernel/clipping.py, ClipToPaddedFace +
     IntersectsRect with the reference's padding);
  2. refine (one shuffle): groupBy(seed_cell) + applyInPandas runs the
     purely-local subdivision — a cell's split redistributes only its
     own edges, so the reduce is embarrassingly parallel; hot seed cells
     are the only skew axis and `seed_level` moves it.

Index rows carry the edge endpoints, so queries never join back to the
edge table (the reference's clipped-shape storage, s2shape_index.h).

`indexed_closest_edges_join` then routes a radius-bounded closest-edge
query through the index: every index cell is expanded by the radius
(ring-1 at a level whose kMinWidth ≥ radius — the S2Cap covering bound,
s2metrics.h:42-63), the fact table explodes ancestors at the distinct
probe levels (the PIP-join trick), and one equi-join + exact distance
kernel + window top-k finishes it.  The fact table is never shuffled;
the probe side is broadcast.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import columns as CC
from ..kernel import cellid as K
from ..kernel import metrics
from ..kernel.cid import CID

# kCellPadding (mutable_s2shape_index.cc:66): conservative UV padding so
# clipped edges stay clipped under perturbation.
from ..kernel.clipping import (
    FACE_CLIP_ERROR_UV_COORD,
    INTERSECTS_RECT_ERROR_UV_DIST,
    clip_to_padded_face,
    intersects_rect,
)

CELL_PADDING = 2 * (FACE_CLIP_ERROR_UV_COORD + INTERSECTS_RECT_ERROR_UV_DIST)

EDGE_SCHEMA = (
    "shape_id int, edge_id int, ax double, ay double, az double,"
    " bx double, by double, bz double"
)

INDEX_SCHEMA = (
    "cell_id_s long, level int, shape_id int, edge_id int,"
    " ax double, ay double, az double, bx double, by double, bz double"
)


def edges_to_df(spark: SparkSession, shapes, partitions: int = 8) -> DataFrame:
    """Explode kernel Shape objects into an edge DataFrame."""
    rows = []
    for shape in shapes:
        for e in range(len(shape.edges_c)):
            a, b = shape.edges_c[e], shape.edges_d[e]
            rows.append(
                (shape.shape_id, e, *[float(v) for v in a], *[float(v) for v in b])
            )
    return spark.createDataFrame(rows, EDGE_SCHEMA).repartition(partitions)


def _edge_intersects_cell(a: np.ndarray, b: np.ndarray, cid: CID) -> bool:
    """Exact MayIntersect(cell) test for one edge (the reference's
    S2ShapeIndexRegion::AnyEdgeIntersects path)."""
    face = int(cid.face())
    arr = np.array([cid.id], dtype=np.uint64)
    u_lo, u_hi, v_lo, v_hi = (float(v[0]) for v in K.get_bound_uv(arr))
    clipped = clip_to_padded_face(a, b, face, CELL_PADDING)
    if clipped is None:
        return False
    rect = (
        u_lo - CELL_PADDING,
        u_hi + CELL_PADDING,
        v_lo - CELL_PADDING,
        v_hi + CELL_PADDING,
    )
    return intersects_rect(clipped[0], clipped[1], rect)


def _descend(a: np.ndarray, b: np.ndarray, cid: CID, target_level: int, out: list):
    if not _edge_intersects_cell(a, b, cid):
        return
    if cid.level() >= target_level:
        out.append(cid.id)
        return
    for k in range(4):
        _descend(a, b, cid.child(k), target_level, out)


def build_shape_index(
    edges: DataFrame,
    max_edges_per_cell: int = 10,
    max_level: int = 20,
    seed_level: int = 0,
) -> DataFrame:
    """edges(EDGE_SCHEMA) → index rows (INDEX_SCHEMA): each cell holds at
    most `max_edges_per_cell` edges unless already at `max_level`."""

    def seed(batches):
        for pdf in batches:
            out = []
            A = pdf[["ax", "ay", "az"]].to_numpy(np.float64)
            B = pdf[["bx", "by", "bz"]].to_numpy(np.float64)
            for r in range(len(pdf)):
                cells: list[int] = []
                for f in range(6):
                    _descend(
                        A[r], B[r], CID.from_face(f), seed_level, cells
                    )
                row = pdf.iloc[r]
                for c in cells:
                    out.append(
                        (
                            int(c) - (1 << 63),
                            int(row.shape_id), int(row.edge_id),
                            row.ax, row.ay, row.az, row.bx, row.by, row.bz,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "cell_id_s", "shape_id", "edge_id",
                    "ax", "ay", "az", "bx", "by", "bz",
                ],
            )

    seeded = edges.mapInPandas(
        seed,
        "cell_id_s long, shape_id int, edge_id int, ax double, ay double,"
        " az double, bx double, by double, bz double",
    )

    def refine(key, pdf: pd.DataFrame) -> pd.DataFrame:
        root = CID(int(key[0]) + (1 << 63))
        A = pdf[["ax", "ay", "az"]].to_numpy(np.float64)
        B = pdf[["bx", "by", "bz"]].to_numpy(np.float64)
        sid = pdf["shape_id"].to_numpy(np.int64)
        eid = pdf["edge_id"].to_numpy(np.int64)
        out_rows = []

        def rec(cid: CID, idxs: np.ndarray):
            if len(idxs) <= max_edges_per_cell or cid.level() >= max_level:
                lvl = cid.level()
                for i in idxs:
                    i = int(i)
                    out_rows.append(
                        (
                            cid.id - (1 << 63), lvl,
                            int(sid[i]), int(eid[i]),
                            A[i][0], A[i][1], A[i][2],
                            B[i][0], B[i][1], B[i][2],
                        )
                    )
                return
            for k in range(4):
                child = cid.child(k)
                sub = np.array(
                    [
                        i
                        for i in idxs
                        if _edge_intersects_cell(A[int(i)], B[int(i)], child)
                    ],
                    dtype=np.int64,
                )
                if len(sub):
                    rec(child, sub)

        rec(root, np.arange(len(pdf)))
        return pd.DataFrame(
            out_rows,
            columns=[
                "cell_id_s", "level", "shape_id", "edge_id",
                "ax", "ay", "az", "bx", "by", "bz",
            ],
        )

    return seeded.groupBy("cell_id_s").applyInPandas(refine, INDEX_SCHEMA)


def _probe_level_for(max_distance_rad: float, deepest: int = 30) -> int:
    """Deepest level whose kMinWidth ≥ the radius: a ring-1 neighborhood
    at that level covers everything within the radius of a cell."""
    lvl = 0
    while lvl < deepest and metrics.MIN_WIDTH.get_value(lvl + 1) >= max_distance_rad:
        lvl += 1
    return lvl


def probe_cells_df(index: DataFrame, max_distance_rad: float) -> DataFrame:
    """Expand each index cell by the radius: lift deep cells to the probe
    level, ring-1 all-neighbors + self, one probe row per (cell, edge)."""
    l_d = _probe_level_for(max_distance_rad)

    @F.pandas_udf("array<long>")
    def probes(cell_s: pd.Series, level: pd.Series) -> pd.Series:
        ids = K.unbias(cell_s.to_numpy(np.int64))
        lvls = level.to_numpy(np.int64)
        out = []
        for cid, lvl in zip(ids.tolist(), lvls.tolist()):
            pl = min(int(lvl), l_d)
            lifted = K.parent(np.array([cid], dtype=np.uint64), pl)
            ring = K.all_neighbors(lifted, pl)[0]
            cells = {int(lifted[0])} | {int(v) for v in ring.tolist()}
            out.append([c - (1 << 63) for c in sorted(cells)])
        return pd.Series(out)

    return (
        index.withColumn("probe_cell_s", F.explode(probes("cell_id_s", "level")))
        .select(
            "probe_cell_s", "shape_id", "edge_id",
            "ax", "ay", "az", "bx", "by", "bz",
        )
        .dropDuplicates(["probe_cell_s", "shape_id", "edge_id"])
    )


def indexed_closest_edges_join(
    points: DataFrame,
    index: DataFrame,
    k: int = 1,
    max_distance_rad: float = 0.1,
    point_key: tuple[str, ...] = ("key",),
) -> DataFrame:
    """points(lat, lng, cell_id_s leaf, …) ⋈ shape index → per point the
    k closest edges within the radius: (point cols, shape_id, edge_id,
    dist2, dist_rad).  The fact table is scanned once, never shuffled
    (broadcast probe join); candidates are O(edges within radius)."""
    spark = points.sparkSession
    probe = probe_cells_df(index, max_distance_rad).persist()
    levels = sorted(
        r[0]
        for r in probe.select(
            CC.level("probe_cell_s").alias("l")
        ).distinct().collect()
    )
    # broadcast the probe side while it is broadcast-able; a huge edge set
    # (hundreds of millions of edges) falls back to a shuffled hash join —
    # the fact table shuffles on the probe cell, which AQE skew-splits
    n_probe = probe.count()
    probe_side = F.broadcast(probe) if n_probe <= 2_000_000 else probe
    terms = points.withColumn(
        "_term", F.explode(F.array(*[CC.parent("cell_id_s", l) for l in levels]))
    )
    cand = terms.join(
        probe_side, terms["_term"] == probe["probe_cell_s"], "inner"
    ).drop("_term", "probe_cell_s")
    # a (point, edge) pair can arrive via several probe cells at different
    # levels → dedupe before the exact kernel
    cand = cand.dropDuplicates([*point_key, "shape_id", "edge_id"])

    @F.pandas_udf("double")
    def dist2(
        lat: pd.Series, lng: pd.Series,
        ax: pd.Series, ay: pd.Series, az: pd.Series,
        bx: pd.Series, by: pd.Series, bz: pd.Series,
    ) -> pd.Series:
        from ..kernel.coords import latlng_to_xyz
        from ..kernel.distance import point_edge_dist2_rowwise

        x, y, z = latlng_to_xyz(lat.to_numpy(np.float64), lng.to_numpy(np.float64))
        X = np.stack([x, y, z], -1)
        A = np.stack([ax, ay, az], -1).astype(np.float64)
        B = np.stack([bx, by, bz], -1).astype(np.float64)
        return pd.Series(point_edge_dist2_rowwise(X, A, B))

    limit2 = float((2 * math.sin(0.5 * min(math.pi, max_distance_rad))) ** 2)
    scored = cand.withColumn(
        "dist2",
        dist2(
            F.col("lat"), F.col("lng"),
            F.col("ax"), F.col("ay"), F.col("az"),
            F.col("bx"), F.col("by"), F.col("bz"),
        ),
    ).filter(F.col("dist2") < F.lit(limit2))
    w = Window.partitionBy(*point_key).orderBy(
        F.col("dist2").asc(), F.col("shape_id").asc(), F.col("edge_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "ax", "ay", "az", "bx", "by", "bz")
        .withColumn(
            "dist_rad",
            2 * F.asin(0.5 * F.sqrt(F.least(F.col("dist2"), F.lit(4.0)))),
        )
    )
