"""kNN via cell-neighbor ring expansion (S2ClosestPointQuery analog).

Port of the best-first search semantics of s2closest_edge_query_base.h
(:637-830) re-expressed as Spark joins (SURVEY.md §3.3):

 - the big points table is bucketed at a fixed index level L
   (cell_bucket = parent(leaf, L), pure JVM bit op);
 - per round, each query expands a Chebyshev ring of cells around its own
   cell (rings computed by repeated AppendAllNeighbors — each hop is one
   cell, so cube-face wraps stay exact, s2cell_id.cc:556-598);
 - candidates = points ⋈ broadcast(query_cells) equi join on the bucket,
   per-query top-k via Window(row_number);
 - a query terminates when its kth distance ≤ r·kMinWidth(L): every
   unseen cell is ≥ r full cell-widths away (s2metrics.h:42-63 bound) —
   the DataFrame analog of the priority-queue pruning bound
   (S2Cell::GetDistance, s2cell.cc:434-560).

The query side is assumed driver-small (10³-10⁵); the points side is the
100 TB side and is only ever scanned with a broadcast hash probe.
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
from ..kernel.cellid import bias, unbias


def _expand_rings(leaf_cells: np.ndarray, level: int, r: int) -> list[np.ndarray]:
    """All cells within Chebyshev distance ≤ r of each query cell at
    `level` (uint64), one hop at a time so face wraps stay exact."""
    start = K.parent(leaf_cells, level)
    out = []
    for s in start:
        seen = {int(s)}
        frontier = np.array([s], dtype=np.uint64)
        for _ in range(r):
            if not len(frontier):
                break
            rings = K.all_neighbors(frontier, level)
            new = set()
            for arr in rings:
                for v in arr.tolist():
                    if v not in seen:
                        new.add(v)
            seen.update(new)
            frontier = np.array(sorted(new), dtype=np.uint64)
        out.append(np.array(sorted(seen), dtype=np.uint64))
    return out


def bucket_points(points: DataFrame, level: int) -> DataFrame:
    """Add the index-level bucket column (pure JVM)."""
    return points.withColumn("cell_bucket", CC.parent("cell_id_s", level))


def knn_join(
    queries_pdf: pd.DataFrame,
    points: DataFrame,
    k: int,
    level: int = 8,
    max_distance_rad: float | None = None,
    point_cols: tuple[str, ...] = ("url", "mention_idx"),
    max_rounds: int = 6,
) -> DataFrame:
    """queries_pdf: pandas (query_id, lat, lng).  points: DataFrame with
    cell_id_s (leaf), lat, lng, x, y, z.  Returns per-query top-k rows
    with `chord2` (squared chord distance) and `dist_rad`.

    Driver loop: round t uses ring radius r_t = 2^t; unconverged queries
    (kth distance > bound or < k results) rerun with the doubled ring.
    """
    spark = points.sparkSession
    qx, qy, qz = __import__(
        "s2geometry_spark.kernel.coords", fromlist=["latlng_to_xyz"]
    ).latlng_to_xyz(queries_pdf["lat"].to_numpy(), queries_pdf["lng"].to_numpy())
    leafs = K.from_latlng(
        queries_pdf["lat"].to_numpy(), queries_pdf["lng"].to_numpy()
    )
    qids = queries_pdf["query_id"].to_numpy()

    pts = points
    if "x" not in points.columns:
        from ..functions.udfs import s2_latlng_to_xyz

        pts = pts.withColumn("_p", s2_latlng_to_xyz(F.col("lat"), F.col("lng"))).select(
            "*", "_p.x", "_p.y", "_p.z"
        ).drop("_p")
    # NOTE: the points side is never cached — it is the 100 TB side; each
    # schedule round is one broadcast-probe scan, and the schedule below
    # has exactly one round per level (most queries converge on the first),
    # so the fact table is scanned once per level, not once per (level, r).

    # Round schedule: one ring-3 pass at the chosen level, then escalate to
    # coarser levels (cells 8× wider each step) so sparse regions converge;
    # the final (0, 4) pass covers the sphere → guaranteed termination
    # (4·kMinWidth(0) ≥ π → no unseen cell).
    schedule: list[tuple[int, int]] = [(level, 3)]
    lvl = max(level - 3, 0)
    while lvl > 0:
        schedule.append((lvl, 3))
        lvl = max(lvl - 3, 0)
    schedule += [(0, 4)]

    pending = np.ones(len(queries_pdf), dtype=bool)
    results: list[pd.DataFrame] = []
    for level_t, r in schedule:
        if not pending.any():
            break
        min_width = metrics.MIN_WIDTH.get_value(level_t)
        idx = np.nonzero(pending)[0]
        rings = _expand_rings(leafs[idx], level_t, r)
        ring_rows = []
        for qi, cells in zip(idx.tolist(), rings):
            for c in bias(cells).tolist():
                ring_rows.append((str(qids[qi]), c, float(qx[qi]), float(qy[qi]), float(qz[qi])))
        qcells = spark.createDataFrame(
            ring_rows,
            "query_id string, cell_bucket long, qx double, qy double, qz double",
        )
        bucketed = pts.withColumn("cell_bucket", CC.parent("cell_id_s", level_t))
        cand = bucketed.join(F.broadcast(qcells), "cell_bucket", "inner")
        d2 = (
            (F.col("x") - F.col("qx")) ** 2
            + (F.col("y") - F.col("qy")) ** 2
            + (F.col("z") - F.col("qz")) ** 2
        )
        cand = cand.withColumn("chord2", d2)
        if max_distance_rad is not None:
            limit2 = float(4 * math.sin(min(math.pi, max_distance_rad) / 2) ** 2)
            cand = cand.filter(F.col("chord2") <= limit2)
        w = Window.partitionBy("query_id").orderBy(
            F.col("chord2").asc(), *[F.col(c) for c in point_cols]
        )
        topk = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn", "qx", "qy", "qz", "cell_bucket")
        )
        got = topk.toPandas()
        # convergence: kth distance within the r-ring guarantee
        bound_rad = r * min_width
        bound_chord2 = 4 * math.sin(min(math.pi, bound_rad) / 2) ** 2
        sphere_covered = bound_rad >= math.pi
        newly_done = []
        for qi in idx.tolist():
            qid = str(qids[qi])
            sub = got[got.query_id == qid]
            kth_ok = len(sub) >= k and sub.chord2.max() <= bound_chord2
            radius_ok = (
                max_distance_rad is not None
                and max_distance_rad <= bound_rad
            )
            if kth_ok or radius_ok or sphere_covered:
                pending[qi] = False
                newly_done.append(qid)
        if newly_done:
            results.append(got[got.query_id.isin(newly_done)])
    # any still-pending queries: accept last round's results
    if pending.any():
        still = [str(qids[qi]) for qi in np.nonzero(pending)[0]]
        results.append(got[got.query_id.isin(still)])
    out_pdf = (
        pd.concat(results, ignore_index=True)
        if results
        else pd.DataFrame(columns=["query_id", "chord2"])
    )
    out_pdf["dist_rad"] = 2 * np.arcsin(0.5 * np.sqrt(np.minimum(out_pdf["chord2"].astype(float), 4.0)))
    return spark.createDataFrame(out_pdf)


def brute_force_knn(
    queries_pdf: pd.DataFrame,
    points_pdf: pd.DataFrame,
    k: int,
    max_distance_rad: float | None = None,
) -> pd.DataFrame:
    """O(N·Q) oracle for tests."""
    from ..kernel.coords import latlng_to_xyz

    px, py, pz = latlng_to_xyz(points_pdf["lat"].to_numpy(), points_pdf["lng"].to_numpy())
    P = np.stack([px, py, pz], -1)
    qx, qy, qz = latlng_to_xyz(queries_pdf["lat"].to_numpy(), queries_pdf["lng"].to_numpy())
    Q = np.stack([qx, qy, qz], -1)
    rows = []
    for qi in range(len(Q)):
        d2 = ((P - Q[qi]) ** 2).sum(-1)
        order = np.lexsort(
            (points_pdf["mention_idx"].to_numpy(), points_pdf["url"].to_numpy(), d2)
        )
        cnt = 0
        for j in order:
            if max_distance_rad is not None:
                if d2[j] > 4 * math.sin(min(math.pi, max_distance_rad) / 2) ** 2:
                    break
            rows.append(
                (
                    str(queries_pdf["query_id"].iloc[qi]),
                    points_pdf["url"].iloc[j],
                    int(points_pdf["mention_idx"].iloc[j]),
                    float(d2[j]),
                )
            )
            cnt += 1
            if cnt >= k:
                break
    return pd.DataFrame(rows, columns=["query_id", "url", "mention_idx", "chord2"])
