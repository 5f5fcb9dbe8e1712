"""Distributed arrangement sharding for overlay / winding / buffer jobs.

Round-3 verdict item #1 (SURVEY §7.1 #1): `operators/overlay.py` runs
each boolean/winding JOB whole on one executor — right for a pair table
of millions of small polygons, wrong for ONE continental arrangement
(the reference's MutableS2ShapeIndex is built for "hundreds of millions
of edges" in a single index, mutable_s2shape_index.h:69-71).  This
module distributes a single huge arrangement across executors:

 1. **Index** both operands' edges in ONE distributed shape index
    (operators/shape_index.py) — its refined cells are the co-location
    shards: any true crossing point lies in some emitted cell that
    carries BOTH edges.
 2. **Crossings**: per index cell, a bounded (≤ max_edges_per_cell²)
    proper-crossing matrix (kernel/parity.py triage + exact fallback);
    crossing points from the operand-order-invariant
    GetIntersectionStable/exact tower (kernel/booleans.py), so a pair
    discovered in two cells dedupes bit-exactly.
 3. **Split** each edge at ALL its crossing points (one shuffle keyed by
    edge — cut ordering mirrors kernel _split_edges).
 4. **Anchors**: containment state is distributed the way the
    reference's InteriorTracker carries it along the space-filling curve
    (mutable_s2shape_index.cc) — re-expressed hierarchically: the 6 face
    centers classify against ALL edges (6 broadcast paths, one
    aggregate), then each occupied child cell's center classifies off
    its parent's center with candidates = edges intersecting the PARENT
    cell only (S2 cells are geodesically convex, so the parent→child
    center path stays inside the parent).  Per-shape crossing PARITY for
    boolean ops (total, EdgeOrVertexCrossing tie-breaks), signed winding
    sums for winding ops.
 5. **Classify** each sub-edge's two sides from its seed anchor: base
    value via path crossings anchor→midpoint against the seed group's
    edges, bit-equal parent copies contributing analytically (the
    winding_sides incident rule, kernel/winding.py:75-119) — so
    exactly-shared A/B boundary segments classify structurally, the
    same semantics as the single-node `_overlay`/`winding_operation`.
 6. **Assemble** boundary loops per shard (chains break at shard borders
    and at global junction vertices), the driver stitches only
    shard-crossing chains with the same max-CCW rule — collect is
    O(junctions + crossing chains), not O(boundary).

The per-seed classify groups are bounded by the data's seed-level
fan-out; `seed_level` is the skew knob exactly as in the shape index.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import columns as CC
from ..kernel import cellid as K
from ..kernel import parity as PK
from ..kernel import predicates as P

ARR_EDGE_SCHEMA = (
    "shape_id int, loop_id int, eidx long, edge_id long,"
    " ax double, ay double, az double, bx double, by double, bz double"
)

SUB_SCHEMA = (
    "shape_id int, edge_id long, sub_idx int,"
    " pax double, pay double, paz double, pbx double, pby double, pbz double,"
    " sax double, say double, saz double, sbx double, sby double, sbz double,"
    " mx double, my double, mz double, seed_s long"
)

BOUNDARY_SCHEMA = (
    "sax double, say double, saz double,"
    " sbx double, sby double, sbz double, seed_s long,"
    " k1 int, k2 long, k3 int"
)


def loops_to_edges_df(
    spark: SparkSession, loops, shape_id: int = 0, partitions: int = 32
) -> DataFrame:
    """Directed closed-ring edges of `loops` (list of (n,3) unit arrays)
    as an ARR_EDGE_SCHEMA DataFrame; edge_id is flat per shape, eidx is
    the position within its loop (edge i joins v_i → v_{i+1})."""
    rows = []
    eid = 0
    for li, lp in enumerate(loops):
        v = np.asarray(lp, float).reshape(-1, 3)
        n = len(v)
        for i in range(n):
            a, b = v[i], v[(i + 1) % n]
            rows.append(
                (shape_id, li, i, eid, *(float(t) for t in a), *(float(t) for t in b))
            )
            eid += 1
    return spark.createDataFrame(rows, ARR_EDGE_SCHEMA).repartition(partitions)


def polygon_to_edges_df(
    spark: SparkSession, polygon, shape_id: int = 0, partitions: int = 32
) -> DataFrame:
    return loops_to_edges_df(
        spark, [l.vertices for l in polygon.loops], shape_id, partitions
    )


# --------------------------------------------------------------- origin flags
def shape_origin_inside(edges: DataFrame) -> dict[int, bool]:
    """contains(S2::Origin) per shape, computed distributively: per loop
    the InitOriginAndBound identity (s2loop.cc:271-303) — origin_inside =
    AngleContainsVertex(v0, v1, v2) != parity(Origin→v1 vs loop edges) —
    then XOR over the shape's loops (even-odd polygon semantics)."""
    heads = (
        edges.filter(F.col("eidx") <= 1)
        .select("shape_id", "loop_id", "eidx", "ax", "ay", "az", "bx", "by", "bz")
        .collect()
    )
    v1_by_loop: dict[tuple[int, int], np.ndarray] = {}
    tri: dict[tuple[int, int], dict[int, tuple]] = {}
    for r in heads:
        tri.setdefault((r.shape_id, r.loop_id), {})[r.eidx] = (
            np.array([r.ax, r.ay, r.az]),
            np.array([r.bx, r.by, r.bz]),
        )
    v1_inside: dict[tuple[int, int], bool] = {}
    for key, es in tri.items():
        v0, v1 = es[0]
        v2 = es[1][1] if 1 in es else es[0][0]  # triangle fallback
        v1_by_loop[key] = v1
        v1_inside[key] = (
            tuple(v0) != tuple(v1)
            and tuple(v2) != tuple(v1)
            and P.angle_contains_vertex(v0, v1, v2)
        )

    spark = edges.sparkSession
    b_targets = spark.sparkContext.broadcast(
        {k: v.tolist() for k, v in v1_by_loop.items()}
    )

    def count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        targets = {k: np.asarray(v) for k, v in b_targets.value.items()}
        for pdf in batches:
            C = pdf[["ax", "ay", "az"]].to_numpy(np.float64)
            D = pdf[["bx", "by", "bz"]].to_numpy(np.float64)
            sid = pdf["shape_id"].to_numpy(np.int64)
            lid = pdf["loop_id"].to_numpy(np.int64)
            # vectorized per-(shape, loop) target assignment
            Q = np.empty_like(C)
            key64 = (sid << 32) | lid
            for kk in np.unique(key64):
                Q[key64 == kk] = targets[(int(kk >> 32), int(kk & 0xFFFFFFFF))]
            Pp = np.tile(P.ORIGIN, (len(pdf), 1))
            x = PK.paths_cross_edges_rowwise(Pp, Q, C, D, mode="parity")
            yield pd.DataFrame(
                {"shape_id": sid, "loop_id": lid, "n": x}
            )

    sums = (
        edges.mapInPandas(count, "shape_id long, loop_id long, n long")
        .groupBy("shape_id", "loop_id")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    flags: dict[int, bool] = {}
    for r in sums:
        par = bool(int(r.n) & 1)
        oi = v1_inside[(r.shape_id, r.loop_id)] != par
        flags[int(r.shape_id)] = flags.get(int(r.shape_id), False) ^ oi
    return flags


# ------------------------------------------------------------------- anchors
def _cell_centers(ids_biased: np.ndarray) -> np.ndarray:
    x, y, z = K.to_point(K.unbias(np.asarray(ids_biased, np.int64)))
    return np.stack([x, y, z], -1)


def _anchor_points(ids_biased: np.ndarray) -> np.ndarray:
    """Anchor point per cell: the center of the cell's child[1]→child[3]→
    child[0] descendant — an interior point at odd 16ths of the cell, so
    it cannot collide bit-exactly with grid-friendly input vertices the
    way the true center does (face-0's center IS lat 0 lng 0).  Interior
    of the cell ⇒ parent→child anchor paths stay inside the parent and
    anchor→midpoint paths stay inside the seed (cells are geodesically
    convex)."""
    ids = K.unbias(np.asarray(ids_biased, np.int64))
    deep = K.child(K.child(K.child(ids, 1), 3), 0)
    x, y, z = K.to_point(deep)
    return np.stack([x, y, z], -1)


def seed_anchor_values(
    edges_seeded: DataFrame,
    occupied_seeds: np.ndarray,
    seed_level: int,
    mode: str,
    start_point: np.ndarray,
    start_parities: dict[int, bool] | None = None,
    start_winding: int = 0,
) -> dict[int, object]:
    """Anchor value at the center of every occupied seed cell.

    mode='parity': value = {shape_id: bool inside} per seed.
    mode='signed': value = int winding number per seed.

    Hierarchical propagation (module docstring step 4): face anchors
    classify against ALL edges from `start_point` (whose value is given:
    per-shape origin parities, or the winding ref's ref_winding); child
    anchors classify off their parent with candidates joined at parent
    granularity.  Total candidate volume is O(seed_level · edge-seed
    rows), all equi-joined — no driver loop over edges."""
    spark = edges_seeded.sparkSession
    occ = np.unique(np.asarray(occupied_seeds, np.int64))
    ancestors = {seed_level: occ}
    for lvl in range(seed_level - 1, -1, -1):
        ancestors[lvl] = np.unique(
            K.bias(K.parent(K.unbias(ancestors[lvl + 1]), lvl))
        )
    shapes = [
        int(r.shape_id)
        for r in edges_seeded.select("shape_id").distinct().collect()
    ]

    # --- face anchors: start_point → face centers vs ALL edges
    face_cells = ancestors[0]
    face_centers = _anchor_points(face_cells)
    b_faces = spark.sparkContext.broadcast(
        (face_centers.tolist(), start_point.tolist())
    )

    def face_counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        centers, sp = b_faces.value
        Qc = np.asarray(centers)
        Pp = np.tile(np.asarray(sp), (len(Qc), 1))
        for pdf in batches:
            C = pdf[["ax", "ay", "az"]].to_numpy(np.float64)
            D = pdf[["bx", "by", "bz"]].to_numpy(np.float64)
            M = PK.paths_cross_edges(Pp, Qc, C, D, mode=mode)
            sid = pdf["shape_id"].to_numpy(np.int64)
            out = []
            for fi in range(len(Qc)):
                for s in np.unique(sid):
                    out.append((fi, int(s), int(M[fi, sid == s].sum())))
            yield pd.DataFrame(out, columns=["fi", "shape_id", "n"])

    uniq_edges = edges_seeded.dropDuplicates(["shape_id", "edge_id"])
    face_sums = (
        uniq_edges.mapInPandas(face_counts, "fi long, shape_id long, n long")
        .groupBy("fi", "shape_id")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    face_delta = {(int(r.fi), int(r.shape_id)): int(r.n) for r in face_sums}

    # --- hop table: parent-center → child-center per occupied cell
    hop_rows = []
    hop_meta = []  # (child_cell, parent_cell)
    for lvl in range(1, seed_level + 1):
        cells = ancestors[lvl]
        parents = K.bias(K.parent(K.unbias(cells), lvl - 1))
        pc = _anchor_points(parents)
        cc = _anchor_points(cells)
        for k in range(len(cells)):
            hop_id = len(hop_meta)
            hop_meta.append((int(cells[k]), int(parents[k])))
            hop_rows.append(
                (
                    hop_id, lvl - 1, int(parents[k]),
                    *(float(t) for t in pc[k]), *(float(t) for t in cc[k]),
                )
            )
    anchors: dict[int, object] = {}
    if hop_rows:
        hops = spark.createDataFrame(
            hop_rows,
            "hop_id long, plvl int, pcell long,"
            " px double, py double, pz double, qx double, qy double, qz double",
        )
        # edge candidates at every parent granularity (one explode+join) —
        # from ALL seed rows, not the per-edge dedupe: an edge's candidacy
        # under a parent cell comes from ANY of its seed assignments
        lvl_edges = edges_seeded.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(l).alias("plvl"),
                            CC.parent("seed_s", l).alias("pcell"),
                        )
                        for l in range(seed_level)
                    ]
                )
            ).alias("lk"),
            "shape_id", "edge_id", "ax", "ay", "az", "bx", "by", "bz",
        ).select("lk.plvl", "lk.pcell", "shape_id", "edge_id",
                 "ax", "ay", "az", "bx", "by", "bz").dropDuplicates(
            ["plvl", "pcell", "shape_id", "edge_id"]
        )
        joined = lvl_edges.join(F.broadcast(hops), ["plvl", "pcell"], "inner")

        def hop_counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                Pp = pdf[["px", "py", "pz"]].to_numpy(np.float64)
                Q = pdf[["qx", "qy", "qz"]].to_numpy(np.float64)
                C = pdf[["ax", "ay", "az"]].to_numpy(np.float64)
                D = pdf[["bx", "by", "bz"]].to_numpy(np.float64)
                x = PK.paths_cross_edges_rowwise(Pp, Q, C, D, mode=mode)
                yield pd.DataFrame(
                    {
                        "hop_id": pdf["hop_id"].to_numpy(np.int64),
                        "shape_id": pdf["shape_id"].to_numpy(np.int64),
                        "n": x,
                    }
                )

        hop_sums = (
            joined.mapInPandas(hop_counts, "hop_id long, shape_id long, n long")
            .groupBy("hop_id", "shape_id")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        hop_delta = {(int(r.hop_id), int(r.shape_id)): int(r.n) for r in hop_sums}
    else:
        hop_delta = {}

    # --- driver fold down the tree
    if mode == "parity":
        assert start_parities is not None
        vals: dict[int, dict[int, bool]] = {}
        for fi, cell in enumerate(face_cells.tolist()):
            vals[int(cell)] = {
                s: start_parities.get(s, False)
                ^ bool(face_delta.get((fi, s), 0) & 1)
                for s in shapes
            }
        for hop_id, (cell, parent) in enumerate(hop_meta):
            pv = vals[parent]
            vals[cell] = {
                s: pv[s] ^ bool(hop_delta.get((hop_id, s), 0) & 1)
                for s in shapes
            }
        for cell in occ.tolist():
            anchors[int(cell)] = vals[int(cell)]
    else:
        wvals: dict[int, int] = {}
        for fi, cell in enumerate(face_cells.tolist()):
            wvals[int(cell)] = start_winding + sum(
                face_delta.get((fi, s), 0) for s in shapes
            )
        for hop_id, (cell, parent) in enumerate(hop_meta):
            wvals[cell] = wvals[parent] + sum(
                hop_delta.get((hop_id, s), 0) for s in shapes
            )
        for cell in occ.tolist():
            anchors[int(cell)] = wvals[int(cell)]
    return anchors


# ----------------------------------------------------------------- crossings
def crossing_points(index: DataFrame, self_mode: bool) -> DataFrame:
    """(shape_id, edge_id, px, py, pz) cut rows from per-cell bounded
    proper-crossing matrices; bit-exact dedupe across cells."""

    def per_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.booleans import _intersection_point

        frames = [
            _cell_crossings(sub, self_mode, _intersection_point)
            for _, sub in pdf.groupby("cell_id_s", sort=False)
        ]
        empty = pd.DataFrame(
            columns=["shape_id", "edge_id", "px", "py", "pz"]
        ).astype({"shape_id": "int64", "edge_id": "int64",
                  "px": "float64", "py": "float64", "pz": "float64"})
        frames = [f for f in frames if len(f)]
        return pd.concat(frames, ignore_index=True) if frames else empty

    def _cell_crossings(pdf, self_mode, _intersection_point):
        A = pdf[["ax", "ay", "az"]].to_numpy(np.float64)
        B = pdf[["bx", "by", "bz"]].to_numpy(np.float64)
        sid = pdf["shape_id"].to_numpy(np.int64)
        eid = pdf["edge_id"].to_numpy(np.int64)
        # shape ids are tiny; edge ids (incl. block-packed trace ids)
        # stay below 2^48
        key64 = (sid << 48) | eid
        # dedupe edges within the cell
        _, first = np.unique(key64, return_index=True)
        A, B, sid, eid, key64 = (
            A[first], B[first], sid[first], eid[first], key64[first]
        )
        if self_mode:
            li = np.arange(len(A))
            M = PK.paths_cross_edges(A, B, A, B, mode="proper")
            ii, jj = np.nonzero(np.triu(M, 1))
        else:
            am = sid == sid.min()
            bm = ~am
            if not am.any() or not bm.any():
                return pd.DataFrame(
                    columns=["shape_id", "edge_id", "px", "py", "pz"]
                ).astype({"shape_id": "int64", "edge_id": "int64",
                          "px": "float64", "py": "float64", "pz": "float64"})
            ia = np.nonzero(am)[0]
            ib = np.nonzero(bm)[0]
            M = PK.paths_cross_edges(A[ia], B[ia], A[ib], B[ib], mode="proper")
            ri, rj = np.nonzero(M)
            ii, jj = ia[ri], ib[rj]
        rows = []
        for i, j in zip(ii.tolist(), jj.tolist()):
            x = _intersection_point(A[i], B[i], A[j], B[j])
            for r in (i, j):
                rows.append(
                    (int(sid[r]), int(eid[r]), float(x[0]), float(x[1]), float(x[2]))
                )
        return pd.DataFrame(
            rows, columns=["shape_id", "edge_id", "px", "py", "pz"]
        ).astype({"shape_id": "int64", "edge_id": "int64",
                  "px": "float64", "py": "float64", "pz": "float64"})

    # group at SEED granularity (hundreds of pandas groups, not one per
    # refined cell) and iterate the refined cells inside — the per-group
    # applyInPandas overhead dominated the per-cell version
    keyed = index.withColumn("_grp", CC.parent("cell_id_s", 4))
    return (
        keyed.groupBy("_grp")
        .applyInPandas(
            per_group, "shape_id long, edge_id long, px double, py double, pz double"
        )
        .dropDuplicates(["shape_id", "edge_id", "px", "py", "pz"])
    )


# --------------------------------------------------------------------- split
def split_subedges(edges: DataFrame, cuts: DataFrame, seed_level: int) -> DataFrame:
    """Edges split at their cut points, with midpoints and the midpoint's
    seed cell (SUB_SCHEMA).  Cut ordering mirrors kernel _split_edges
    (atan2 in the (a, t̂) tangent frame — monotone over the edge span)."""
    agg = cuts.groupBy("shape_id", "edge_id").agg(
        F.collect_list(F.struct("px", "py", "pz")).alias("cuts")
    )
    joined = edges.join(
        agg,
        (edges["shape_id"] == agg["shape_id"]) & (edges["edge_id"] == agg["edge_id"]),
        "left",
    ).select(edges["*"], agg["cuts"])

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "shape_id", "edge_id", "sub_idx",
            "pax", "pay", "paz", "pbx", "pby", "pbz",
            "sax", "say", "saz", "sbx", "sby", "sbz",
            "mx", "my", "mz",
        ]
        for pdf in batches:
            A = pdf[["ax", "ay", "az"]].to_numpy(np.float64)
            B = pdf[["bx", "by", "bz"]].to_numpy(np.float64)
            has_cuts = np.array(
                [
                    c is not None
                    and not isinstance(c, float)  # null → NaN under pandas
                    and len(c) > 0
                    for c in pdf["cuts"]
                ],
                bool,
            )
            frames = []
            # vectorized fast path: the uncut majority — one sub-edge per
            # edge, chord midpoint, no Python loop
            un = np.nonzero(~has_cuts)[0]
            if len(un):
                Au, Bu = A[un], B[un]
                Mmid = Au + Bu
                Mmid /= np.linalg.norm(Mmid, axis=1, keepdims=True)
                frames.append(
                    pd.DataFrame(
                        {
                            "shape_id": pdf["shape_id"].to_numpy(np.int64)[un],
                            "edge_id": pdf["edge_id"].to_numpy(np.int64)[un],
                            "sub_idx": np.zeros(len(un), np.int64),
                            "pax": Au[:, 0], "pay": Au[:, 1], "paz": Au[:, 2],
                            "pbx": Bu[:, 0], "pby": Bu[:, 1], "pbz": Bu[:, 2],
                            "sax": Au[:, 0], "say": Au[:, 1], "saz": Au[:, 2],
                            "sbx": Bu[:, 0], "sby": Bu[:, 1], "sbz": Bu[:, 2],
                            "mx": Mmid[:, 0], "my": Mmid[:, 1], "mz": Mmid[:, 2],
                        }
                    )
                )
            # cut edges: ordered chain per edge (kernel _split_edges order)
            out = []
            for r in np.nonzero(has_cuts)[0].tolist():
                a, b = A[r], B[r]
                cuts_l = pdf["cuts"].iloc[r]
                pts = [np.array([c["px"], c["py"], c["pz"]]) for c in cuts_l]
                t = b - a * float(a @ b)
                t = t / np.linalg.norm(t)
                pts.sort(key=lambda x: np.arctan2(float(x @ t), float(x @ a)))
                chain = [a] + pts + [b]
                sid = int(pdf["shape_id"].iloc[r])
                eid = int(pdf["edge_id"].iloc[r])
                for si in range(len(chain) - 1):
                    sa, sb = chain[si], chain[si + 1]
                    m = sa + sb
                    nm = np.linalg.norm(m)
                    m = m / nm if nm > 0 else sa
                    out.append(
                        (
                            sid, eid, si,
                            a[0], a[1], a[2], b[0], b[1], b[2],
                            *(float(v) for v in sa), *(float(v) for v in sb),
                            float(m[0]), float(m[1]), float(m[2]),
                        )
                    )
            if out:
                frames.append(pd.DataFrame(out, columns=cols))
            res = (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame(columns=cols)
            )
            if len(res):
                leaf = K.from_point(
                    res["mx"].to_numpy(np.float64),
                    res["my"].to_numpy(np.float64),
                    res["mz"].to_numpy(np.float64),
                )
                res["seed_s"] = K.bias(K.parent(leaf, seed_level))
            else:
                res["seed_s"] = np.array([], dtype=np.int64)
            yield res.astype(
                {"shape_id": "int32", "edge_id": "int64",
                 "sub_idx": "int32", "seed_s": "int64"}
            )

    return joined.mapInPandas(make, SUB_SCHEMA)


# ------------------------------------------------------------------ classify
def _classify_group(
    subs: pd.DataFrame,
    grp_edges: pd.DataFrame,
    anchor_pt: np.ndarray,
    anchor_val,
    mode: str,
    keep_fn,
) -> pd.DataFrame:
    """Per-seed classification + keep/orient (module docstring step 5).
    keep_fn(left_vals, right_vals) → (keep mask, reverse mask); vals are
    {shape_id: bool array} for parity mode or int arrays for signed."""
    Msub = subs[["mx", "my", "mz"]].to_numpy(np.float64)
    SA = subs[["sax", "say", "saz"]].to_numpy(np.float64)
    SB = subs[["sbx", "sby", "sbz"]].to_numpy(np.float64)
    PA = subs[["pax", "pay", "paz"]].to_numpy(np.float64)
    PB = subs[["pbx", "pby", "pbz"]].to_numpy(np.float64)
    C = grp_edges[["ax", "ay", "az"]].to_numpy(np.float64)
    D = grp_edges[["bx", "by", "bz"]].to_numpy(np.float64)
    esid = grp_edges["shape_id"].to_numpy(np.int64)
    K_n = len(Msub)
    Pp = np.tile(anchor_pt, (K_n, 1))
    X = PK.paths_cross_edges(Pp, Msub, C, D, mode=("parity" if mode == "parity" else "signed"))
    # incidence: group edge bit-equal to the sub's PARENT edge (either dir)
    inc_fwd = ((C[None, :, :] == PA[:, None, :]).all(-1)
               & (D[None, :, :] == PB[:, None, :]).all(-1))
    inc_rev = ((C[None, :, :] == PB[:, None, :]).all(-1)
               & (D[None, :, :] == PA[:, None, :]).all(-1))
    inc = inc_fwd | inc_rev
    Xn = np.where(inc, 0, X)  # non-incident contributions

    shapes = sorted(set(int(s) for s in esid))
    if mode == "parity":
        base = {
            s: np.array([anchor_val[s]] * K_n)
            ^ ((Xn[:, esid == s].sum(1) & 1).astype(bool))
            for s in shapes
        }
        left = {s: base[s].copy() for s in shapes}
        right = {s: base[s].copy() for s in shapes}
    else:
        w_base = int(anchor_val) + Xn.sum(1)
        left = w_base.copy()
        right = w_base.copy()

    # incident copies: the limit path anchor→m±ε·left crosses the copy
    # iff the anchor sits on the great-circle side opposite the probe
    # (winding_sides, kernel/winding.py:94-110)
    ki, mi = np.nonzero(inc)
    for k, m in zip(ki.tolist(), mi.tolist()):
        c, d = C[m], D[m]
        s_ref = int(P.sign(c[None], d[None], anchor_pt[None])[0])
        if s_ref == 0:
            raise ValueError("anchor point on an input edge circle")
        side_left = 1 if inc_fwd[k, m] else -1
        if mode == "parity":
            s = int(esid[m])
            if s_ref * side_left < 0:
                left[s][k] ^= True
            else:
                right[s][k] ^= True
        else:
            delta = (
                -1
                if int(P.sign(anchor_pt[None], Msub[k][None], d[None])[0]) > 0
                else 1
            )
            if s_ref * side_left < 0:
                left[k] += delta
            else:
                right[k] += delta

    keep, reverse = keep_fn(left, right)
    sid_s = subs["shape_id"].to_numpy(np.int64)
    eid_s = subs["edge_id"].to_numpy(np.int64)
    sub_s = subs["sub_idx"].to_numpy(np.int64)
    rows = []
    for k in np.nonzero(keep)[0].tolist():
        a, b = (SB[k], SA[k]) if reverse[k] else (SA[k], SB[k])
        rows.append(
            tuple(float(v) for v in a)
            + tuple(float(v) for v in b)
            + (int(sid_s[k]), int(eid_s[k]), int(sub_s[k]))
        )
    res = pd.DataFrame(
        rows,
        columns=["sax", "say", "saz", "sbx", "sby", "sbz", "k1", "k2", "k3"],
    )
    if len(res):
        res = res.astype(
            {c: "float64" for c in res.columns[:6]}
            | {"k1": "int32", "k2": "int64", "k3": "int32"}
        )
    else:
        res = res.astype(
            {"sax": "float64", "say": "float64", "saz": "float64",
             "sbx": "float64", "sby": "float64", "sbz": "float64",
             "k1": "int32", "k2": "int64", "k3": "int32"}
        )
    return res


_BOOL_OPS = {
    "intersection": lambda ia, ib: ia & ib,
    "union": lambda ia, ib: ia | ib,
    "difference": lambda ia, ib: ia & ~ib,
    "symmetric_difference": lambda ia, ib: ia ^ ib,
}


def distributed_boolean_boundaries(
    edges_a: DataFrame,
    edges_b: DataFrame,
    ops: tuple[str, ...],
    seed_level: int = 5,
    max_edges_per_cell: int = 16,
    max_level: int = 20,
) -> dict[str, DataFrame]:
    """Boundary edges of every op(A, B) in `ops`, sharing ONE pass of the
    op-independent infrastructure (origin flags, shape index, anchors,
    crossings, sub-edge split) — only the per-sub-edge classification
    and dedupe differ per op.  Returns {op: BOUNDARY_SCHEMA DataFrame}."""
    from .shape_index import build_shape_index

    spark = edges_a.sparkSession
    edges = edges_a.unionByName(edges_b)
    flags = shape_origin_inside(edges)
    flags.setdefault(0, False)
    flags.setdefault(1, False)

    plain = edges.select(
        "shape_id", "edge_id", "ax", "ay", "az", "bx", "by", "bz"
    )
    index = build_shape_index(
        plain, max_edges_per_cell=max_edges_per_cell,
        max_level=max_level, seed_level=seed_level,
    ).persist()
    seeded = (
        index.select(
            CC.parent("cell_id_s", seed_level).alias("seed_s"),
            "shape_id", "edge_id", "ax", "ay", "az", "bx", "by", "bz",
        ).dropDuplicates(["seed_s", "shape_id", "edge_id"])
    ).persist()
    occ = np.array(
        [int(r.seed_s) for r in seeded.select("seed_s").distinct().collect()],
        dtype=np.int64,
    )
    anchors = seed_anchor_values(
        seeded, occ, seed_level, "parity", P.ORIGIN, start_parities=flags
    )

    cuts = crossing_points(index, self_mode=False)
    # the sub-edge table feeds one classify cogroup per op
    subs = split_subedges(edges, cuts, seed_level)
    if len(ops) > 1:
        subs = subs.persist()

    b_anchors = spark.sparkContext.broadcast(
        {int(k): (bool(v.get(0, False)), bool(v.get(1, False)))
         for k, v in anchors.items()}
    )

    out: dict[str, DataFrame] = {}

    def make_classify(opf):
        def classify(key, subs_pdf, edges_pdf) -> pd.DataFrame:
            seed = int(key[0])
            anchor_pt = _anchor_points(np.array([seed]))[0]
            av = b_anchors.value.get(seed, (False, False))
            if len(subs_pdf) == 0:
                return pd.DataFrame(
                    columns=["sax", "say", "saz", "sbx", "sby", "sbz"]
                ).astype("float64").assign(
                    seed_s=np.array([], dtype=np.int64),
                    k1=np.array([], dtype=np.int32),
                    k2=np.array([], dtype=np.int64),
                    k3=np.array([], dtype=np.int32),
                )

            def kf(left, right):
                # fill missing shapes with the anchor base (no local
                # edges → value constant across the group)
                n = len(subs_pdf)
                for d, base in ((left, av), (right, av)):
                    for s in (0, 1):
                        if s not in d:
                            d[s] = np.full(n, base[s], bool)
                vl = opf(left[0], left[1])
                vr = opf(right[0], right[1])
                return vl != vr, ~vl

            res = _classify_group(
                subs_pdf, edges_pdf, anchor_pt, {0: av[0], 1: av[1]},
                "parity", kf,
            )
            res["seed_s"] = np.int64(seed)
            return res

        return classify

    for op in ops:
        out[op] = (
            subs.groupBy("seed_s")
            .cogroup(seeded.groupBy("seed_s"))
            .applyInPandas(make_classify(_BOOL_OPS[op]), BOUNDARY_SCHEMA)
            # shared A/B copies emit the same oriented edge twice — keep
            # one row with the MINIMAL order key so the assembly walk
            # order is deterministic (dropDuplicates would pick an
            # arbitrary copy)
            .groupBy("sax", "say", "saz", "sbx", "sby", "sbz")
            .agg(
                F.min("seed_s").alias("seed_s"),
                F.min(F.struct("k1", "k2", "k3")).alias("_k"),
            )
            .select(
                "sax", "say", "saz", "sbx", "sby", "sbz", "seed_s",
                F.col("_k.k1").alias("k1"),
                F.col("_k.k2").alias("k2"),
                F.col("_k.k3").alias("k3"),
            )
        )
    return out


def distributed_boolean_boundary(
    edges_a: DataFrame,
    edges_b: DataFrame,
    op: str,
    seed_level: int = 5,
    max_edges_per_cell: int = 16,
    max_level: int = 20,
) -> DataFrame:
    """Boundary edges of op(A, B) computed with NO single task ever
    holding a whole operand (BOUNDARY_SCHEMA rows, oriented result-left).
    Both inputs are ARR_EDGE_SCHEMA DataFrames (shape_id 0 and 1)."""
    return distributed_boolean_boundaries(
        edges_a, edges_b, (op,), seed_level, max_edges_per_cell, max_level
    )[op]


def distributed_winding_boundary(
    edges: DataFrame,
    ref: np.ndarray,
    ref_winding: int,
    rule,
    seed_level: int = 5,
    max_edges_per_cell: int = 16,
    max_level: int = 20,
) -> DataFrame:
    """S2WindingOperation boundary (general position) with the
    arrangement sharded across executors; `rule` is a WindingRule
    predicate (kernel/winding.py)."""
    from .shape_index import build_shape_index

    spark = edges.sparkSession
    plain = edges.select(
        "shape_id", "edge_id", "ax", "ay", "az", "bx", "by", "bz"
    )
    index = build_shape_index(
        plain, max_edges_per_cell=max_edges_per_cell,
        max_level=max_level, seed_level=seed_level,
    ).persist()
    seeded = (
        index.select(
            CC.parent("cell_id_s", seed_level).alias("seed_s"),
            "shape_id", "edge_id", "ax", "ay", "az", "bx", "by", "bz",
        ).dropDuplicates(["seed_s", "shape_id", "edge_id"])
    ).persist()
    occ = np.array(
        [int(r.seed_s) for r in seeded.select("seed_s").distinct().collect()],
        dtype=np.int64,
    )
    anchors = seed_anchor_values(
        seeded, occ, seed_level, "signed", np.asarray(ref, float),
        start_winding=int(ref_winding),
    )
    cuts = crossing_points(index, self_mode=True)
    subs = split_subedges(edges, cuts, seed_level)
    b_anchors = spark.sparkContext.broadcast(
        {int(k): int(v) for k, v in anchors.items()}
    )

    def classify(key, subs_pdf, edges_pdf) -> pd.DataFrame:
        seed = int(key[0])
        anchor_pt = _anchor_points(np.array([seed]))[0]
        w0 = b_anchors.value.get(seed, int(ref_winding))
        if len(subs_pdf) == 0:
            return pd.DataFrame(
                columns=["sax", "say", "saz", "sbx", "sby", "sbz"]
            ).astype("float64").assign(
                seed_s=np.array([], dtype=np.int64),
                k1=np.array([], dtype=np.int32),
                k2=np.array([], dtype=np.int64),
                k3=np.array([], dtype=np.int32),
            )

        def kf(left, right):
            vl = np.array([bool(rule(int(w))) for w in left])
            vr = np.array([bool(rule(int(w))) for w in right])
            return vl != vr, ~vl

        res = _classify_group(
            subs_pdf, edges_pdf, anchor_pt, w0, "signed", kf
        )
        res["seed_s"] = np.int64(seed)
        return res

    return (
        subs.groupBy("seed_s")
        .cogroup(seeded.groupBy("seed_s"))
        .applyInPandas(classify, BOUNDARY_SCHEMA)
        # shared A/B copies emit the same oriented edge twice — keep one
        # row with the MINIMAL order key so the assembly walk order is
        # deterministic (dropDuplicates would pick an arbitrary copy)
        .groupBy("sax", "say", "saz", "sbx", "sby", "sbz")
        .agg(
            F.min("seed_s").alias("seed_s"),
            F.min(F.struct("k1", "k2", "k3")).alias("_k"),
        )
        .select(
            "sax", "say", "saz", "sbx", "sby", "sbz", "seed_s",
            F.col("_k.k1").alias("k1"),
            F.col("_k.k2").alias("k2"),
            F.col("_k.k3").alias("k3"),
        )
    )


# ------------------------------------------------------------------ assembly
def _local_chains_df(boundary: DataFrame):
    """Stage 1 of sharded assembly: per-seed chains broken at global
    junction vertices and shard borders.  Rows tagged `is_loop` are
    junction-free cycles wholly inside one shard — globally standalone
    loops (every vertex has out-degree 1 and the cycle is closed), so
    they never need the driver.  Returns (chains_df, boundary_handle)
    with the boundary persisted (consumed by the junction aggregate and
    the chain job)."""
    boundary = boundary.persist()
    # global junction vertices: start-vertex out-degree ≥ 2
    deg = (
        boundary.groupBy("sax", "say", "saz")
        .count()
        .filter(F.col("count") >= 2)
        .collect()
    )
    junctions = {(r.sax, r.say, r.saz) for r in deg}
    spark = boundary.sparkSession
    b_junc = spark.sparkContext.broadcast(junctions)

    chain_schema = (
        "is_loop boolean, mk1 int, mk2 long, mk3 int,"
        " pos int, n int, vs array<double>"
    )

    def local(key, pdf: pd.DataFrame) -> pd.DataFrame:
        junc = b_junc.value
        pdf = pdf.sort_values(["k1", "k2", "k3"], kind="mergesort").reset_index(
            drop=True
        )
        A = pdf[["sax", "say", "saz"]].to_numpy(np.float64)
        B = pdf[["sbx", "sby", "sbz"]].to_numpy(np.float64)
        keys = list(
            zip(pdf["k1"].tolist(), pdf["k2"].tolist(), pdf["k3"].tolist())
        )
        by_start: dict[tuple, list[int]] = {}
        for i in range(len(A)):
            by_start.setdefault(tuple(A[i]), []).append(i)
        used = np.zeros(len(A), bool)
        chains = []
        # chain heads first: edges whose start is a junction or has no
        # local incoming edge; leftovers (local cycles) walked after
        ends = {tuple(b) for b in B}
        order = sorted(
            range(len(A)),
            key=lambda i: (tuple(A[i]) not in junc and tuple(A[i]) in ends, i),
        )
        for i in order:
            if used[i]:
                continue
            verts = [A[i]]
            mk = keys[i]
            pos = 0
            step = 0
            j = i
            while True:
                used[j] = True
                if keys[j] < mk:
                    mk, pos = keys[j], step
                verts.append(B[j])
                step += 1
                key_b = tuple(B[j])
                if key_b in junc:
                    break
                nxts = [k for k in by_start.get(key_b, []) if not used[k]]
                if not nxts:
                    break
                j = nxts[0]
            closed = (
                len(verts) >= 4
                and tuple(verts[0]) == tuple(verts[-1])
                and tuple(verts[0]) not in junc
            )
            chains.append((closed, mk, pos, np.asarray(verts)))
        return pd.DataFrame(
            {
                "is_loop": [c for c, *_ in chains],
                "mk1": [mk[0] for _c, mk, _p, _ in chains],
                "mk2": [mk[1] for _c, mk, _p, _ in chains],
                "mk3": [mk[2] for _c, mk, _p, _ in chains],
                "pos": [p for _c, _mk, p, _ in chains],
                "n": [len(v) for *_, v in chains],
                "vs": [v.reshape(-1).tolist() for *_, v in chains],
            }
        ).astype({"is_loop": "bool", "mk1": "int32", "mk2": "int64",
                  "mk3": "int32", "pos": "int32", "n": "int32"})

    return boundary.groupBy("seed_s").applyInPandas(local, chain_schema), boundary


def assemble_boundary(boundary: DataFrame):
    """Sharded loop assembly, fully materialized on the driver: local
    chains per seed, driver stitches with the same max-CCW rule as
    kernel _assemble_loops and the kernel's walk order (each walk starts
    at the globally minimal unused (k1, k2, k3) edge key, ENTERING its
    chain at that edge), so the loop DECOMPOSITION matches the
    single-node kernels exactly — not just the boundary set.  Returns
    loops as a list of (n,3) arrays.  For outputs too large for the
    driver use assemble_boundary_distributed: in-shard loops then stay
    a DataFrame and only shard-crossing chains collect."""
    chains_df, handle = _local_chains_df(boundary)
    rows = chains_df.collect()
    handle.unpersist()
    loops = [
        np.asarray(r.vs).reshape(-1, 3)[:-1] for r in rows if r.is_loop
    ]
    chains = [
        (
            (int(r.mk1), int(r.mk2), int(r.mk3)),
            int(r.pos),
            np.asarray(r.vs).reshape(-1, 3),
        )
        for r in rows
        if not r.is_loop
    ]
    return loops + _stitch_chains(chains)


def assemble_boundary_distributed(boundary: DataFrame):
    """Scale-path assembly: returns (loops_df, stitched_loops).
    `loops_df` holds the in-shard closed loops as (n, vs) rows and NEVER
    visits the driver; only shard-crossing / junction chains collect for
    stitching (O(junctions + crossings), not O(total boundary)) and come
    back as driver-side arrays."""
    chains_df, handle = _local_chains_df(boundary)
    chains_df = chains_df.persist()
    loops_df = chains_df.filter(F.col("is_loop")).select("n", "vs")
    rows = chains_df.filter(~F.col("is_loop")).collect()
    handle.unpersist()
    chains = [
        (
            (int(r.mk1), int(r.mk2), int(r.mk3)),
            int(r.pos),
            np.asarray(r.vs).reshape(-1, 3),
        )
        for r in rows
    ]
    return loops_df, _stitch_chains(chains)


def _stitch_chains(keyed_chains) -> list[np.ndarray]:
    """Join chains end-to-start into closed loops — the kernel
    _assemble_loops walk lifted to chain granularity.  Each walk starts
    at the globally minimal unused edge key, ENTERING its chain at that
    edge (the chain is split there), because termination is decided at
    the walk's own start vertex: a walk that started at a junction-head
    instead would find unused siblings on return and merge rings the
    kernel keeps separate (stairs corner-touch fixture).  Junctions
    resolve by the same max-CCW rule using chain first-segment
    directions; with chains consumed atomically this reproduces the
    kernel's junction-decision order and exact loop decomposition."""
    from ..kernel.booleans import _tangent_toward

    items = sorted(keyed_chains, key=lambda kc: kc[0])
    # dissolve self-closed chains ONLY where no other chain shares the
    # closure vertex — a chain closing at a junction must go through the
    # max-CCW pairing below (auto-dissolving it would pre-empt the
    # kernel's face-tracing decomposition, e.g. the bow-tie's single
    # figure-eight loop)
    start_count: dict[tuple, int] = {}
    for _k, _p, c in items:
        k = tuple(c[0])
        start_count[k] = start_count.get(k, 0) + 1
    loops: list[np.ndarray] = []
    verts_l: list[np.ndarray] = []   # chain vertex arrays (mutable set)
    pos_l: list[int] = []            # min-edge position per chain
    order_l: list[int] = []          # walk-start order (ascending key)
    for k, p, c in items:
        if (
            len(c) >= 4
            and tuple(c[0]) == tuple(c[-1])
            and start_count[tuple(c[0])] == 1
        ):
            loops.append(c[:-1])
        else:
            order_l.append(len(verts_l))
            verts_l.append(c)
            pos_l.append(p)
    by_start: dict[tuple, list[int]] = {}
    for i, c in enumerate(verts_l):
        by_start.setdefault(tuple(c[0]), []).append(i)
    used = [False] * len(verts_l)

    def walk_from(start_idx: int):
        # split the entry chain at its min edge so the walk starts there
        c = verts_l[start_idx]
        pos = pos_l[start_idx]
        if pos > 0:
            head = c[: pos + 1]
            tail = c[pos:]
            verts_l[start_idx] = tail
            by_start[tuple(c[0])].remove(start_idx)
            head_idx = len(verts_l)
            verts_l.append(head)
            pos_l.append(0)
            used.append(False)
            by_start.setdefault(tuple(head[0]), []).append(head_idx)
            by_start.setdefault(tuple(tail[0]), []).append(start_idx)
        start_vertex = tuple(verts_l[start_idx][0])
        verts: list[np.ndarray] = []
        j = start_idx
        while not used[j]:
            used[j] = True
            c = verts_l[j]
            verts.extend(c[:-1])
            end = c[-1]
            nxts = [k for k in by_start.get(tuple(end), []) if not used[k]]
            if not nxts:
                if tuple(end) != start_vertex:
                    raise ValueError("open chain in distributed overlay")
                break
            if len(nxts) == 1:
                j = nxts[0]
            else:
                v = end
                r = _tangent_toward(v, c[-2])
                e2 = np.cross(v, r)
                best, best_ang = None, -1.0
                for k in nxts:
                    cdir = _tangent_toward(v, verts_l[k][1])
                    ang = math.atan2(float(cdir @ e2), float(cdir @ r)) % (
                        2 * math.pi
                    )
                    if ang > best_ang:
                        best, best_ang = k, ang
                j = best
        if len(verts) >= 3:
            loops.append(np.asarray(verts))

    for i in order_l:  # ascending min-key
        if not used[i]:
            walk_from(i)
    # head fragments added by splits that never got consumed would be a
    # bug — the walk must close through them
    for i, c in enumerate(verts_l):
        if not used[i]:
            raise ValueError("unconsumed chain fragment in stitch")
    return loops


def _loops_to_polygon(loops):
    from ..kernel.contains import Loop, Polygon
    from ..kernel.measures import loop_signed_area

    out = []
    for v in loops:
        if loop_signed_area(v) < 0:
            v = v[::-1].copy()
        out.append(Loop(v))
    return Polygon(out)


def distributed_boolean_op(edges_a, edges_b, op: str, **kw):
    """op(A, B) as a driver-side even-odd Polygon (all loops CCW) —
    convenience wrapper; at true scale keep the boundary DataFrame."""
    boundary = distributed_boolean_boundary(edges_a, edges_b, op, **kw)
    return _loops_to_polygon(assemble_boundary(boundary))


def distributed_boolean_ops(edges_a, edges_b, ops: tuple[str, ...], **kw):
    """All `ops` over one pair with the op-independent infrastructure
    (index/anchors/crossings/split) computed once → {op: Polygon}."""
    bounds = distributed_boolean_boundaries(edges_a, edges_b, ops, **kw)
    return {
        op: _loops_to_polygon(assemble_boundary(b)) for op, b in bounds.items()
    }


def distributed_winding_op(edges, ref, ref_winding, rule, **kw):
    boundary = distributed_winding_boundary(edges, ref, ref_winding, rule, **kw)
    return assemble_boundary(boundary)


# ------------------------------------------------------------------- buffer
def distributed_buffer_boundary(
    edges: DataFrame,
    radius_rad: float,
    circle_segments: float = 16.0,
    seed_level: int = 5,
    max_edges_per_cell: int = 16,
    max_level: int = 20,
) -> DataFrame:
    """S2BufferOperation at arrangement scale: the offset trace
    (kernel/booleans._offset_trace — per-edge small-circle arcs joined by
    signed vertex arcs) is generated PER INPUT EDGE on the executors
    (each row needs only its own edge and the next vertex, fetched by an
    (eidx+1)-mod-n self-join — no per-loop task, no driver trace), then
    the self-intersections resolve through the distributed winding
    pipeline (rule POSITIVE, reference at the input's antipodal centroid
    with winding 0 — the reference's own composition,
    s2buffer_operation.cc).  Input loops must be oriented interior-left
    (shells CCW, holes CW), as in buffer_polygon_winding.

    The generated trace is bit-identical to the kernel's (same sample
    formulas; adjacent-duplicate dedup applied at row boundaries with the
    kernel's 1e-24 chord² rule), so the output boundary matches
    buffer_polygon_winding loop-for-loop."""
    spark = edges.sparkSession
    s = edges.agg(
        F.sum("ax").alias("sx"), F.sum("ay").alias("sy"), F.sum("az").alias("sz")
    ).collect()[0]
    centroid = np.array([float(s.sx), float(s.sy), float(s.sz)])
    centroid = centroid / np.linalg.norm(centroid)
    ref = -centroid

    n_per_loop = edges.groupBy("shape_id", "loop_id").agg(
        (F.max("eidx") + 1).alias("n_loop")
    )
    lhs = edges.join(n_per_loop, ["shape_id", "loop_id"]).withColumn(
        "eidx_next", (F.col("eidx") + 1) % F.col("n_loop")
    )
    rhs = edges.select(
        "shape_id", "loop_id",
        F.col("eidx").alias("eidx_next"),
        F.col("bx").alias("cx"), F.col("by").alias("cy"),
        F.col("bz").alias("cz"),
    )
    rows = lhs.join(rhs, ["shape_id", "loop_id", "eidx_next"])

    r = float(radius_rad)
    # sub-edge id block per input edge: a row emits at most
    # k1 + 1 + (k2-1) + 1 = 2*circle_segments + 1 trace edges (both arc
    # spans are bounded by pi/step = circle_segments samples), so the
    # packed id edge_id*block + si is collision-free for ANY
    # circle_segments, and int64 ids carry billions of input edges
    # (the old edge_id*64 int32 packing collided for circle_segments>32
    # and wrapped past ~33M edges)
    block = 2 * int(math.ceil(circle_segments)) + 2

    def trace(batches):
        from ..kernel.booleans import _dedup_keep_mask, _offset_trace_samples

        cols = ["shape_id", "loop_id", "eidx", "edge_id",
                "ax", "ay", "az", "bx", "by", "bz"]
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols).astype(
                    {"shape_id": "int32", "loop_id": "int32",
                     "eidx": "int64", "edge_id": "int64"}
                    | {c: "float64" for c in cols[4:]}
                )
                continue
            A = pdf[["ax", "ay", "az"]].to_numpy(np.float64)
            B = pdf[["bx", "by", "bz"]].to_numpy(np.float64)
            C2 = pdf[["cx", "cy", "cz"]].to_numpy(np.float64)
            # (N,3)-vectorized sample generation shared with the kernel
            # _offset_trace -- bit-identical per row regardless of batch
            pts, rid, nxt_first, _cnt = _offset_trace_samples(
                A, B, C2, r, circle_segments
            )
            keep = _dedup_keep_mask(pts, rid)
            # kernel keep[] rule at the row boundary: the row's trailing
            # point is dropped when the NEXT row's first point equals it
            kidx = np.nonzero(keep)[0]
            krow = rid[kidx]
            if len(kidx):
                last_mask = np.ones(len(kidx), bool)
                last_mask[:-1] = krow[:-1] != krow[1:]
                last_idx = kidx[last_mask]
                last_rows = krow[last_mask]
                drop = (
                    (pts[last_idx] - nxt_first[last_rows]) ** 2
                ).sum(1) <= 1e-24
                if drop.any():
                    keep[last_idx[drop]] = False
                    kidx = np.nonzero(keep)[0]
                    krow = rid[kidx]
            # emit trace EDGES: consecutive kept points + the connector
            # to the next row's first point
            src = pts[kidx]
            same_next = np.zeros(len(kidx), bool)
            if len(kidx) > 1:
                same_next[:-1] = krow[1:] == krow[:-1]
            dst = np.empty_like(src)
            nn = np.nonzero(same_next)[0]
            dst[nn] = pts[kidx[nn + 1]]
            dst[~same_next] = nxt_first[krow[~same_next]]
            row_change = np.ones(len(kidx), bool)
            if len(kidx) > 1:
                row_change[1:] = krow[1:] != krow[:-1]
            grp_start = np.nonzero(row_change)[0]
            starts_rep = np.repeat(
                grp_start, np.diff(np.append(grp_start, len(kidx)))
            )
            si = np.arange(len(kidx), dtype=np.int64) - starts_rep
            if len(si) and int(si.max()) >= block:
                raise ValueError(
                    f"trace chain exceeds id block ({int(si.max())} >= "
                    f"{block}) -- inconsistent with circle_segments bound"
                )
            eid = pdf["edge_id"].to_numpy(np.int64)
            sid = pdf["shape_id"].to_numpy(np.int64)
            lid = pdf["loop_id"].to_numpy(np.int64)
            # pack from the FLAT input edge_id (unique across loops) --
            # eidx restarts per loop and would collide
            tid = eid[krow] * block + si
            yield pd.DataFrame(
                {
                    "shape_id": sid[krow].astype(np.int32),
                    "loop_id": lid[krow].astype(np.int32),
                    "eidx": tid,
                    "edge_id": tid,
                    "ax": src[:, 0], "ay": src[:, 1], "az": src[:, 2],
                    "bx": dst[:, 0], "by": dst[:, 1], "bz": dst[:, 2],
                }
            )

    trace_edges = rows.mapInPandas(trace, ARR_EDGE_SCHEMA)
    from ..kernel.winding import WindingRule

    return distributed_winding_boundary(
        trace_edges, ref, 0, WindingRule.POSITIVE,
        seed_level=seed_level, max_edges_per_cell=max_edges_per_cell,
        max_level=max_level,
    )


def distributed_buffer_op(edges, radius_rad, circle_segments=16.0, **kw):
    """Buffered polygon as a driver-side Polygon (convenience)."""
    boundary = distributed_buffer_boundary(
        edges, radius_rad, circle_segments, **kw
    )
    return _loops_to_polygon(assemble_boundary(boundary))
