"""Distributed connected components over pair tables.

The missing last step of a web-scale dedup pipeline: MinHash/LSH (or
exact-hash, SimHash, embedding near-dup) emits candidate PAIRS, but the
pipeline needs CLUSTERS — one canonical document id per duplicate group
so a single pass can keep/drop rows.  At 10^12 documents the pair graph
has billions of edges, so this uses the alternating Large-Star /
Small-Star algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014): each round
is two shuffles (a groupBy per star step), the edge set contracts toward
the star graph node→component-min, and the round count is
O(log n) in the worst case (typically 2-4 on dedup graphs, whose
components are near-cliques).

Every step is plain DataFrame ops (no UDFs): the per-node minimum is a
groupBy aggregate, star re-attachment is an equi-join, and each round
`localCheckpoint`s lazily to truncate the growing lineage without an
eager job.  Convergence is detected with one aggregate over the edge
set (count + order-independent xxhash64 checksum), so a converged run
costs exactly one extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One Large-Star (large=True) or Small-Star round.

    Edges are canonical (src > dst is NOT required on input; both steps
    re-orient internally).  Output edges always point high→low:
    (node, new_parent) with new_parent < node.

    The per-node minimum is a window aggregate over partitionBy(u) —
    ONE exchange of the (symmetrized) edge set instead of the
    groupBy-then-join-back formulation's two (and no join at all, so
    nothing to broadcast or sort-merge at 10^12-node scale); duplicate
    emissions collapse in the single (src, dst) distinct that also
    bounds the edge set between rounds."""
    w = Window.partitionBy("u")
    if large:
        # Large-Star: symmetrize, m = min(Γ(u) ∪ {u}); connect every
        # STRICTLY LARGER neighbor to m (Kiveris et al. §3, Alg. 2).
        sym = edges.select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        ).union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        withm = sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        out = withm.where(F.col("v") > F.col("u")).select(
            F.col("v").alias("src"), F.col("m").alias("dst")
        )
    else:
        # Small-Star: orient each edge high→low, m = min(N(u) ∪ {u})
        # over the smaller-or-equal neighbors; connect every member of
        # N(u) ∪ {u} except m to m (Algorithm 3).
        oriented = edges.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        withm = oriented.withColumn("m", F.min("v").over(w))
        # Both link kinds come out of the SAME windowed row via explode —
        # a union of two branches would carry differently-pushed filters
        # below its two window exchanges and defeat ReusedExchange.  The
        # (u, m) self link is emitted once per incident row; the trailing
        # distinct collapses the duplicates, and v == m rows die in the
        # src != dst filter.
        out = withm.select(
            F.explode(
                F.array(
                    F.struct(F.col("v").alias("src"), F.col("m").alias("dst")),
                    F.struct(F.col("u").alias("src"), F.col("m").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    return out.where(F.col("src") != F.col("dst")).distinct()


def _edge_signature(edges: DataFrame) -> tuple[int, int]:
    """(count, order-independent checksum) — one aggregate pass."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node in `pairs`, where component is
    the minimum node id reachable from it.

    `pairs` is an undirected edge list; self-loops and duplicates are
    tolerated.  Returns one row per distinct node (including component
    minima, which map to themselves).
    """
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    prev_sig = None
    for _round in range(max_rounds):
        edges = _star_round(edges, large=True)
        edges = _star_round(edges, large=False).localCheckpoint(eager=False)
        sig = _edge_signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:  # pragma: no cover - max_rounds is far above the log2 bound
        raise RuntimeError(f"connected_components: no convergence in {max_rounds} rounds")

    # Converged star graph: every non-min node has exactly one edge to
    # its component min; minima appear only as dst.  Add the minima's
    # self-rows so every node gets a component.
    minima = edges.select(F.col("dst").alias("node")).distinct().join(
        edges.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    )
    return edges.select(
        F.col("src").alias("node"), F.col("dst").alias("component")
    ).union(minima.select("node", F.col("node").alias("component")))


def dedup_components(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Canonicalize a dedup pair table into per-document cluster ids.

    Every document gets a component_id (the minimum doc_id of its
    duplicate cluster; singletons map to themselves) and the cluster
    size — the projection a keep-one-per-cluster filter needs
    (`component_id = doc_id` keeps exactly one representative).
    """
    comp = connected_components(pairs, "doc_a", "doc_b")
    labeled = (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component_id"),
        )
    )
    sizes = labeled.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("component_size")
    )
    return labeled.join(sizes, "component_id").select(
        "doc_id", "component_id", "component_size"
    )
