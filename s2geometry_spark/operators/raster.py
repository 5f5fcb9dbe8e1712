"""Raster ↔ vector conversions on the S2 cell grid (north-rule item).

- rasterize (vector → raster): center-sampling rasterization — a cell at
  the target level is in the raster iff its center is inside the
  polygon.  The grid enumerates (face, i, j) with pure-JVM arithmetic;
  centers come from the trig-free tower st=(i+0.5)/2^level → st_to_uv →
  face_uv_to_xyz, so a DuckDB oracle recomputes them bit-for-bit.
- vectorize (raster → vector): the cell union's boundary polygon
  (kernel cellunion_to_polygon — normalize, boundary-edge extraction,
  staircase loop assembly).  Boundary edges can also be extracted
  distributively (cells whose neighbor is absent → left_anti join);
  loop assembly itself is driver-side on the (small) boundary.

The contract query runs the full round trip raster(vectorize(raster(P)))
and must equal raster(P) — the fixed-point property that makes the
conversion pair verifiable by the direct-rasterization SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cell_grid(spark: SparkSession, level: int, partitions: int = 32) -> DataFrame:
    """All 6·4^level cells at `level` as (face, i, j) rows — row ids
    decomposed with pure-JVM arithmetic (one `range`, no shuffle)."""
    n_side = 1 << level
    total = 6 * n_side * n_side
    base = spark.range(0, total, 1, partitions)
    return base.select(
        (F.col("id") / (n_side * n_side)).cast("int").alias("face"),
        ((F.col("id") / n_side) % n_side).cast("long").alias("i"),
        (F.col("id") % n_side).cast("long").alias("j"),
    )


def grid_centers(grid: DataFrame, level: int) -> DataFrame:
    """Cell centers as unit xyz via the trig-free coordinate tower."""

    @F.pandas_udf("cx double, cy double, cz double")
    def centers(face: pd.Series, i: pd.Series, j: pd.Series) -> pd.DataFrame:
        from ..kernel import coords as C

        n_side = float(1 << level)
        s = (i.to_numpy(np.float64) + 0.5) / n_side
        t = (j.to_numpy(np.float64) + 0.5) / n_side
        u = C.st_to_uv(s)
        v = C.st_to_uv(t)
        x, y, z = C.face_uv_to_xyz(face.to_numpy(np.int64), u, v)
        n = np.sqrt(x * x + y * y + z * z)
        return pd.DataFrame({"cx": x / n, "cy": y / n, "cz": z / n})

    return grid.withColumn("_c", centers("face", "i", "j")).select("*", "_c.*").drop("_c")


def rasterize_polygon(
    spark: SparkSession, polygon, level: int, partitions: int = 32
) -> DataFrame:
    """(face, i, j) cells whose centers lie inside the polygon."""
    grid = grid_centers(cell_grid(spark, level, partitions), level)
    geom = [(l.vertices, l.origin_inside, l.is_empty_or_full) for l in polygon.loops]

    @F.pandas_udf("boolean")
    def inside(cx: pd.Series, cy: pd.Series, cz: pd.Series) -> pd.Series:
        from ..kernel.contains import contains_points

        pts = np.stack(
            [cx.to_numpy(np.float64), cy.to_numpy(np.float64), cz.to_numpy(np.float64)],
            -1,
        )
        out = np.zeros(len(pts), dtype=bool)
        for vertices, origin_inside, empty_or_full in geom:
            out ^= contains_points(vertices, origin_inside, pts, empty_or_full)
        return pd.Series(out)

    return grid.filter(inside("cx", "cy", "cz")).select("face", "i", "j")


def _raster_cell_ids(raster: DataFrame, level: int) -> DataFrame:
    """(face, i, j) → biased cell ids at `level` (Arrow batch)."""

    @F.pandas_udf("long")
    def to_cell(face: pd.Series, i: pd.Series, j: pd.Series) -> pd.Series:
        from ..kernel import cellid as K
        from ..kernel.hilbert import from_face_ij

        shift = 30 - level
        leafs = from_face_ij(
            face.to_numpy(np.int64),
            i.to_numpy(np.int64) << shift,
            j.to_numpy(np.int64) << shift,
        )
        return pd.Series(K.bias(K.parent(leafs, level)))

    return raster.select(to_cell("face", "i", "j").alias("cell_id_s"))


def boundary_edges_df(raster: DataFrame, level: int) -> DataFrame:
    """Distributed boundary extraction: a cell edge is on the union
    boundary iff the edge-neighbor across it (face wraps included,
    s2cell_id.cc:499-512) is NOT in the raster.  One explode + one
    left_anti equi join — O(area) rows shuffle once, O(perimeter) rows
    survive.  Returns (cell_id_s, k) with k the CCW edge index
    (vertex k → k+1, s2cell.h:136-140)."""
    cells = _raster_cell_ids(raster, level)

    @F.pandas_udf("array<long>")
    def nbrs(cell_s: pd.Series) -> pd.Series:
        from ..kernel import cellid as K

        ids = K.unbias(cell_s.to_numpy(np.int64))
        nb = K.bias(K.edge_neighbors(ids).reshape(-1)).reshape(-1, 4)
        return pd.Series([r.tolist() for r in nb])

    edges = (
        cells.withColumn("_nb", nbrs("cell_id_s"))
        .select(
            "cell_id_s",
            F.posexplode("_nb").alias("k", "nbr_s"),
        )
    )
    return edges.join(
        cells.select(F.col("cell_id_s").alias("nbr_s")), "nbr_s", "left_anti"
    ).select("cell_id_s", "k")


def vectorize_cells(raster: DataFrame, level: int):
    """raster (face, i, j) → boundary Polygon of the cell union.

    Scale shape: the O(area) raster never reaches the driver — boundary
    edges are extracted distributively (boundary_edges_df: explode +
    left_anti join), and only the O(perimeter) directed edges collect
    for loop assembly (max-CCW face tracing, kernel/booleans.py).  A
    level-12 global raster (~10⁸ cells) vectorizes with a perimeter-
    sized collect."""
    from ..kernel.booleans import _assemble_loops
    from ..kernel.cell import Cell
    from ..kernel.cid import CID
    from ..kernel.contains import Loop, Polygon

    pdf = boundary_edges_df(raster, level).toPandas()
    directed = []
    for cell_s, k in zip(pdf["cell_id_s"].tolist(), pdf["k"].tolist()):
        cell = Cell(CID(int(cell_s) + (1 << 63)))
        directed.append((cell.get_vertex(k), cell.get_vertex(k + 1)))
    if not directed:
        return Polygon([])
    loops = _assemble_loops(directed)
    return Polygon([Loop(v) for v in loops])
