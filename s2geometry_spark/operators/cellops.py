"""Cell-id hierarchy query family over synthetic cells derived from the
TPC-H-ish tables — every query here has an *independent* DuckDB oracle
(plain int64 bit formulas), cross-validating the JVM column algebra in
functions/columns.py against a second implementation.

Synthetic valid level-12 cell id (biased storage form) from a key k:
    face  = k % 6
    pos24 = (k * 2654435761) % 2^24          (Knuth multiplicative hash)
    cell_id_s = (face-4)·2^61 + pos24·2^37 + 2^36
(the -4 term folds in the 2^63 bias; lsb of a level-12 cell is 2^36).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import columns as CC

KNUTH = 2654435761


def synth_cell_expr(key_col) -> F.Column:
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    face = key % 6
    pos24 = (key * F.lit(KNUTH)) % F.lit(1 << 24)
    return (
        (face - 4) * F.lit(1 << 61) + pos24 * F.lit(1 << 37) + F.lit(1 << 36)
    ).cast("long")


def synth_cell_sql(key_expr: str) -> str:
    """The same construction in DuckDB SQL."""
    return (
        f"((({key_expr}) % 6 - 4) * (1::BIGINT << 61)"
        f" + (({key_expr}) * {KNUTH}) % (1::BIGINT << 24) * (1::BIGINT << 37)"
        f" + (1::BIGINT << 36))"
    )


def cell_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parent / range / level / face / token of synthetic cells — each
    computed by the engine's Column algebra; the oracle recomputes them
    with raw bit formulas."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = cust.select(
        F.col("c_custkey").alias("key"), synth_cell_expr("c_custkey").alias("cell_id_s")
    )
    return df.select(
        "key",
        "cell_id_s",
        CC.parent("cell_id_s", 5).alias("parent5_s"),
        CC.range_min(CC.parent("cell_id_s", 5)).alias("rmin5"),
        CC.range_max(CC.parent("cell_id_s", 5)).alias("rmax5"),
        CC.level("cell_id_s").alias("lvl"),
        CC.face("cell_id_s").alias("face"),
        CC.is_leaf("cell_id_s").cast("int").alias("leaf"),
        CC.is_valid("cell_id_s").cast("int").alias("valid"),
        CC.child_position("cell_id_s", 12).alias("pos12"),
        CC.token("cell_id_s").alias("token"),
    )


def cell_hierarchy_oracle() -> str:
    cell = synth_cell_sql("c_custkey")
    lsb5 = 1 << (2 * 25)  # level-5 lsb
    return f"""
    WITH base AS (
      SELECT c_custkey AS key, {cell} AS cell_id_s FROM customer
    )
    SELECT key, cell_id_s,
      (cell_id_s & -({lsb5}::BIGINT)) | {lsb5}::BIGINT AS parent5_s,
      ((cell_id_s & -({lsb5}::BIGINT)) | {lsb5}::BIGINT) - ({lsb5}::BIGINT - 1) AS rmin5,
      ((cell_id_s & -({lsb5}::BIGINT)) | {lsb5}::BIGINT) + ({lsb5}::BIGINT - 1) AS rmax5,
      CAST(30 - CAST(log2((cell_id_s & -cell_id_s)::DOUBLE) AS INT) // 2 AS INT) AS lvl,
      CAST((cell_id_s >> 61) + 4 AS INT) AS face,
      CASE WHEN (cell_id_s & 1) <> 0 THEN 1 ELSE 0 END AS leaf,
      CASE WHEN ((cell_id_s >> 61) + 4) < 6
                AND ((cell_id_s & -cell_id_s) & 1537228672809129301) <> 0
           THEN 1 ELSE 0 END AS valid,
      CAST((cell_id_s >> 37) & 3 AS INT) AS pos12,
      rtrim(lower(lpad(to_hex(xor(cell_id_s, (-9223372036854775808)::BIGINT)), 16, '0')), '0') AS token
    FROM base
    """


def cell_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-containment join: level-5 regions (from nation) ⊇ level-12
    cells (from customer) — the core spatial-join predicate as bit ops."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    pts = cust.select(synth_cell_expr("c_custkey").alias("cell_id_s"))
    regions = nation.select(
        F.col("n_nationkey").alias("region_key"),
        CC.parent(synth_cell_expr("n_nationkey"), 5).alias("region_cell_s"),
    ).distinct()
    joined = pts.join(
        F.broadcast(regions), CC.contains("region_cell_s", "cell_id_s"), "inner"
    )
    return (
        joined.groupBy("region_key")
        .agg(F.count("*").alias("n_contained"))
        .orderBy("region_key")
    )


def cell_containment_join_oracle() -> str:
    lsb5 = 1 << (2 * 25)
    cell_c = synth_cell_sql("c_custkey")
    cell_n = synth_cell_sql("n_nationkey")
    return f"""
    WITH pts AS (SELECT {cell_c} AS cell_id_s FROM customer),
    regions AS (
      SELECT DISTINCT n_nationkey AS region_key,
        ({cell_n} & -({lsb5}::BIGINT)) | {lsb5}::BIGINT AS region_cell_s
      FROM nation
    )
    SELECT region_key, count(*) AS n_contained
    FROM pts JOIN regions
      ON pts.cell_id_s >= regions.region_cell_s - ({lsb5}::BIGINT - 1)
     AND pts.cell_id_s <= regions.region_cell_s + ({lsb5}::BIGINT - 1)
    GROUP BY region_key ORDER BY region_key
    """


def cell_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell histogram at level 8 (groupBy parent) — partial+final agg."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = cust.select(synth_cell_expr("c_custkey").alias("cell_id_s"))
    return (
        df.groupBy(CC.parent("cell_id_s", 8).alias("cell8_s"))
        .agg(F.count("*").alias("n"))
        .orderBy("cell8_s")
    )


def cell_histogram_oracle() -> str:
    lsb8 = 1 << (2 * 22)
    cell = synth_cell_sql("c_custkey")
    return f"""
    SELECT (({cell}) & -({lsb8}::BIGINT)) | {lsb8}::BIGINT AS cell8_s,
           count(*) AS n
    FROM customer GROUP BY 1 ORDER BY 1
    """
