"""Deterministic sampling for training-data curation.

Web-scale pipelines need samplers that are (a) reproducible across
reruns and engines, (b) stable under repartitioning, and (c) exact —
a row's fate depends only on its key, never on partition layout or RNG
state.  Both samplers hash the key with md5 and threshold the first 8
hex digits (a uniform 32-bit integer), so DuckDB recomputes the exact
same sample — the hard-oracle property every operator here carries.

- `deterministic_sample`: keep rows where u32(md5(key)) < p·2³².
- `stratified_sample`: per-stratum rates (e.g. per-language quotas to
  rebalance a corpus), same keyed-hash mechanism with the stratum mixed
  into the hash so strata are independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

U32 = 1 << 32


def _u32(col) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keyed uniform sample: keep iff u32(md5(key)) < fraction·2³²."""
    threshold = int(fraction * U32)
    return df.filter(_u32(F.col(key)) < F.lit(threshold))


def stratified_sample(
    df: DataFrame, key: str, stratum: str, fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum keyed sampling (e.g. {'en': 0.1, 'de': 0.5}): row kept
    iff u32(md5(stratum || '|' || key)) < fraction[stratum]·2³²."""
    h = _u32(F.concat(F.col(stratum).cast("string"), F.lit("|"), F.col(key).cast("string")))
    thr = F.lit(int(default_fraction * U32))
    for s, frac in sorted(fractions.items()):
        thr = F.when(F.col(stratum) == s, F.lit(int(frac * U32))).otherwise(thr)
    return df.filter(h < thr)
