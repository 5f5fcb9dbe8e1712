"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() in DuckDB at sf0.01, compare row
count, schema (column names sorted), and a value hash of the
column-name-sorted, row-sorted result.

Usage: python scripts/check_oracles.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _hash_pdf(pdf) -> str:
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)].copy()
    # canonicalize: stringify every value the same way
    rows = []
    for tup in pdf.itertuples(index=False):
        rows.append("|".join(_canon(v) for v in tup))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _canon(v) -> str:
    import datetime

    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        if v != v:
            return "NaN"
        return repr(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def main() -> int:
    import duckdb

    import __spark_entry__ as E
    from s2geometry_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = E.queries()
    oracles = E.oracle_sql()
    n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as ex:
            print(f"{name}: SPARK ERROR {ex}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"{name}: no_oracle ({len(spdf)} rows, {time.perf_counter()-t0:.1f}s)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"{name}: ORACLE ERROR {ex}")
            n_bad += 1
            continue
        rows_ok = len(spdf) == len(opdf)
        schema_ok = sorted(spdf.columns) == sorted(opdf.columns)
        hash_ok = schema_ok and _hash_pdf(spdf) == _hash_pdf(opdf)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "MISMATCH"
        print(
            f"{name}: {status} rows={len(spdf)}/{len(opdf)} schema={schema_ok}"
            f" hash={hash_ok} ({time.perf_counter()-t0:.1f}s)"
        )
        if status != "OK":
            n_bad += 1
            if not schema_ok:
                print(f"  spark cols:  {sorted(spdf.columns)}")
                print(f"  oracle cols: {sorted(opdf.columns)}")
            elif rows_ok:
                # show first differing rows
                a = spdf[sorted(spdf.columns)].astype(str).apply("|".join, axis=1).sort_values().tolist()
                b = opdf[sorted(opdf.columns)].astype(str).apply("|".join, axis=1).sort_values().tolist()
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                for x, y in diffs:
                    print(f"  spark:  {x}\n  oracle: {y}")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
