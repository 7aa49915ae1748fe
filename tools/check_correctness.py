#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle gate.

Runs every ``queries()`` entry at sf0.01 (override with --sf-dir), runs the
matching ``oracle_sql()`` in DuckDB over the same parquet tables, and
compares row count, schema width, and an order-insensitive value hash
(columns sorted by name, rows sorted, exact cell equality after timestamp
normalization).

Usage:  python tools/check_correctness.py [--sf-dir DIR] [query ...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def schema_sig(df: pd.DataFrame) -> dict:
    """Driver-strict schema signature: tz-awareness of a timestamp column is
    part of the schema (the driver's gate failed `stream_sliding` on exactly
    a TIMESTAMPTZ-vs-TIMESTAMP oracle mismatch that the old normalize()
    silently stripped)."""
    sig = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            tz = getattr(s.dt, "tz", None)
            sig[c] = f"timestamp[tz={tz}]" if tz is not None else "timestamp"
        elif pd.api.types.is_float_dtype(s):
            sig[c] = "float"
        elif pd.api.types.is_integer_dtype(s):
            sig[c] = "int"
        elif pd.api.types.is_bool_dtype(s):
            sig[c] = "bool"
        else:
            sig[c] = "object"
    return sig


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for c in df.columns:
        h.update(c.encode())
        for v in df[c].tolist():
            h.update(repr(v).encode())
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from qafs_spark.session import get_spark

    spark = get_spark(app_name="correctness-check")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = args.names or sorted(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            spark_pd = sdf.toPandas()
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_pd)} rows, {len(spark_pd.columns)} cols "
                  f"({time.time()-t0:.1f}s) [no oracle]")
            n_rows_only += 1
            continue
        try:
            duck_pd = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: oracle SQL raised")
            traceback.print_exc()
            n_fail += 1
            continue
        sig_a, sig_b = schema_sig(spark_pd), schema_sig(duck_pd)
        a, b = normalize(spark_pd), normalize(duck_pd)
        problems = []
        if len(a) != len(b):
            problems.append(f"rows {len(a)} vs {len(b)}")
        if dict(sorted(sig_a.items())) != dict(sorted(sig_b.items())):
            problems.append(f"schema {sig_a} vs {sig_b}")
        if list(a.columns) != list(b.columns):
            problems.append(f"cols {list(a.columns)} vs {list(b.columns)}")
        elif value_hash(a) != value_hash(b):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            if not len(a) != len(b) and list(a.columns) == list(b.columns):
                diff = (a != b) & ~(a.isna() & b.isna())
                bad = diff.any(axis=1)
                print("  first diffs (spark vs duckdb):")
                print(pd.concat([a[bad].head(3), b[bad].head(3)], axis=0))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(a)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
          f"of {len(names)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
