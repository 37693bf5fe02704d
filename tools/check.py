#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential oracle.

Usage: python3 tools/check.py [sf_dir] [out_dir]
  1. expects `sbt "runMain graft.Verify <sf_dir> <out_dir>"` to have run
     (or runs it with --run)
  2. loads each <out_dir>/<name> parquet (Spark result)
  3. runs <out_dir>/oracle_sql.json[name] in DuckDB over the sf_dir tables
  4. compares: row count, column names, and values (sorted by all
     columns, columns sorted by name) — exact equality, no tolerance.
"""
import json, math, sys, subprocess
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            # dates / decimals → canonical str
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def cmp_frames(name, spark_df, duck_df):
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"]
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    a, b = norm(spark_df), norm(duck_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = 0
        for i, (x, y) in enumerate(zip(av, bv)):
            eq = (x == y) or (x is None and y is None)
            try:
                if not eq and isinstance(x, float) and isinstance(y, float):
                    eq = (math.isnan(x) and math.isnan(y)) or x == y
            except Exception:
                pass
            if not eq and pd.isna(x) and pd.isna(y):
                eq = True
            if not eq:
                bad += 1
                if bad <= 3:
                    problems.append(f"col {c} row {i}: spark={x!r} duck={y!r}")
        if bad > 3:
            problems.append(f"col {c}: {bad} mismatched values total")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = out_dir / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pq.read_table(str(pdir)).to_pandas()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark parquet: {e}")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = cmp_frames(name, spark_df, duck_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: ({len(spark_df)} rows)")
            for p in problems[:6]:
                print(f"   {p}")
        else:
            n_pass += 1
            print(f"ok   {name} ({len(spark_df)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
