#!/usr/bin/env python3
"""Subset variant of check.py for the optimization loop: run graft.Verify
for a comma-separated list of queries only, then oracle-compare just those.
Usage: python3 tools/check_subset.py <q1,q2,...> [sfDir] [outDir]
"""
import json, subprocess, sys, hashlib
from pathlib import Path

import duckdb
import pandas as pd

ONLY = sys.argv[1]
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_verify_sub")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if pd.api.types.is_scalar(v) and pd.isna(v):
        return "NULL"
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)


def digest(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main():
    rc = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT} {ONLY}'],
        capture_output=True, text=True)
    if rc.returncode != 0:
        print(rc.stdout[-3000:], rc.stderr[-2000:])
        sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    wanted = set(ONLY.split(","))
    results = {}
    for name in sorted(p.name for p in OUT.iterdir()
                       if p.is_dir() and p.name in wanted):
        spark_df = canon(pd.read_parquet(OUT / name))
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            duck_df = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            results[name] = (f"SCHEMA-MISMATCH spark={list(spark_df.columns)} "
                             f"duck={list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            results[name] = f"ROWS-MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
        elif digest(spark_df) != digest(duck_df):
            diff = (spark_df.astype(str) != duck_df.astype(str))
            bad = diff.any(axis=1)
            results[name] = (f"HASH-MISMATCH first-diff:\n"
                             f"spark:\n{spark_df[bad].head(3)}\n"
                             f"duck:\n{duck_df[bad].head(3)}")
        else:
            results[name] = f"OK rows={len(spark_df)}"
    ok = sum(1 for v in results.values() if v.startswith(("OK", "NO-ORACLE")))
    for k, v in results.items():
        print(f"{k}: {v}")
    print(f"== {ok}/{len(results)} pass")
    sys.exit(0 if ok == len(results) and results else 2)


if __name__ == "__main__":
    main()
