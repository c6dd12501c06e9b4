#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the sf_dir
parquet tables, and compares: column names (sorted), dtypes, row count,
and exact values after sorting columns by name and rows by all columns.

This is intentionally STRICTER than any plausible driver compare —
exact value equality — so passing here means passing the driver.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def main() -> int:
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = out_dir / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        got = canon(con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df())
        want = canon(con.execute(oracle[name]).df())
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(
                f"columns spark={list(got.columns)} oracle={list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows spark={len(got)} oracle={len(want)}")
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                if str(a.dtype) != str(b.dtype):
                    problems.append(
                        f"dtype[{c}] spark={a.dtype} oracle={b.dtype}")
                eq = (a.astype(str) == b.astype(str))
                if not eq.all():
                    i = int(eq.idxmin())
                    problems.append(
                        f"value[{c}] row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r} "
                        f"({int((~eq).sum())} diffs)")
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems[:4]))
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
