#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet directory produced by `graft.Verify`, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sf_dir
parquet tables, sorts columns by name + rows by all columns, and compares
values. Reports per-query OK/MISMATCH with a diff sample.

Driver-side-only deps (duckdb/pandas) — never imported by the Scala build.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def canon_dtype(dt) -> str:
    """Canonical dtype name, matching the driver's dtype-sensitive hash.

    The driver hashes the canonicalized pandas frame INCLUDING dtypes, so
    int32 vs int64 vs float64 is a hash mismatch even with equal values
    (the exact bug class that produced 22 red rows in round 1).
    """
    s = str(dt)
    # pandas nullable aliases -> numpy names
    return {"Int64": "int64", "Int32": "int32", "Float64": "float64",
            "boolean": "bool"}.get(s, s)


def values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b or str(a) == str(b)


def main() -> int:
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_ok = n_bad = n_noracle = 0
    for res_dir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = res_dir.name
        try:
            got = canon(pd.read_parquet(res_dir))
        except Exception as e:
            print(f"FAIL  {name}: cannot read result parquet: {e}")
            n_bad += 1
            continue
        if name not in oracle:
            print(f"ROWS  {name}: no oracle, rows={len(got)} (rows-only check)")
            n_noracle += 1
            continue
        try:
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns differ: spark={list(got.columns)} oracle={list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: row counts differ: spark={len(got)} oracle={len(want)}")
            n_bad += 1
            continue
        dtype_diffs = [
            (c, canon_dtype(got[c].dtype), canon_dtype(want[c].dtype))
            for c in got.columns
            if canon_dtype(got[c].dtype) != canon_dtype(want[c].dtype)]
        if dtype_diffs:
            c, a, b = dtype_diffs[0]
            print(f"FAIL  {name}: {len(dtype_diffs)} dtype diffs; first: "
                  f"col={c} spark={a} oracle={b}")
            n_bad += 1
            continue
        diffs = []
        for i in range(len(got)):
            for c in got.columns:
                a, b = got.iloc[i][c], want.iloc[i][c]
                if not values_equal(a, b):
                    diffs.append((i, c, a, b))
        if diffs:
            print(f"FAIL  {name}: {len(diffs)} value diffs; first: row={diffs[0][0]} "
                  f"col={diffs[0][1]} spark={diffs[0][2]!r} oracle={diffs[0][3]!r}")
            n_bad += 1
        else:
            print(f"OK    {name}: rows={len(got)}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {n_noracle} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
