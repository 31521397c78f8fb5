#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet directory produced by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sf_dir
parquet tables, sorts columns by name, and value-compares. Exit 0 iff all
queries match. Driver-side-only tooling (duckdb/pandas), not part of the
shipped library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def dtype_class(dt) -> str:
    """Coarse dtype class mirroring the driver's typed hash: an int column
    and a float column must NOT compare equal even when values match
    (0 vs 0.0), which is exactly how oracle-typing bugs ship."""
    k = dt.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "other"


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> bool:
    s, o = norm(spark_df), norm(oracle_df)
    if list(s.columns) != list(o.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
        return False
    if len(s) != len(o):
        print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
        return False
    for col in s.columns:
        sc, oc = dtype_class(s[col].dtype), dtype_class(o[col].dtype)
        # a float column that is all-NaN-free integers is still float — strict.
        # Exception: an all-null oracle column materializes as object/float;
        # only enforce when both sides carry at least one non-null value.
        if sc != oc and s[col].notna().any() and o[col].notna().any():
            print(f"FAIL {name}: col={col} dtype spark={s[col].dtype}({sc}) "
                  f"oracle={o[col].dtype}({oc})")
            return False
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not values_equal(a, b):
                print(f"FAIL {name}: col={col} row={i} spark={a!r} oracle={b!r}")
                return False
    print(f"ok   {name}: {len(s)} rows x {len(s.columns)} cols")
    return True


def main() -> int:
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS FROM '{p}'")
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    failures, checked, rows_only = 0, 0, 0
    for d in sorted(out_dir.iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        spark_df = con.sql(f"FROM '{d}/*.parquet'").df()
        if name not in oracles:
            status = "rows-only" if len(spark_df) > 0 else "EMPTY"
            print(f"{'ok  ' if len(spark_df) > 0 else 'FAIL'} {name}: {status} ({len(spark_df)} rows)")
            rows_only += 1
            if len(spark_df) == 0:
                failures += 1
            continue
        checked += 1
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if not compare(name, spark_df, oracle_df):
            failures += 1
    declared = set(oracles)
    qj = out_dir / "queries.json"
    if qj.exists():
        declared |= set(json.loads(qj.read_text()))
    missing = declared - {d.name for d in out_dir.iterdir() if d.is_dir()}
    for m in sorted(missing):
        print(f"FAIL {m}: query declared but no spark output")
        failures += 1
    print(f"== {checked} oracle-checked, {rows_only} rows-only, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
