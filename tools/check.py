#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python tools/check.py <outDir> <sfDir>
  where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

Registers each testdata parquet as a DuckDB view named after the table, runs
every oracle_sql.json entry, and compares against the Spark-written parquet:
columns sorted by name, rows sorted by all columns, exact value compare
(with a tiny float tolerance report so near-misses are visible).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        return list(a) == list(b)
    return a == b


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got, want = canon(got), canon(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # The driver hashes TYPED values: int64 100 vs float64 100.0 is a
        # hash mismatch even though cells_equal says True. Surface it.
        dtype_warn = [c for c in got.columns
                      if got[c].dtype != want[c].dtype]
        if dtype_warn:
            pairs = {c: f"{got[c].dtype}!={want[c].dtype}" for c in dtype_warn}
            print(f"WARN {name}: dtype mismatch (driver hash will FAIL): {pairs}")
        bad = []
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(gv, wv)):
                if not cells_equal(x, y):
                    bad.append((c, i, x, y))
                    if len(bad) > 4:
                        break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ mismatched cells, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
