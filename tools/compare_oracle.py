#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by `sbt "runMain
graft.Verify <sfDir> <verifyOutDir>"`), runs the matching oracle SQL from
<verifyOutDir>/oracle_sql.json in DuckDB over the same raw tables, sorts
columns by name, and compares values exactly (row order as emitted — every
query must carry its own canonical ORDER BY).

Dev-only tool: the library itself never depends on DuckDB/pandas.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name in sorted(oracle):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: schema {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} != {want.shape}")
            failures += 1
            continue
        def deep(rows):
            return [[list(v) if hasattr(v, "__len__") and not isinstance(v, str)
                     else v for v in row] for row in rows]
        gv, wv = deep(got.values.tolist()), deep(want.values.tolist())
        if gv != wv:
            bad = next(i for i, (a, b) in enumerate(zip(gv, wv)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  spark:  {gv[bad]}")
            print(f"  oracle: {wv[bad]}")
            failures += 1
            continue
        print(f"PASS {name}: {got.shape[0]} rows x {got.shape[1]} cols")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
