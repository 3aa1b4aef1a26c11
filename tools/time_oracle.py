#!/usr/bin/env python3
"""Paired DuckDB timing for the bench gate: runs every oracle SQL from a
Verify dump's oracle_sql.json over the given sf dir, per-query min over
three interleaved passes (the same estimator graft.Bench uses), and
prints one JSON line {"total": s, "queries": {...}}.

Dev-only tool (the library never depends on DuckDB).
Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir> [benchOutJson]

With the optional third argument, the oracle total+queries are ALSO
stamped into that bench_out.json ("paired_oracle_total_sec",
"paired_oracle_queries") so the committed artifact records which oracle
pairing it was measured against — co-tenancy inflation vs regression is
then decidable from the artifact alone, no cross-referencing prose.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    names = sorted(oracle)
    # Warm pass: buffer cache + JIT only. DuckDB has NO cross-statement
    # plan cache — every timed execute below re-parses and re-plans its
    # SQL. graft.Bench mirrors this by keeping Spark's per-pass plan
    # derivation inside its timed region, so both sides time
    # plan + execute symmetrically.
    for n in names:
        try:
            con.execute(oracle[n]).fetchall()
        except Exception:
            pass
    passes = []
    for _ in range(3):
        t = {}
        for n in names:
            t0 = time.perf_counter()
            try:
                con.execute(oracle[n]).fetchall()
            except Exception:
                pass
            t[n] = time.perf_counter() - t0
        passes.append(t)
    best = {n: min(p[n] for p in passes) for n in names}
    total = sum(best.values())
    print(json.dumps({"total": total, "queries": best}))
    if len(sys.argv) > 3:
        with open(sys.argv[3]) as f:
            bench = json.load(f)
        bench["paired_oracle_total_sec"] = total
        bench["paired_oracle_queries"] = best
        with open(sys.argv[3], "w") as f:
            json.dump(bench, f)
        print(f"stamped paired oracle total {total:.2f}s into {sys.argv[3]}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
