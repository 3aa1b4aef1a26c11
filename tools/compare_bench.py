#!/usr/bin/env python3
"""Artifact-relative perf gate: diff a fresh bench_out.json against the
COMMITTED artifact and fail on genuine engine regressions.

The committed artifact embeds the oracle pairing it was measured
against ("paired_oracle_total_sec"/"paired_oracle_queries", stamped by
tools/time_oracle.py), which is what makes co-tenancy inflation
distinguishable from regression: if a query's engine time grew but its
paired oracle time grew comparably in the same window, the host slowed
down, not the plan. A query is flagged only when its engine time grew
past the tolerance while its oracle side didn't.

Usage:
  python3 tools/compare_bench.py <fresh_bench.json> [committed.json]
      [--tol 0.30] [--min-sec 0.20]

With no committed path the baseline is read from git (HEAD:bench_out.json).
Exit 0 = no regressions; exit 1 = flagged queries (listed); exit 2 = usage
or missing pairing data on BOTH sides (the gate needs at least one).

Dev-only tool, mirrored after tools/time_oracle.py's pairing discipline:
never judge an unpaired ratio.
"""
import argparse
import json
import subprocess
import sys


def load_committed(path):
    if path is not None:
        with open(path) as f:
            return json.load(f), path
    out = subprocess.run(
        ["git", "show", "HEAD:bench_out.json"],
        capture_output=True, text=True)
    if out.returncode != 0:
        print("compare_bench: no committed bench_out.json at HEAD "
              "and no explicit baseline given", file=sys.stderr)
        sys.exit(2)
    return json.loads(out.stdout), "HEAD:bench_out.json"


def main(argv):
    p = argparse.ArgumentParser(
        description="Artifact-relative perf gate (see module docstring)")
    p.add_argument("fresh", help="fresh bench_out.json to judge")
    p.add_argument("committed", nargs="?", default=None,
                   help="baseline artifact (default: HEAD:bench_out.json)")
    p.add_argument("--tol", type=float, default=0.30,
                   help="engine growth tolerance (default 0.30 = +30%%)")
    p.add_argument("--min-sec", type=float, default=0.20, dest="min_sec",
                   help="ignore queries under this dispatch-noise floor")
    ns = p.parse_args(argv)
    tol, min_sec = ns.tol, ns.min_sec
    with open(ns.fresh) as f:
        fresh = json.load(f)
    committed, base_name = load_committed(ns.committed)

    fq, cq = fresh["queries"], committed["queries"]
    fo = fresh.get("paired_oracle_queries") or {}
    co = committed.get("paired_oracle_queries") or {}
    if not fo and not co:
        print("compare_bench: neither artifact embeds an oracle pairing — "
              "run tools/time_oracle.py <sf> <verifyDir> <bench.json> first; "
              "refusing to judge unpaired ratios", file=sys.stderr)
        return 2

    flagged, inflated, shared = [], [], sorted(set(fq) & set(cq))
    for q in shared:
        e_new, e_old = fq[q], cq[q]
        if max(e_new, e_old) < min_sec:
            continue
        growth = e_new / e_old - 1.0
        if growth <= tol:
            continue
        # engine grew past tolerance — consult the oracle pairing(s)
        o_new, o_old = fo.get(q), co.get(q)
        if o_new and o_old and max(o_new, o_old) >= 0.05:
            o_growth = o_new / o_old - 1.0
            if o_growth >= growth / 2:
                # the oracle slowed comparably in the same window: host
                # co-tenancy, not a plan regression
                inflated.append((q, growth, o_growth))
                continue
            flagged.append((q, e_old, e_new, growth,
                            f"oracle moved {o_growth:+.0%}"))
        else:
            # no per-query pairing on one side: judge against the totals'
            # relative movement as the coarse co-tenancy signal
            t_new = fresh.get("paired_oracle_total_sec")
            t_old = committed.get("paired_oracle_total_sec")
            if t_new and t_old and (t_new / t_old - 1.0) >= growth / 2:
                inflated.append((q, growth, t_new / t_old - 1.0))
                continue
            flagged.append((q, e_old, e_new, growth, "unpaired on one side"))

    missing = sorted(set(cq) - set(fq))
    total_new, total_old = fresh["value"], committed["value"]
    print(f"compare_bench: fresh {ns.fresh} ({total_new:.2f}s) vs "
          f"{base_name} ({total_old:.2f}s), {len(shared)} shared queries, "
          f"tol {tol:.0%}, floor {min_sec}s")
    if inflated:
        print(f"  co-tenancy-inflated (engine AND oracle grew): "
              f"{', '.join(q for q, _, _ in inflated)}")
    if missing:
        print(f"  MISSING from fresh run (dropped query?): {', '.join(missing)}")
    if flagged:
        print("  REGRESSIONS (engine grew, oracle side didn't):")
        for q, e_old, e_new, growth, why in flagged:
            print(f"    {q}: {e_old:.2f}s -> {e_new:.2f}s ({growth:+.0%}; {why})")
    if not flagged and not missing:
        print("  OK: no artifact-relative regressions")
    return 1 if (flagged or missing) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
