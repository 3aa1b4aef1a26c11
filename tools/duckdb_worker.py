#!/usr/bin/env python3
"""Persistent DuckDB compare worker for the DifferentialProps fuzz suite.

Protocol: one JSON object per stdin line ->
    {"sql": "<oracle query>", "result": "<dir of engine parquet>"}
one JSON object per stdout line ->
    {"ok": true, "rows": N} | {"ok": false, "msg": "<first difference>"}

The comparison is byte-for-byte the same discipline as
tools/compare_oracle.py (the driver's correctness gate): sort columns by
name, compare shapes, then values exactly in emitted row order — every
generated query must carry its own canonical ORDER BY. The only addition
is canonicalizing NaN/NaT to None on BOTH sides: the fuzz generators
produce nullable aggregate outputs (sum over an empty window), and
pandas surfaces SQL NULL as float NaN, which would fail the exact
compare against itself (NaN != NaN).

Persistent (one process per suite run) because a fresh
python+duckdb+pandas import per ScalaCheck case would dominate the
suite's wall clock. Each request still gets a fresh in-memory
connection, so no state leaks between cases.

Dev-only tool: the library itself never depends on DuckDB/pandas.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd


def _canon_val(v):
    # recurse into list/array values so a NULL ELEMENT canonicalizes the
    # same way a top-level NaN/NaT does. DuckDB hands a NULL-bearing
    # list back as a numpy MaskedArray whose masked elements are 0-d
    # MaskedConstants (they HAVE __len__ but raise on iteration), so
    # masked values resolve to None before the generic branches.
    if v is np.ma.masked:
        return None
    if isinstance(v, np.ma.MaskedArray):
        return [_canon_val(e) for e in v.tolist()]
    if isinstance(v, dict):
        return {k: _canon_val(e) for k, e in v.items()}
    if hasattr(v, "__len__") and not isinstance(v, str):
        return [_canon_val(e) for e in v]
    if v is not None and pd.isna(v):
        return None
    return v


def canon(rows):
    return [[_canon_val(v) for v in row] for row in rows]


def handle(req):
    con = duckdb.connect()
    try:
        want = con.execute(req["sql"]).fetchdf()
        got = con.execute(
            "SELECT * FROM read_parquet('{}/*.parquet')".format(req["result"])
        ).fetchdf()
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            return {"ok": False,
                    "msg": f"schema {list(got.columns)} != {list(want.columns)}"}
        if got.shape != want.shape:
            return {"ok": False, "msg": f"shape {got.shape} != {want.shape}"}
        gv = canon(got.values.tolist())
        wv = canon(want.values.tolist())
        if gv != wv:
            bad = next(i for i, (a, b) in enumerate(zip(gv, wv)) if a != b)
            return {"ok": False,
                    "msg": f"row {bad}: engine={gv[bad]} oracle={wv[bad]}"}
        return {"ok": True, "rows": int(got.shape[0])}
    finally:
        con.close()


def main():
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            resp = handle(json.loads(line))
        except Exception as e:  # report, never die mid-suite
            resp = {"ok": False, "msg": f"worker error: {e}"}
        sys.stdout.write(json.dumps(resp) + "\n")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
