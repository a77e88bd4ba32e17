#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet + oracle_sql.json, run each oracle in DuckDB against the same
testdata parquet, compare sorted values. Usage:
    python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    got_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not got_files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = con.execute(
        f"SELECT * FROM read_parquet({got_files!r})").fetchdf()
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: cols {gc} vs {ec}"); fails += 1; continue
    g = got[gc].sort_values(gc, kind="mergesort").reset_index(drop=True)
    e = exp[ec].sort_values(ec, kind="mergesort").reset_index(drop=True)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    # dtype-kind compare: the driver hashes rendered values, so int 123
    # vs float 123.0 is a mismatch even when == says equal (DuckDB
    # widens sum/list_sum over BIGINT to HUGEINT -> float64 at fetch).
    # Int WIDTH (int32 vs int64) is tolerated, mirroring the driver.
    KIND = {"i": "int", "u": "int", "f": "float", "b": "bool",
            "O": "obj", "S": "obj", "U": "obj", "M": "ts", "m": "td"}
    dbad = []
    for c in gc:
        gk = KIND.get(g[c].dtype.kind, g[c].dtype.kind)
        ek = KIND.get(e[c].dtype.kind, e[c].dtype.kind)
        if gk != ek:
            dbad.append((c, str(g[c].dtype), str(e[c].dtype)))
    if dbad:
        print(f"FAIL {name}: dtype kind mismatch {dbad}"); fails += 1; continue
    wbad = [(c, str(g[c].dtype), str(e[c].dtype)) for c in gc
            if str(g[c].dtype) != str(e[c].dtype)]
    if wbad:  # same kind, different width — driver tolerates; surface it
        print(f"WARN {name}: dtype width differs {wbad}")
    # value compare, exact (driver hashes values)
    bad = []
    for c in gc:
        gv, ev = g[c], e[c]
        try:
            eq = (gv == ev) | (gv.isna() & ev.isna())
        except Exception:
            eq = gv.astype(str) == ev.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            bad.append((c, i, gv[i], ev[i]))
    if bad:
        print(f"FAIL {name}: {len(bad)} col diffs, first: {bad[0]}")
        fails += 1
    else:
        print(f"OK   {name} ({len(g)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
