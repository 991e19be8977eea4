#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (dev tool only; the
shipped Scala library does not depend on this).

Usage: python scripts/check.py <verify_out_dir> [sf_dir]

Reads each <out>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB with views
registered for the sf tables, and compares as sorted row multisets.
"""
import json, sys, glob, os
import duckdb

out = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
n_pass = n_fail = n_skip = 0
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"[FAIL] {name}: no parquet written")
        n_fail += 1
        continue
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    if name not in oracle:
        print(f"[skip] {name}: no oracle ({len(got)} rows)")
        n_skip += 1
        continue
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"[FAIL] {name}: oracle SQL error: {str(e)[:200]}")
        n_fail += 1
        continue
    gcols = sorted(got.columns); wcols = sorted(want.columns)
    if gcols != wcols:
        print(f"[FAIL] {name}: columns {gcols} vs {wcols}")
        n_fail += 1
        continue
    if len(got) != len(want):
        print(f"[FAIL] {name}: rows {len(got)} vs {len(want)}")
        n_fail += 1
        continue
    # stringify (arrays etc.) then sort and exact-compare
    g = got[gcols].astype(str).sort_values(gcols).reset_index(drop=True)
    w = want[wcols].astype(str).sort_values(wcols).reset_index(drop=True)
    gs, ws = g, w
    if gs.equals(ws):
        print(f"[ ok ] {name}: {len(g)} rows")
        n_pass += 1
    else:
        diff = (gs != ws).any(axis=1)
        idx = diff[diff].index[:3]
        print(f"[FAIL] {name}: value mismatch ({int(diff.sum())}/{len(g)} rows)")
        for i in idx:
            print(f"   got: {g.loc[i].to_dict()}")
            print(f"  want: {w.loc[i].to_dict()}")
        n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
sys.exit(1 if n_fail else 0)
