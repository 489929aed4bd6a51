#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare row-sets with the Spark parquet
dumps produced by graft.Verify. Usage: compare.py <sfDir> <verifyOut>"""
import json, sys, glob
import duckdb

sfdir, vout = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{vout}/oracle_sql.json"))
ok_n = bad_n = 0
for name in sorted(oracle):
    files = glob.glob(f"{vout}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name}"); bad_n += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{files[0]}'").df()
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); bad_n += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"SCHEMA   {name}: got {gcols} expected {ecols}"); bad_n += 1; continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"ROWS     {name}: got {len(g)} expected {len(e)}"); bad_n += 1; continue
    if not g.equals(e):
        diff = (g != e).any(axis=1)
        print(f"VALUES   {name}: {diff.sum()}/{len(g)} rows differ")
        print("  got:", g[diff].head(3).to_dict("records"))
        print("  exp:", e[diff].head(3).to_dict("records"))
        bad_n += 1; continue
    ok_n += 1
    print(f"OK       {name} ({len(g)} rows)")
rows_only = [d.split("/")[-1] for d in sorted(glob.glob(f"{vout}/*"))
             if "." not in d.split("/")[-1] and d.split("/")[-1] not in oracle]
print(f"\n{ok_n} ok, {bad_n} bad; rows-only (no oracle): {rows_only}")
