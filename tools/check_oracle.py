#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet, run oracle_sql.json in DuckDB over the same sf tables, compare
rows / schema / values (columns sorted by name)."""
import duckdb, json, sys, glob, os

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

ok = fail = 0
for name in sorted(oracle):
    spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_glob:
        print(f"MISSING  {name}: no spark output"); fail += 1; continue
    try:
        files = ", ".join(f"'{p}'" for p in sorted(spark_glob))
        sdf = con.execute(f"SELECT * FROM read_parquet([{files}])").fetchdf()
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        print(f"SCHEMA   {name}: spark={list(sdf.columns)} oracle={list(odf.columns)}"); fail += 1; continue
    if len(sdf) != len(odf):
        print(f"ROWS     {name}: spark={len(sdf)} oracle={len(odf)}"); fail += 1; continue
    import pandas as pd
    s_rows = [tuple(str(x) for x in r) for r in sdf.itertuples(index=False)]
    o_rows = [tuple(str(x) for x in r) for r in odf.itertuples(index=False)]
    if s_rows != o_rows:
        diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
        print(f"VALUES   {name}: first diffs {diff}"); fail += 1; continue
    print(f"OK       {name} ({len(sdf)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
