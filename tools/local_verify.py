#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/local_verify.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<query>/ parquet dirs and <outDir>/oracle_sql.json. Registers the
sfDir parquet tables as DuckDB views, runs each oracle, and compares against
the Spark result: column names (sorted), row count, and a hash of the
row-sorted, column-name-sorted values.
"""
import json, sys, glob, math

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracles = json.load(open(f"{out}/oracle_sql.json"))


def canon(df):
    """DataFrame -> (sorted col names, nrows, canonical sorted row strings)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(repr(round(v, 9)))
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return cols, len(rows), rows


fails, passes, rows_only = [], [], []
for name in sorted(glob.glob(f"{out}/*/")):
    q = name.rstrip("/").split("/")[-1]
    spark_df = con.sql(f"SELECT * FROM '{name}*.parquet'").df()
    if q not in oracles:
        rows_only.append((q, len(spark_df)))
        continue
    try:
        oracle_df = con.sql(oracles[q]).df()
    except Exception as e:
        fails.append((q, f"oracle SQL error: {e}"))
        continue
    sc, sn, sr = canon(spark_df)
    oc, on, orr = canon(oracle_df)
    if sc != oc:
        fails.append((q, f"schema mismatch: spark={sc} oracle={oc}"))
    elif sn != on:
        fails.append((q, f"rowcount mismatch: spark={sn} oracle={on}"))
    elif sr != orr:
        bad = next(i for i in range(sn) if sr[i] != orr[i])
        fails.append((q, f"value mismatch at sorted row {bad}:\n"
                         f"  spark:  {sr[bad][:300]}\n"
                         f"  oracle: {orr[bad][:300]}"))
    else:
        passes.append((q, sn))

for q, n in passes:
    print(f"PASS {q} ({n} rows)")
for q, n in rows_only:
    print(f"ROWS-ONLY {q} ({n} rows)")
for q, msg in fails:
    print(f"FAIL {q}: {msg}")
print(f"\n{len(passes)} pass, {len(rows_only)} rows-only, {len(fails)} fail")
sys.exit(1 if fails else 0)
