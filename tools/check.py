#!/usr/bin/env python3
"""Local oracle check mimicking the driver's t2 gate.

Usage: python3 tools/check.py [sfdir] [outdir]
Runs DuckDB on oracle_sql.json queries against the sf tables, compares to
the parquet files Verify wrote: same schema (column names sorted), same
rows after canonicalization (sort by all columns, round floats).
"""
import json, sys, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    recs = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if isinstance(v, float):
                out.append(f"{v:.4f}" if not math.isnan(v) else "nan")
            elif v is None or (isinstance(v, float) and math.isnan(v)):
                out.append("NULL")
            else:
                out.append(str(v))
        recs.append("|".join(out))
    return cols, sorted(recs)

fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        exp = con.execute(sql).df()
        gc, gr = canon(got)
        ec, er = canon(exp)
        if gc != ec:
            fails.append(name)
            print(f"FAIL {name}: schema {gc} vs oracle {ec}")
        elif gr != er:
            fails.append(name)
            diff = [(a, b) for a, b in zip(gr, er) if a != b]
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows; first diffs:")
            for a, b in diff[:3]:
                print(f"   spark:  {a}\n   oracle: {b}")
            if len(gr) != len(er):
                only_g = set(gr) - set(er); only_e = set(er) - set(gr)
                for x in list(only_g)[:2]: print(f"   spark-only:  {x}")
                for x in list(only_e)[:2]: print(f"   oracle-only: {x}")
        else:
            print(f"OK   {name} ({len(gr)} rows)")
    except Exception as e:
        fails.append(name)
        print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
