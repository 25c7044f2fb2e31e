#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against the Verify parquet
dumps (column names sorted, rows sorted, values stringified)."""
import duckdb, glob, json, math, os, sys

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/vout"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(cols), sorted(out)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = [d[0] for d in got_rel.description]
        got = canon(got_cols, got_rel.fetchall())
        exp_rel = con.sql(sql)
        exp_cols = [d[0] for d in exp_rel.description]
        exp = canon(exp_cols, exp_rel.fetchall())
        if got[0] != exp[0]:
            print(f"FAIL {name}: columns differ\n  spark={got[0]}\n  duck ={exp[0]}")
            fails += 1
        elif got[1] != exp[1]:
            diff_a = [r for r in got[1] if r not in set(exp[1])][:3]
            diff_b = [r for r in exp[1] if r not in set(got[1])][:3]
            print(f"FAIL {name}: rows differ (spark={len(got[1])}, duck={len(exp[1])})")
            print(f"  spark-only: {diff_a}\n  duck-only : {diff_b}")
            fails += 1
        else:
            print(f"OK   {name} ({len(got[1])} rows)")
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fails += 1
sys.exit(1 if fails else 0)
