#!/usr/bin/env python3
"""Time the full DuckDB oracle suite — the per-round `duck_total` row.

Runs every statement in <outDir>/oracle_sql.json against the parquet
tables of <sfDir> (default: the sf0.1 testdata) on 32 threads,
N passes (default 3), and prints per-pass totals plus the min — the
number PERF.md records next to the Spark full-suite bench so the 2x
bar stays auditable without a judge re-run.

Usage: python3 tools/time_oracle.py [outDir] [sfDir] [passes]
"""
import duckdb, glob, json, os, sys, time

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf01"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
n_pass = int(sys.argv[3]) if len(sys.argv) > 3 else 3

sqls = json.load(open(os.path.join(out, "oracle_sql.json")))
con = duckdb.connect(config={"threads": 32})
for p in glob.glob(os.path.join(sf, "*.parquet")):
    t = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

totals = []
for it in range(n_pass):
    t0 = time.time()
    per = {}
    for name, sql in sorted(sqls.items()):
        q0 = time.time()
        con.execute(sql).fetchall()
        per[name] = time.time() - q0
    totals.append(time.time() - t0)
    top = sorted(per.items(), key=lambda kv: -kv[1])[:5]
    print(f"pass {it}: {totals[-1]:.2f}s  slowest: " +
          ", ".join(f"{k}={v:.2f}" for k, v in top))
print(f"duck_total({len(sqls)} queries, {n_pass} passes): "
      f"min={min(totals):.2f}s all={[round(x, 2) for x in totals]}")
