import duckdb, json, glob, os, sys
sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
out = os.environ.get("GRAFT_VERIFY_OUT", "/tmp/verify_out")
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
only = set(sys.argv[1:])
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        d = con.execute(sql).fetch_arrow_table()
        s = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetch_arrow_table()
        dcols, scols = sorted(d.column_names), sorted(s.column_names)
        if dcols != scols:
            bad.append((name, f"cols duck={dcols} spark={scols}")); continue
        if d.num_rows != s.num_rows:
            bad.append((name, f"rows duck={d.num_rows} spark={s.num_rows}")); continue
        import pandas as pd
        dd = d.to_pandas()[dcols].sort_values(dcols).reset_index(drop=True)
        ss = s.to_pandas()[dcols].sort_values(dcols).reset_index(drop=True)
        neq = 0
        for c in dcols:
            a, b = dd[c], ss[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                m = ~((a == b) | (a.isna() & b.isna()))
            else:
                m = ~((a.astype(object) == b.astype(object)) | (a.isna() & b.isna()))
            if m.any():
                neq += int(m.sum())
                i = m.idxmax()
                bad.append((name, f"col {c}: {int(m.sum())} diffs, e.g. duck={a[i]!r} spark={b[i]!r} (dtypes {a.dtype}/{b.dtype})"))
                break
        if neq == 0: ok.append(name)
    except Exception as e:
        bad.append((name, "ERR " + str(e).split(chr(10))[0][:300]))
print(f"OK {len(ok)}: {' '.join(ok)}")
print(f"BAD {len(bad)}:")
for n, msg in bad: print(" ", n, "--", msg)
