#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's
oracle_sql.json in DuckDB over the same parquet tables and compare against
the Spark-side dumps (columns sorted by name, full-value comparison)."""
import sys, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = f.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fails += 1
        continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark output missing {e}")
        fails += 1
        continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {name}: schema {scols} != oracle {ocols}")
        fails += 1
        continue
    o = odf[ocols].values.tolist()
    s = sdf[scols].values.tolist()
    def norm(rows):
        out = []
        for r in rows:
            rr = []
            for v in r:
                if isinstance(v, float):
                    rr.append(round(v, 9))
                else:
                    rr.append(v)
            out.append(tuple(rr))
        return sorted(map(repr, out))
    no, ns = norm(o), norm(s)
    if no != ns:
        diff = [(a, b) for a, b in zip(no, ns) if a != b][:3]
        extra_o = len(no) - len(ns)
        print(f"FAIL {name}: rows oracle={len(no)} spark={len(ns)} "
              f"first diffs={diff} (len diff {extra_o})")
        fails += 1
    else:
        print(f"OK   {name}: {len(ns)} rows")
print(f"\n{len(oracles) - fails}/{len(oracles)} oracle queries match; "
      f"{len(glob.glob(out_dir + '/q*.parquet'))} queries total")
sys.exit(1 if fails else 0)
