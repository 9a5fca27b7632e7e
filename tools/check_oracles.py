#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's
oracle_sql.json in DuckDB over the same parquet tables and compare against
the Spark-side dumps (columns sorted by name, full-value comparison).

Also cross-writes the per-query verdict into the CORRECTNESS.json that
graft.Verify produced (outDir copy AND repo-root copy): each query row gains
{"rows_match", "schema_match", "hash_match"} (hash_match = full normalized
row-multiset equality between the Spark dump and the DuckDB oracle, both
read through DuckDB so value canonicalization is identical on both sides).
Queries without an oracle keep null verdicts (rows-only check: rows > 0).
"""
import sys, json, glob, math, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

def load_correctness():
    p = f"{out_dir}/CORRECTNESS.json"
    try:
        with open(p) as f:
            return json.load(f), True
    except Exception:
        return {}, False

correctness, correctness_loaded = load_correctness()

def verdict(name, rows_match=None, schema_match=None, hash_match=None):
    row = correctness.setdefault(name, {})
    row["rows_match"] = rows_match
    row["schema_match"] = schema_match
    row["hash_match"] = hash_match

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
        verdict(name, False, False, False)
        fails += 1
        continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark output missing {e}")
        verdict(name, False, False, False)
        fails += 1
        continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {name}: schema {scols} != oracle {ocols}")
        verdict(name, len(odf) == len(sdf), False, False)
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
        verdict(name, len(no) == len(ns), True, False)
        fails += 1
    else:
        print(f"OK   {name}: {len(ns)} rows")
        verdict(name, True, True, True)

# rows-only check for queries without an oracle: result executed and rows > 0
for name, row in sorted(correctness.items()):
    if name in oracles:
        continue
    rows = row.get("rows")
    row["rows_match"] = None
    row["schema_match"] = None
    row["hash_match"] = None
    row["rows_nonzero"] = bool(rows) and rows > 0
    if not row["rows_nonzero"]:
        print(f"WARN {name}: no oracle and rows={rows}")

# Only touch the repo-root copy when Verify's own record was actually
# loaded from out_dir — a run against a wrong/stale out_dir must not
# clobber the committed record with verdict-only rows.
paths = [f"{out_dir}/CORRECTNESS.json"] + (["CORRECTNESS.json"] if correctness_loaded else [])
if not correctness_loaded:
    print(f"WARN: {out_dir}/CORRECTNESS.json missing — repo-root copy left untouched")
for path in paths:
    try:
        with open(path, "w") as f:
            json.dump(correctness, f, indent=1, sort_keys=True)
            f.write("\n")
    except Exception as e:
        print(f"WARN: cannot write {path}: {e}")

n_green = sum(1 for r in correctness.values() if r.get("hash_match"))
print(f"\n{len(oracles) - fails}/{len(oracles)} oracle queries match; "
      f"{len(glob.glob(out_dir + '/q*.parquet'))} queries total; "
      f"{n_green} all-green rows in CORRECTNESS.json")
sys.exit(1 if fails else 0)
