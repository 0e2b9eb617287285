#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]
  1. expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have run
  2. runs each oracle_sql.json entry in DuckDB over the sfdir tables
  3. compares row count, column names (sorted), and a value hash
"""
import sys, os, json, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

with open(f"{outdir}/oracle_sql.json") as f:
    oracle = json.load(f)

def canon(df):
    # sort columns by name, normalize values to strings
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{v:.6g}")
            elif isinstance(v, (bytes, bytearray)):
                vals.append(v.hex())
            else:
                vals.append(str(v))
        rows.append("\x01".join(vals))
    return rows

fails = 0
for name in sorted(oracle):
    spark_dir = f"{outdir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        sdf = con.execute(f"SELECT * FROM '{files[0]}'").fetchdf()
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    s, o = canon(sdf), canon(odf)
    if sorted(s) == sorted(o):
        ordered = "ordered" if s == o else "UNORDERED-ONLY"
        print(f"ok   {name}: {len(s)} rows ({ordered})")
    else:
        fails += 1
        print(f"FAIL {name}: spark {len(s)} rows vs oracle {len(o)} rows")
        sset, oset = set(s), set(o)
        for x in list(sset - oset)[:3]:
            print(f"   spark-only: {x!r}")
        for x in list(oset - sset)[:3]:
            print(f"   oracle-only: {x!r}")
        print(f"   spark cols: {sorted(sdf.columns)}")
        print(f"   oracle cols: {sorted(odf.columns)}")

extra = [k for k in glob.glob(f"{outdir}/*") if os.path.isdir(k)
         and os.path.basename(k) not in oracle]
if extra:
    print("rows-only (no oracle):", [os.path.basename(k) for k in extra])
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
