#!/usr/bin/env python3
"""Oracle BUDGET gate: every SparkEntry.oracleSql entry must complete in
DuckDB within a per-query timeout, or the round's correctness harness is
at risk (round 10 lost its entire official correctness signal because ONE
oracle — t_trigram_lm's five-way join — never completed in DuckDB).

Run this before declaring any new gate:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"   # or any
    python3 tools/check_oracles.py /root/testdata/sf0.01 /tmp/verify_out

Each oracle runs in its OWN subprocess (a runaway query is killed at the
timeout instead of taking the harness down with it — the r10 failure was
exactly an un-killable in-process query at 55 GB RSS). Exit code 1 if any
oracle times out, errors, or the whole suite exceeds the suite budget.
"""
import sys, os, json, time, subprocess

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
PER_QUERY_TIMEOUT = float(os.environ.get("ORACLE_TIMEOUT", "30"))
SUITE_BUDGET = float(os.environ.get("ORACLE_SUITE_BUDGET", "60"))

WORKER = r'''
import sys, os, json, time, duckdb
sfdir, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
con.execute("SET memory_limit='8GB'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
t0 = time.time()          # query time only — process startup isn't the
n = len(con.execute(sql).fetchall())  # oracle's cost in the driver's harness
print(json.dumps({"rows": n, "secs": time.time() - t0}))
'''

def main():
    with open(f"{OUTDIR}/oracle_sql.json") as f:
        oracle = json.load(f)
    results, failed = [], []
    for name in sorted(oracle):
        try:
            p = subprocess.run(
                [sys.executable, "-c", WORKER, SFDIR],
                input=oracle[name], capture_output=True, text=True,
                timeout=PER_QUERY_TIMEOUT)
            if p.returncode != 0:
                err = (p.stderr or "").strip().splitlines()
                failed.append(name)
                print(f"FAIL {name}: {err[-1] if err else 'worker died'}")
            else:
                try:
                    # last stdout line only: a worker library may chat on
                    # stdout (duckdb progress, warnings) above the JSON
                    r = json.loads(p.stdout.strip().splitlines()[-1])
                    dt, rows = r["secs"], r["rows"]
                    results.append((dt, name))
                    print(f"ok   {name}: {dt:6.2f}s  {rows} rows")
                except (IndexError, KeyError, ValueError) as e:
                    # rc 0 but unparseable stdout: mark THIS oracle
                    # failed and keep going — one bad worker must never
                    # abort the suite (the r10 lesson)
                    failed.append(name)
                    print(f"FAIL {name}: unparseable worker output ({e})")
        except subprocess.TimeoutExpired:
            failed.append(name)
            print(f"FAIL {name}: exceeded {PER_QUERY_TIMEOUT}s timeout (killed)")
    total = sum(dt for dt, _ in results)
    print(f"\ntotal oracle time: {total:.1f}s over {len(results)} oracles"
          f" ({len(failed)} failed)")
    for dt, name in sorted(results, reverse=True)[:5]:
        print(f"  slowest: {name} {dt:.2f}s")
    if failed:
        print(f"BUDGET GATE: FAIL — {failed}")
        return 1
    if total > SUITE_BUDGET:
        print(f"BUDGET GATE: FAIL — suite {total:.1f}s > {SUITE_BUDGET}s")
        return 1
    print("BUDGET GATE: PASS")
    return 0

if __name__ == "__main__":
    sys.exit(main())
