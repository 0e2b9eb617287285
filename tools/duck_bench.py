#!/usr/bin/env python3
"""Envelope floors for the DuckDB side of the binding perf ratio
(r16 verdict #2): the Spark suite has committed per-query floors with
provenance and a self-adjudication ladder, but the ratio's DENOMINATOR
— the DuckDB oracle-suite wall — had no floor protocol at all, and it
drifted ~1.5x between judge sessions (146.1 s in r15, 222.6-225.4 s
idle in r16, with a CONTENDED run beating the idle ones — the classic
host frequency/environment smell). This gives the baseline the same
discipline: N timed passes over the identical 131 oracles, per-oracle
MINIMA, committed provenance, refreshed under the same
plans-changed-only rule as BENCH_CLEAN.json.

Usage: duck_bench.py [sfdir] [oracle_sql.json|verify_outdir] [passes] [out.json]
  defaults: /root/testdata/sf0.1  /tmp/verify_out  3  BASELINE_DUCK.json

Each pass runs every oracle on a fresh connection (fetchdf() forces full
materialization — the same "hash the whole result" work check.py does,
minus the pandas canonicalization, which is harness, not query). Floors
are per-oracle MIN over all passes; pass totals and loadavg bracket the
machine state so a contended capture is visible in the artifact.
Do NOT run concurrently with a Spark job — the whole point is an idle
denominator.
"""
import datetime
import json
import os
import subprocess
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def loadavg1() -> float:
    try:
        return os.getloadavg()[0]
    except OSError:
        return -1.0


def main() -> None:
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    osrc = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else "BASELINE_DUCK.json"
    assert passes >= 3, "envelope floors need >= 3 passes"
    opath = osrc if osrc.endswith(".json") else f"{osrc}/oracle_sql.json"
    with open(opath) as f:
        oracle = json.load(f)

    floors: dict[str, float] = {}
    totals, loads = [], [loadavg1()]
    for p in range(passes):
        # fresh connection per pass: DuckDB result/metadata caches reset,
        # the OS page cache stays warm — same envelope semantics as the
        # Spark side's min-of-runs (pass 1 pays cache warmup, MIN sheds it)
        con = duckdb.connect()
        for t in TABLES:
            path = f"{sfdir}/{t}.parquet"
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        total = 0.0
        for name in sorted(oracle):
            t0 = time.monotonic()
            con.execute(oracle[name]).fetchdf()
            dt = time.monotonic() - t0
            total += dt
            floors[name] = min(floors.get(name, float("inf")), dt)
        con.close()
        totals.append(total)
        loads.append(loadavg1())
        print(f"pass {p + 1}/{passes}: {total:.1f} s, loadavg {loads[-1]:.1f}")

    out = {
        "_provenance": {
            "commit": subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True
            ).stdout.strip() or "unknown",
            "captured": datetime.date.today().isoformat(),
            "duckdb": duckdb.__version__,
            "passes": passes,
            "pass_totals_sec": [round(t, 1) for t in totals],
            "spread_sec": round(max(totals) - min(totals), 1),
            "loadavg_1min": [round(l, 1) for l in loads],
            "machine_state": (
                "idle passes on the judge/driver host; floors = per-oracle MIN "
                "over the passes (envelope floors — the BENCH_CLEAN.json "
                "protocol applied to the ratio's denominator, r17)"
            ),
            "refresh_rule": (
                "refresh ONLY when oracle SQL changes (new/edited gates) or "
                "DuckDB is upgraded; >= 3 idle passes, never concurrent with "
                "a Spark run. BASELINE.md's series records floor-vs-floor "
                "ratios against this file"
            ),
        },
        "metric": "total",
        "value": round(sum(floors.values()), 3),
        "unit": "sec",
        "oracles": {k: round(v, 3) for k, v in sorted(floors.items())},
        "sf": sfdir,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}: {len(floors)} oracles, floor total "
          f"{out['value']:.1f} s, pass spread {out['_provenance']['spread_sec']} s")


if __name__ == "__main__":
    main()
