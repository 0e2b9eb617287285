#!/usr/bin/env python3
"""Merge N idle same-code bench captures into envelope floors (r15
verdict #2): BENCH_CLEAN.json's per-query wall/utime/stime/majflt
floors become the per-query MIN over all captures, so single-capture
luck stops showing up as spurious drift pairs in later rounds'
adjudications. Provenance records the capture count and the suite-total
spread; the adjudication thresholds in Bench.scala are unchanged.

Usage: floors.py BENCH_CLEAN.json capture1.json capture2.json ...

Each capture is a full-suite BENCH_SELF.json (same sf, same gate set —
a capture with a different query set fails loudly). Writes the merged
file to the first argument. Provenance commit/date come from git/now.
"""
import datetime
import json
import subprocess
import sys


def main() -> None:
    out_path, caps = sys.argv[1], sys.argv[2:]
    assert len(caps) >= 3, "envelope floors need >= 3 captures"
    captures = [json.load(open(p)) for p in caps]
    names = set(captures[0]["queries"])
    for i, c in enumerate(captures[1:], 2):
        assert set(c["queries"]) == names, f"capture {i} has a different gate set"
        assert c["sf"] == captures[0]["sf"], f"capture {i} ran at a different sf"
        assert "only" not in c and "inject" not in c, f"capture {i} is a probe/injected run"

    def per_query_min(field, valid=lambda v: v >= 0):
        merged = {}
        for q in sorted(names):
            vals = [c[field][q] for c in captures if valid(c[field][q])]
            merged[q] = min(vals) if vals else -1
        return merged

    queries = per_query_min("queries")
    # per-query ENVELOPE (max - min across captures): the gate's own
    # idle-machine variance, used by Bench's per-gate rung as a noise
    # bar — a gate with 3x intrinsic spread (e.g. a sub-second decode
    # gate whose stime swings with page-cache state) must not read as
    # "drifted" on every typical run just because its floor is the MIN
    qspread = {}
    for q in sorted(names):
        vals = [c["queries"][q] for c in captures if c["queries"][q] >= 0]
        qspread[q] = round(max(vals) - min(vals), 3) if vals else -1
    totals = [sum(v for v in c["queries"].values() if v >= 0) for c in captures]
    spread = max(totals) - min(totals)
    ext = [c.get("ext_total", -1) for c in captures]
    mf = [c.get("majflt_total", -1) for c in captures]

    out = {
        "_provenance": {
            "commit": subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True
            ).stdout.strip() or "unknown",
            "captured": datetime.date.today().isoformat(),
            "captures": len(captures),
            "capture_totals_sec": [round(t, 1) for t in totals],
            "spread_sec": round(spread, 1),
            "machine_state": (
                f"idle x{len(captures)} (ext_totals {ext} cpu-s, majflt {mf}); "
                f"floors = per-query MIN over the captures (envelope floors, r16)"
            ),
            "refresh_rule": (
                "refresh ONLY when query plans change (new/edited gates) or the "
                "instrumentation gains channels; re-capture >= 3 idle runs and "
                "re-merge with tools/floors.py - a drifted BENCH_r{N} adjudicates "
                "itself against these floors (suite rung + per-gate rung)"
            ),
        },
        "metric": "total",
        "value": round(sum(v for v in queries.values() if v >= 0), 3),
        "unit": "sec",
        "runs": captures[0].get("runs"),
        "queries": queries,
        "query_spread": qspread,
        "query_utime": per_query_min("query_utime"),
        "query_stime": per_query_min("query_stime"),
        "query_majflt": per_query_min("query_majflt"),
        "sf": captures[0]["sf"],
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}: {len(names)} gates, total {out['value']}s, "
          f"{len(captures)} captures, spread {spread:.1f}s")


if __name__ == "__main__":
    main()
