#!/usr/bin/env python3
"""Merge N idle same-code bench captures into envelope floors (r15
verdict #2): BENCH_CLEAN.json's per-query wall/utime/stime/majflt
floors become the per-query MIN over all captures, so single-capture
luck stops showing up as spurious drift pairs in later rounds'
adjudications. Provenance records the capture count and the suite-total
spread; the adjudication thresholds in Bench.scala are unchanged.

Usage: floors.py BENCH_CLEAN.json capture1.json capture2.json ...
         [--changed=gate1,gate2,...]

Each capture is a full-suite BENCH_SELF.json (same sf, same gate set —
a capture with a different query set fails loudly; a contended capture
is rejected the same way, see below). Writes the merged file to the
first argument. Provenance commit/date come from git/now.

--changed names the gates whose PLANS changed this round (new/edited
queries) — the floor-creep guard (r16 verdict #4) prints every gate
whose floor rose >1.3x vs the previous committed file while NOT in
that list: a refresh is exactly when a regression could re-baseline
itself invisibly, so unchanged-plan floor rises must be explained
before the new floors are committed.
"""
import datetime
import json
import subprocess
import sys


def main() -> None:
    # --changed only in the --changed=<non-empty list> form: a bare
    # `--changed` or space-separated `--changed gate1,gate2` would
    # otherwise be silently dropped from argv and the creep guard would
    # run with an EMPTY changed-set (or try to open the gate list as a
    # capture path) — reject loudly instead (ADVICE r17 #3)
    argv = [a for a in sys.argv[1:] if not a.startswith("--changed")]
    changed = set()
    for a in sys.argv[1:]:
        if a.startswith("--changed"):
            if not a.startswith("--changed="):
                sys.exit(f"usage: --changed=<gate1,gate2,...> (got '{a}'; "
                         "the space-separated form is not accepted)")
            changed = {g.strip() for g in a.split("=", 1)[1].split(",") if g.strip()}
            if not changed:
                sys.exit(f"usage: --changed=<gate1,gate2,...> (got '{a}' "
                         "with an empty gate list)")
    out_path, caps = argv[0], argv[1:]
    assert len(caps) >= 3, "envelope floors need >= 3 captures"
    # the previous committed floors, read BEFORE the overwrite — the
    # creep guard's baseline (absent on the first-ever merge)
    try:
        prev = json.load(open(out_path))
    except (FileNotFoundError, json.JSONDecodeError):
        prev = None
    captures = [json.load(open(p)) for p in caps]
    names = set(captures[0]["queries"])
    for i, c in enumerate(captures, 1):
        if i > 1:
            assert set(c["queries"]) == names, f"capture {i} has a different gate set"
            assert c["sf"] == captures[0]["sf"], f"capture {i} ran at a different sf"
        assert "only" not in c and "inject" not in c, f"capture {i} is a probe/injected run"
        # contention rejection (ADVICE r16 #4): one contended capture
        # inflates its per-query walls, widening query_spread and thus
        # the per-gate fl+2*spread noise bar in Bench — masking real
        # single-gate regressions. Floors demand idle captures: the
        # suite's own contended flag must be clean AND rival cpu must
        # average under ONE core across the measured windows. The bound
        # sits above the measured idle envelope (committed r16 envelope
        # captures ran 0.2-0.7 ext-cores on a nominally idle host — the
        # sbt parent JVM plus kernel housekeeping; ADVICE r17 #2: a 0.5
        # bound would reject the TOP of that measured-idle range) while
        # still rejecting a real rival workload (observed contention
        # runs 3-15 cores).
        # The suite's own contended flag is a REPORTING bar (0.5 cores,
        # matched windows — tuned so drift adjudication never
        # under-reports) and fires on the ambient harness footprint
        # alone at the top of the idle envelope (sbt parent JVM + the
        # session's monitor ran 0.5-0.55 cores on an otherwise idle r18
        # host). Acceptance therefore re-adjudicates a self-stamped
        # capture under the recalibrated 1.0-core bound — but ONLY when
        # the ext meter covered every query window (ext_unmeasured ==
        # 0): with blind windows, ext_total/wall is diluted by wall the
        # meter never saw, and a genuinely contended capture could
        # sneak under the bound — the exact matched-window check the
        # stamp encodes is then the only trustworthy signal, so the
        # stamp stays authoritative.
        wall = sum(v for v in c["queries"].values() if v >= 0)
        ext = c.get("ext_total", -1)
        unmeasured = c.get("ext_unmeasured", 0)
        if c.get("contended") is True:
            assert unmeasured == 0, (
                f"capture {i} stamped itself contended and {unmeasured} query "
                f"windows had no ext measurement — the ext_total/wall ratio is "
                f"diluted and cannot overrule the matched-window stamp")
        assert ext < 0 or ext <= 1.0 * wall, (
            f"capture {i} is contended: ext_total {ext:.1f} cpu-s over "
            f"{wall:.1f} s of measured wall (> 1.0 cores average)")

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
    # floor-creep guard (r16 verdict #4): a refresh is the one moment a
    # regression can silently re-baseline itself — diff the new floors
    # against the previous committed file and print every UNCHANGED-plan
    # gate whose floor rose >1.3x (plus a 0.2 s absolute guard against
    # sub-100-ms jitter). Informational, not fatal: a machine-wide shift
    # legitimately moves every floor — but it must be LOOKED AT, so the
    # table goes in the round log next to the refresh.
    crept = []
    if prev and isinstance(prev.get("queries"), dict):
        for q in sorted(names):
            old = prev["queries"].get(q, -1)
            new = queries[q]
            if (q not in changed and old is not None and old >= 0 and new >= 0
                    and new > 1.3 * old and new - old > 0.2):
                crept.append((q, old, new))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}: {len(names)} gates, total {out['value']}s, "
          f"{len(captures)} captures, spread {spread:.1f}s")
    if crept:
        print(f"FLOOR CREEP (> 1.3x, plan unchanged) on {len(crept)} gates —"
              " explain each before committing:")
        for q, old, new in crept:
            print(f"  {q}: {old:.3f} -> {new:.3f} ({new / old:.2f}x)")
    elif prev:
        print("floor-creep guard: no unchanged-plan gate rose > 1.3x")


if __name__ == "__main__":
    main()
