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
    idle_quality = []  # per capture: (stamped_contended, ext cores avg)
    for i, c in enumerate(captures, 1):
        if i > 1:
            assert set(c["queries"]) == names, f"capture {i} has a different gate set"
            assert c["sf"] == captures[0]["sf"], f"capture {i} ran at a different sf"
        assert "only" not in c and "inject" not in c, f"capture {i} is a probe/injected run"
        # config-arm rejection (r19): an off-heap / tmpfs-local-dirs /
        # master-override capture measures a DIFFERENT deployment
        # bracket — its (often much lower) stime/wall would poison the
        # default-config floors the drift adjudication runs against
        for arm in ("offheap", "local_dirs", "master"):
            assert arm not in c, f"capture {i} is a config-arm run ({arm}={c[arm]!r})"
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
            # ADVICE r18 #2: a stamped capture with NO ext channel at all
            # (old-format artifact, blind meter) must not pass the ratio
            # re-adjudication vacuously — the stamp is then the only
            # signal and it says contended
            assert ext >= 0, (
                f"capture {i} stamped itself contended and carries no "
                f"ext_total — the 1.0-core re-adjudication cannot run; "
                f"the stamp stands, capture rejected")
        assert ext < 0 or ext <= 1.0 * wall, (
            f"capture {i} is contended: ext_total {ext:.1f} cpu-s over "
            f"{wall:.1f} s of measured wall (> 1.0 cores average)")
        idle_quality.append((c.get("contended") is True,
                             ext / wall if ext >= 0 and wall > 0 else -1.0))
    # ADVICE r18 #1: floors are per-query MINIMA, so they stay honest
    # only if at least ONE accepted capture is genuinely idle — neither
    # self-stamped contended nor above the old 0.5-core ambient bar. A
    # set where EVERY run carries 0.5-1.0 rival cores produces floors
    # inflated by the rival, which then mask single-gate regressions.
    # Warning, not fatal: on a host whose ambient harness footprint sits
    # at the stamp bar a legitimate refresh may need it — but it must be
    # LOOKED AT and explained in the round log next to the refresh.
    if not any(not stamped and 0 <= cores <= 0.5
               for stamped, cores in idle_quality):
        print("WARNING: no accepted capture is genuinely idle (unstamped AND "
              "<= 0.5 ext-cores): "
              + ", ".join(f"capture {i}: stamped={s} ext_cores={c:.2f}"
                          for i, (s, c) in enumerate(idle_quality, 1))
              + " — these floors ride on a loaded host; explain in the round log")

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
    # FS-state markers (r18 verdict #2): each capture stamps a cheap
    # scratch-FS probe (256 MiB write+fsync+unlink MB/s, free GB) taken
    # before its first measured window. The mm/stream gates' sys-time is
    # mostly local-dir file I/O, so floors captured on a degraded FS
    # (e.g. after 200 GB of scale-run churn) are inflated 30-45% with no
    # code change — the marker rides into provenance and a refresh whose
    # FS is materially slower than the previous capture's WARNS.
    fs_probe = [round(c["fs_probe_mb_s"], 1) for c in captures
                if c.get("fs_probe_mb_s", -1) >= 0]
    fs_free = [round(c["tmp_free_gb"], 1) for c in captures
               if c.get("tmp_free_gb", -1) >= 0]

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
            "fs_probe_mb_s": fs_probe if fs_probe else "absent (pre-r19 captures)",
            "tmp_free_gb": fs_free if fs_free else "absent (pre-r19 captures)",
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
    # FS-marker divergence vs the PREVIOUS committed floors: a refresh
    # on a scratch FS >= 1.5x slower (or faster) than the prior capture
    # set's is measuring a different filesystem state — its kernel-time
    # floors are not comparable and the round log must say which state
    # is the honest one (r18 baked a 45% slower-FS stime floor into
    # mm_curation_stream exactly this way)
    prev_fs = (prev or {}).get("_provenance", {}).get("fs_probe_mb_s")
    if fs_probe and isinstance(prev_fs, list) and prev_fs:
        old, new = max(prev_fs), max(fs_probe)
        if old > 0 and (new < old / 1.5 or new > old * 1.5):
            print(f"WARNING: scratch-FS probe moved {old:.0f} -> {new:.0f} MB/s "
                  f"({new / old:.2f}x) since the previous floors — the kernel-"
                  f"time floors are not comparable across this refresh")
    if fs_probe and max(fs_probe) / max(min(fs_probe), 1e-9) > 1.5:
        print(f"WARNING: scratch-FS probe varies {min(fs_probe):.0f}-"
              f"{max(fs_probe):.0f} MB/s WITHIN this capture set — the FS "
              f"state drifted mid-capture; the MIN floors mix FS regimes")
    if crept:
        print(f"FLOOR CREEP (> 1.3x, plan unchanged) on {len(crept)} gates —"
              " explain each before committing:")
        for q, old, new in crept:
            print(f"  {q}: {old:.3f} -> {new:.3f} ({new / old:.2f}x)")
    elif prev:
        print("floor-creep guard: no unchanged-plan gate rose > 1.3x")


if __name__ == "__main__":
    main()
