#!/usr/bin/env python3
"""Calibration-corrected bench comparison (r16 verdict next #6).

Compares two bench artifacts (the ``bench_out.json`` shape graft.Bench
writes: per-query min-of-N seconds plus the two in-band calibration
probes) and emits ratios pre-normalized by BOTH probes, so the movers
table no longer needs the manual box-drift analysis that r13-r16 each
repeated in prose:

  * q1-cal  — scan-bound probe (q1_pricing_summary standalone): divides
    out I/O-side box drift.
  * cpu-cal — compute-bound probe (scan-free LCG fold): divides out
    compute throttling, which q1 does not track.

A query only counts as a mover when it is slow under the FRIENDLIER of
the two calibrations (min of the corrected ratios) — a box that is
merely throttled shows raw elevation but calibrated parity, exactly the
r16 signature (driver box: raw 1.15x, cpu-cal 0.93x).

Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [--floor 0.3]
                                 [--threshold 1.4] [--json]

OLD/NEW may be a path, or ``git:REV`` to read bench_out.json from a
commit (e.g. ``git:8ab17fe``).
"""
import argparse
import json
import subprocess
import sys


def load(spec: str) -> dict:
    if spec.startswith("git:"):
        raw = subprocess.run(
            ["git", "show", f"{spec[4:]}:bench_out.json"],
            capture_output=True, text=True, check=True).stdout
        return json.loads(raw)
    with open(spec) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="ignore queries under this many seconds in BOTH runs")
    ap.add_argument("--threshold", type=float, default=1.4,
                    help="calibrated ratio above which a query is a mover")
    ap.add_argument("--json", action="store_true",
                    help="emit one machine-readable JSON line instead of a table")
    a = ap.parse_args()

    old, new = load(a.old), load(a.new)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    if not common:
        print("no common queries", file=sys.stderr)
        return 2

    # a zero-time artifact entry (a probe or query rounded to 0.0)
    # would otherwise divide by zero when only the other side clears
    # the floor — clamp every denominator to a nanosecond
    def safe(x):
        return max(x, 1e-9)

    q1 = new["calibration_q1_sec"] / safe(old["calibration_q1_sec"])
    # the cpu probe landed in r16 — older artifacts fall back to q1
    if "calibration_cpu_sec" in old and "calibration_cpu_sec" in new:
        cpu = new["calibration_cpu_sec"] / safe(old["calibration_cpu_sec"])
    else:
        print("warn: cpu calibration missing in an artifact; "
              "falling back to q1", file=sys.stderr)
        cpu = q1
    q1, cpu = safe(q1), safe(cpu)
    tot_old = sum(oq[q] for q in common)
    tot_new = sum(nq[q] for q in common)
    raw_total = tot_new / safe(tot_old)

    movers = []
    for q in common:
        if oq[q] < a.floor and nq[q] < a.floor:
            continue
        raw = nq[q] / safe(oq[q])
        cal = min(raw / q1, raw / cpu)  # friendlier calibration
        if cal >= a.threshold:
            movers.append({"query": q, "old_sec": round(oq[q], 3),
                           "new_sec": round(nq[q], 3),
                           "raw": round(raw, 3),
                           "q1_cal": round(raw / q1, 3),
                           "cpu_cal": round(raw / cpu, 3),
                           "min_cal": round(cal, 3)})
    movers.sort(key=lambda m: -m["min_cal"])

    summary = {
        "common_queries": len(common),
        "total_old_sec": round(tot_old, 1),
        "total_new_sec": round(tot_new, 1),
        "raw_ratio": round(raw_total, 3),
        "q1_cal_factor": round(q1, 3),
        "cpu_cal_factor": round(cpu, 3),
        "q1_cal_ratio": round(raw_total / q1, 3),
        "cpu_cal_ratio": round(raw_total / cpu, 3),
        "movers": movers,
    }
    if a.json:
        print(json.dumps(summary))
        return 0

    print(f"common queries : {len(common)}")
    print(f"total          : {tot_old:.1f}s -> {tot_new:.1f}s "
          f"(raw {raw_total:.3f}x)")
    print(f"calibration    : q1 {q1:.3f}x, cpu {cpu:.3f}x "
          f"(new box vs old box)")
    print(f"cal-corrected  : q1-cal {raw_total / q1:.3f}x, "
          f"cpu-cal {raw_total / cpu:.3f}x")
    if movers:
        print(f"\nmovers (min-cal >= {a.threshold}x, floor {a.floor}s):")
        print(f"{'query':<32} {'old':>7} {'new':>7} {'raw':>6} "
              f"{'q1cal':>6} {'cpucal':>6}")
        for m in movers:
            print(f"{m['query']:<32} {m['old_sec']:>7.3f} {m['new_sec']:>7.3f} "
                  f"{m['raw']:>6.2f} {m['q1_cal']:>6.2f} {m['cpu_cal']:>6.2f}")
    else:
        print(f"\nno movers above {a.threshold}x calibrated "
              f"(floor {a.floor}s) — parity within box drift")
    return 0


if __name__ == "__main__":
    sys.exit(main())
