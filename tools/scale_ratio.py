#!/usr/bin/env python3
"""Compare a sf1 full-inventory bench run against a sf0.1 run and flag
queries whose wall-clock grew more than FLAG x the corpus growth factor
(the VERDICT r8 item-3 criterion: >2x expected linear scaling needs a
named justification).

Usage: python3 tools/scale_ratio.py BENCH_LOCAL_sf01.json BENCH_sf1.json [flag=2.0] [--force]

Era gate (VERDICT r14 item 6): this host shows bursty hypervisor CPU steal
(same bench 60s..359s in a day, zero code delta). Every bench JSON carries
`era_quality` — a fixed spin-calibration constant (graft.Era, million
xorshift steps/sec, min-of-samples => era floor). When both inputs carry it
and the constants diverge >ERA_MAX_RATIO, the runs happened in different
host eras and their wall-clocks are NOT comparable: this tool REFUSES
(exit 2) instead of printing misleading ratios. --force overrides for
forensics, loudly. Runs missing the field (pre-r15 receipts) compare with
a warning — the gate cannot retroactively validate history.

Notes on the yardstick: the corpus factor is 10x, but sub-linear ratios
are expected for queries dominated by fixed per-query overhead (driver
planning, codegen, small-dim scans) -- at sf0.1 most of the inventory
runs in 0.1-1 s where overhead IS the number. The flag threshold applies
to 10x-linear growth; queries under MIN_BASE seconds at sf0.1 are held to
an absolute ceiling instead (overhead-dominated timings scale noisily).
"""
import json, sys

MIN_BASE = 0.6      # below this, sf0.1 timing is overhead-dominated
ABS_CEIL = 12.0     # absolute sf1 ceiling for overhead-dominated queries
FACTOR = 10.0
ERA_MAX_RATIO = 1.3 # beyond this, the two runs are in different host eras

def era_gate(a, b, force):
    ea, eb = a.get("era_quality"), b.get("era_quality")
    if ea is None or eb is None:
        print("WARN: era_quality missing from "
              + ("both runs" if ea is None and eb is None
                 else "one run") + " — pre-r15 receipt, era unverifiable")
        return
    ratio = max(ea, eb) / min(ea, eb)
    print(f"era_quality: {ea:.1f} vs {eb:.1f} Msteps/s (ratio {ratio:.2f})")
    if ratio > ERA_MAX_RATIO:
        msg = (f"REFUSED: era constants diverge {ratio:.2f}x > {ERA_MAX_RATIO}x"
               " — different host eras, wall-clocks not comparable"
               " (re-take the slower-era run, or --force for forensics)")
        if force:
            print("FORCED past era gate:", msg)
        else:
            print(msg)
            sys.exit(2)

def main():
    force = "--force" in sys.argv
    argv = [x for x in sys.argv if x != "--force"]
    a = json.load(open(argv[1]))
    b = json.load(open(argv[2]))
    flag = float(argv[3]) if len(argv) > 3 else 2.0
    era_gate(a, b, force)
    qa, qb = a["queries"], b["queries"]
    rows = []
    # a query in the baseline but absent from the scale run never ran there
    # (crash/skip/rename) — that is a flag, not a silent omission
    for name in sorted(set(qa) - set(qb)):
        rows.append((name, qa[name], 0.0, None, "FLAG(missing-at-scale)"))
    for name, t1 in sorted(qb.items()):
        t0 = qa.get(name)
        if t0 is None:
            rows.append((name, None, t1, None, "NEW (no sf0.1 anchor)"))
            continue
        ratio = t1 / t0
        if t0 < MIN_BASE:
            status = "FLAG(abs)" if t1 > ABS_CEIL else "ok(overhead-base)"
        else:
            status = "FLAG" if ratio > flag * FACTOR else "ok"
        rows.append((name, t0, t1, ratio, status))
    flagged = [r for r in rows if r[4].startswith("FLAG") or r[4].startswith("NEW")]
    print(f"{'query':28s} {'sf0.1':>7s} {'sf1':>8s} {'ratio':>7s}  status")
    for name, t0, t1, ratio, status in rows:
        t0s = f"{t0:7.2f}" if t0 is not None else "      -"
        rs = f"{ratio:7.1f}" if ratio is not None else "      -"
        print(f"{name:28s} {t0s} {t1:8.2f} {rs}  {status}")
    print(f"\ntotal sf0.1={sum(qa.values()):.1f}s sf1={sum(qb.values()):.1f}s "
          f"flagged={len(flagged)}")
    for r in flagged:
        print("  *", r[0], r[4])

if __name__ == "__main__":
    main()
