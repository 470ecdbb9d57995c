#!/usr/bin/env python3
"""Merge >=2 independent fresh-JVM bench outputs into BENCH_BASELINE.json (v2).

Usage: record_baseline.py run1.json run2.json [...] > BENCH_BASELINE.json

Each input is the single JSON line graft.Bench prints. The recorded
baseline takes, per query, the element-wise MAX of the per-JVM medians
(one JVM's best window is systematically optimistic for the
slowest-warming queries — the round-12 driver red) and the element-wise
max-min SPREAD (the honest cross-JVM noise the gate widens tolerance
by). Queries missing a median in ANY run are dropped with a warning —
the gate must never inherit a baseline from a partially-failed run.

Re-baselining stays deliberate: run this only alongside a BENCH_NOTES
entry saying why (see BenchGate's scaladoc for the contract).
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    runs = []
    for path in sys.argv[1:]:
        with open(path) as f:
            s = f.read()
        # bench lines arrive wrapped by sbt ("[info] {...}"); parse from
        # the first brace so a raw or wrapped capture both work
        d = json.loads(s[s.index("{"):])
        if d.get("failed", 0):
            print(f"warning: {path} has {d['failed']} failed queries", file=sys.stderr)
        runs.append(d)
    sfs = {d.get("sf") for d in runs}
    if len(sfs) != 1:
        print(f"error: runs disagree on sf: {sfs}", file=sys.stderr)
        return 2
    names = set(runs[0]["queries"])
    for d in runs[1:]:
        names &= set(d["queries"])
    # a run captured under SPARK_GRAFT_BENCH_ONLY (or with a crashed
    # query) would silently shrink the intersection, leaving the dropped
    # queries permanently un-gated as "unbaselined" — make it loud
    union = set()
    for d in runs:
        union |= set(d["queries"])
    if union - names:
        print(
            "warning: per-run query sets DIFFER; excluded from the baseline "
            f"(present in some runs only): {sorted(union - names)} — if this "
            "is not deliberate, re-capture full-suite runs",
            file=sys.stderr,
        )
    medians, spread = {}, {}
    for q in sorted(names):
        vals = [d["queries"][q] for d in runs]
        if any(v is None for v in vals):
            print(f"warning: {q} missing a median in some run; dropped", file=sys.stderr)
            continue
        medians[q] = max(vals)
        spread[q] = max(vals) - min(vals)
    out = {
        "source": f"element-wise max of {len(runs)} independent fresh-JVM runs"
                  " (tools/record_baseline.py)",
        "sf": sfs.pop(),
        "recorded": None,  # caller stamps; Bench never reads it
        "note": "WARM per-query median seconds; medians = element-wise MAX of "
                ">=2 independent JVM runs, spread = their element-wise max-min "
                "(the gate widens tolerance by k*spread; see BenchGate). "
                "Re-baseline DELIBERATELY only: re-record from fresh runs and "
                "add a BENCH_NOTES entry saying why.",
        "total_sec": round(sum(medians.values()), 3),
        "medians": medians,
        "spread": spread,
    }
    json.dump(out, sys.stdout, indent=1)
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
