#!/usr/bin/env python3
"""Adjudicate a red (or suspicious) bench run from its recorded artifact.

Usage: adjudicate_bench.py [BENCH_LAST.json] [--rerun] [--runs N]

Reads the bench artifact (default ./BENCH_LAST.json), prints the
adjudication table the r13-r16 verdicts produced by hand:

  * the flagged queries (pass-1 alarms), each with baseline, measured
    median, threshold, ratio, and its START OFFSET correlated against
    the host probes (cpu kernel seconds, fsync'd write MB/s) recorded
    at run start/end — the drift signature is a write probe that
    collapses between the brackets while flagged queries cluster in
    one part of the run;
  * the second-chance pass (if the gate ran one): per-query pass-1 vs
    pass-2 medians, which alarms cleared and which double-failed, with
    the pass-2 probe bracket.

With --rerun it then re-measures ONLY the flagged queries in a fresh
quiet-window JVM (SPARK_GRAFT_BENCH_ONLY via sbt, gate off so the
subset run cannot itself red) and prints the side-by-side: a query at
<= ~1.3x of baseline in the controlled re-run is the environmental
class (r13-r16: four driver reds, all of them); a query slow in BOTH
is a real regression — fix it or re-baseline deliberately with a
BENCH_NOTES entry.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_artifact(path: str) -> dict:
    with open(path) as f:
        s = f.read()
    return json.loads(s[s.index("{"):])


def fmt(x, nd=2):
    if x is None:
        return "-"
    return f"{x:.{nd}f}"


def probe_line(tag: str, p: dict) -> str:
    if not p:
        return f"  {tag}: (no probes recorded)"
    return (f"  {tag}: cpu {fmt(p.get('cpu_sec_start'), 3)} -> {fmt(p.get('cpu_sec_end'), 3)} s"
            f" | write {fmt(p.get('io_write_mbps_start'), 0)} -> {fmt(p.get('io_write_mbps_end'), 0)} MB/s"
            f" | read {fmt(p.get('io_read_mbps_start'), 0)} -> {fmt(p.get('io_read_mbps_end'), 0)} MB/s")


def print_table(rows, header):
    widths = [max(len(str(r[i])) for r in [header] + rows) for i in range(len(header))]
    for r in [header, ["-" * w for w in widths]] + rows:
        print("  " + "  ".join(str(c).ljust(w) for c, w in zip(r, widths)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact", nargs="?", default=os.path.join(REPO, "BENCH_LAST.json"))
    ap.add_argument("--rerun", action="store_true",
                    help="re-measure flagged queries in a fresh JVM and compare")
    ap.add_argument("--runs", type=int, default=3, help="runs per query for --rerun")
    args = ap.parse_args()

    art = load_artifact(args.artifact)
    pass1 = art.get("pass1_regressions", art.get("regressions", {}))
    confirmed = art.get("regressions", {})
    sc = art.get("second_chance") or {}
    offsets = art.get("start_offsets", {})

    print(f"artifact: {args.artifact}")
    print(f"sf: {art.get('sf')}  gate: {art.get('gate')}  failed: {art.get('failed')}")
    print(f"machine_scale raw/applied: {art.get('machine_scale_raw')}/{art.get('machine_scale')}"
          f"  io_scale raw/applied: {art.get('io_scale_raw')}/{art.get('io_scale')}")
    print(probe_line("main-loop probes", art.get("probes", {})))
    if not pass1:
        print("\nno pass-1 alarms — nothing to adjudicate.")
        return 0

    print(f"\npass-1 alarms ({len(pass1)}):")
    rows = []
    for q in sorted(pass1):
        a = pass1[q]
        p2 = (sc.get("medians") or {}).get(q)
        verdict = ("CONFIRMED" if q in confirmed
                   else "cleared" if q in (sc.get("cleared") or []) else "?")
        rows.append([q, fmt(a.get("base")), fmt(a.get("median")),
                     fmt(a.get("threshold")), fmt(a.get("ratio")),
                     fmt(offsets.get(q)), fmt(p2), verdict])
    print_table(rows, ["query", "base*scale", "pass1", "threshold", "ratio",
                       "offset_s", "pass2", "verdict"])
    if sc.get("ran"):
        print(f"\nsecond chance ran at tail: cleared {len(sc.get('cleared') or [])}, "
              f"confirmed {len(sc.get('confirmed') or [])}")
        print(probe_line("pass-2 probes", sc.get("probes") or {}))
    else:
        print("\nsecond chance did not run (gate off / disabled / no alarms at gate time).")

    if not args.rerun:
        if confirmed:
            print("\nnext: controlled re-run of the confirmed set -> "
                  f"{sys.argv[0]} {args.artifact} --rerun")
        return 0

    # ---- controlled fresh-JVM re-measurement of the flagged set ----
    names = sorted(pass1)
    print(f"\nre-measuring {len(names)} flagged queries in a fresh JVM "
          f"({args.runs} runs/query, gate off)...")
    out_path = os.path.join(tempfile.mkdtemp(prefix="adjudicate_"), "BENCH_LAST.json")
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=art.get("sf", "/root/testdata/sf0.1"),
               SPARK_GRAFT_BENCH_ONLY=",".join(names),
               SPARK_GRAFT_BENCH_RUNS=str(args.runs),
               SPARK_GRAFT_BENCH_GATE="0",
               SPARK_GRAFT_BENCH_LAST=out_path)
    proc = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                          cwd=REPO, env=env, capture_output=True, text=True)
    if not os.path.isfile(out_path):
        print("re-run produced no artifact; sbt tail:", file=sys.stderr)
        print("\n".join(proc.stdout.splitlines()[-20:]), file=sys.stderr)
        return 1
    fresh = load_artifact(out_path)
    print(probe_line("re-run probes", fresh.get("probes", {})))

    with open(os.path.join(REPO, "BENCH_BASELINE.json")) as f:
        baseline = json.load(f).get("medians", {})
    rows, env_class, real = [], [], []
    for q in names:
        m = fresh.get("queries", {}).get(q)
        b = baseline.get(q)
        ratio = (m / b) if (m and b) else None
        verdict = "-"
        if ratio is not None:
            # <=1.3x of baseline on a controlled run: the environmental
            # class (every r13-r16 adjudication); past the gate's 1.5x
            # trip level in BOTH windows: treat as real
            verdict = ("environmental" if ratio <= 1.3
                       else "REAL?" if ratio > 1.5 else "borderline")
            (env_class if ratio <= 1.3 else real).append(q)
        rows.append([q, fmt(b), fmt(pass1[q].get("median")), fmt(m),
                     fmt(ratio), verdict])
    print("\nside-by-side (controlled re-run vs recorded baseline):")
    print_table(rows, ["query", "baseline", "flagged_run", "rerun", "rerun_ratio", "verdict"])
    print(f"\nsummary: {len(env_class)} environmental, "
          f"{len(real)} needing investigation, "
          f"{len(names) - len(env_class) - len(real)} borderline")
    if real:
        print("investigate (slow in BOTH windows): " + ", ".join(sorted(real)))
        print("fix the regression, or re-baseline DELIBERATELY "
              "(fresh two-JVM record + a numbered BENCH_NOTES entry).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
