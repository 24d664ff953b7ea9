#!/usr/bin/env python3
"""Calib-normalized bench comparison (r12 verdict #2): compare two
bench_full.json artifacts with host drift divided out, so round-over-
round deltas read off the artifacts alone — no old-tree control-run
ritual.

Each artifact carries `calib_sec`, the wall time of a fixed
single-threaded 300M-step fmix64 chain on the host that ran the bench.
A query's normalized time is `wall / calib_sec` (calibration units):
a host that runs the chain 15% slower runs CPU-bound query work ~15%
slower too, so dividing by calib cancels the drift and what remains is
code-attributable (plus residual noise — I/O-bound queries track calib
less tightly than CPU-bound ones; judge with the noise band in mind).

Usage: calib_compare.py OLD.json NEW.json [threshold]
Prints total and per-query normalized ratios, flagging |ratio-1| >
threshold (default 0.30), largest regressions first.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.readline())
    if not d.get("calib_sec") or d["calib_sec"] <= 0:
        sys.exit(f"{path}: no calib_sec — artifact predates r12; "
                 "a control run is required for this comparison")
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.30
    co, cn = old["calib_sec"], new["calib_sec"]
    print(f"calib_sec: old={co:.3f} new={cn:.3f} "
          f"(host speed ratio {cn / co:.3f} — drift divided out below)")
    for d, tag in ((old, "old"), (new, "new")):
        s, e = d.get("calib_sec_start"), d.get("calib_sec_end")
        if s and e and max(s, e) / min(s, e) > 1.25:
            print(f"  WARNING: {tag} calib windows disagree "
                  f"(start {s:.3f}, end {e:.3f}) — the host was "
                  "intermittently contended during that bench; treat "
                  "per-query ratios as noisy")
    qo, qn = old["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    only_old = set(qo) - set(qn)
    only_new = set(qn) - set(qo)
    if only_old:
        print(f"retired gates ({len(only_old)}): {sorted(only_old)}")
    if only_new:
        print(f"new gates ({len(only_new)}): {sorted(only_new)}")
    tot_o = sum(qo[q] for q in shared) / co
    tot_n = sum(qn[q] for q in shared) / cn
    print(f"total over {len(shared)} shared gates (normalized): "
          f"{tot_o:.1f} -> {tot_n:.1f} calib-units "
          f"(ratio {tot_n / tot_o:.3f})")
    rows = []
    for q in shared:
        no, nn = qo[q] / co, qn[q] / cn
        # ignore sub-noise gates: a 0.2s query's ratio is all jitter
        if max(qo[q], qn[q]) >= 0.5:
            rows.append((nn / no if no > 0 else float("inf"), q, qo[q],
                         qn[q], no, nn))
    rows.sort(reverse=True)
    flagged = [r for r in rows if abs(r[0] - 1) > thr]
    print(f"flagged (|normalized ratio - 1| > {thr:.2f}, wall >= 0.5s): "
          f"{len(flagged)}")
    for ratio, q, wo, wn, no, nn in flagged:
        print(f"  {q:28s} wall {wo:7.2f} -> {wn:7.2f}  "
              f"normalized {no:6.2f} -> {nn:6.2f}  ratio {ratio:5.2f}")
    med = sorted(r[0] for r in rows)[len(rows) // 2] if rows else 1.0
    print(f"median normalized per-query ratio: {med:.3f}")


if __name__ == "__main__":
    main()
