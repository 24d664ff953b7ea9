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
code-attributable (plus residual noise).

Secondary cpu_sec normalizer (r13 verdict #5): the wall normalizer
tracks CPU-bound gates tightly and I/O-bound gates loosely — a host
whose disks or scheduler were contended inflates wall while process
CPU stays flat. Both artifacts carry per-query `cpu_sec`, so every
wall-flagged gate is cross-checked against its calib-normalized CPU
ratio: a gate is FLAGGED only when wall and cpu breach the threshold
in the SAME direction (a code change does both; host contention moves
wall only, and async-thread accounting noise moves cpu only). Gates
whose wall breached but cpu stayed in band are printed in a demoted
"wall-only" list — visible, not silently dropped, because a genuine
pure-I/O code regression would land there too. Artifacts without
cpu_sec fall back to wall-only flagging.

Driver-bytes watch (r13 verdict #1): artifacts carry per-query
`driver_bytes` (summed task-result bytes — the channel every collect()
pays through, recorded by Bench's ResultBytesListener). A gate whose
bytes exceed the per-task-overhead floor AND grew past the growth
bound round-over-round has sprouted an unbounded driver collect; that
flags here, in the artifact diff, every round — the Scaling harness
keeps the orthogonal 10x-data-growth leg.

Usage: calib_compare.py OLD.json NEW.json [threshold]
Prints total and per-query normalized ratios; exits 0 always (a
reporting tool — the driver's gates do the failing).
"""
import json
import sys

DRIVER_BYTES_FLOOR = 64 << 20  # matches graft.tools.Scaling
DRIVER_BYTES_RATIO = 3.0


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
    cpuo, cpun = old.get("cpu_sec", {}), new.get("cpu_sec", {})
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
            cratio = None
            if cpuo.get(q, -1) > 0 and cpun.get(q, -1) > 0:
                cratio = (cpun[q] / cn) / (cpuo[q] / co)
            rows.append((nn / no if no > 0 else float("inf"), q, qo[q],
                         qn[q], no, nn, cratio))
    rows.sort(reverse=True)

    def breach(r):
        return abs(r - 1) > thr

    def same_dir(w, c):
        return (w > 1 and c > 1 + thr) or (w < 1 and c < 1 / (1 + thr))

    wall_flagged = [r for r in rows if breach(r[0])]
    confirmed = [r for r in wall_flagged
                 if r[6] is None or same_dir(r[0], r[6])]
    demoted = [r for r in wall_flagged if r not in confirmed]
    print(f"flagged (|normalized wall ratio - 1| > {thr:.2f}, wall >= "
          f"0.5s, cpu ratio breaches the SAME way): {len(confirmed)}")
    for ratio, q, wo, wn, no, nn, cr in confirmed:
        ctag = "no cpu_sec" if cr is None else f"cpu ratio {cr:5.2f}"
        print(f"  {q:28s} wall {wo:7.2f} -> {wn:7.2f}  "
              f"normalized {no:6.2f} -> {nn:6.2f}  ratio {ratio:5.2f}  "
              f"({ctag})")
    if demoted:
        print(f"wall-only deltas, cpu in band — host/IO noise unless a "
              f"pure-I/O code change is expected ({len(demoted)}):")
        for ratio, q, wo, wn, no, nn, cr in demoted:
            print(f"  {q:28s} wall ratio {ratio:5.2f}  "
                  f"cpu ratio {cr:5.2f}")
    med = sorted(r[0] for r in rows)[len(rows) // 2] if rows else 1.0
    print(f"median normalized per-query ratio: {med:.3f}")

    # ---- driver-collect watch over the artifact diff ----
    dbo, dbn = old.get("driver_bytes", {}), new.get("driver_bytes", {})
    if dbn and not dbo:
        top = sorted(((v, k) for k, v in dbn.items()), reverse=True)[:5]
        print("driver_bytes: new artifact only (baseline round); top 5: "
              + ", ".join(f"{k}={v / 1e6:.1f}MB" for v, k in top))
    elif dbn and dbo:
        grown = []
        for q in sorted(set(dbo) & set(dbn)):
            if dbn[q] > DRIVER_BYTES_FLOOR and dbo[q] > 0 and \
                    dbn[q] / dbo[q] > DRIVER_BYTES_RATIO:
                grown.append((q, dbo[q], dbn[q]))
        print(f"driver_bytes flagged (> {DRIVER_BYTES_FLOOR >> 20}MB and "
              f"grew > {DRIVER_BYTES_RATIO}x round-over-round — an "
              f"unbounded collect sprouted): {len(grown)}")
        for q, b0, b1 in grown:
            print(f"  {q:28s} {b0 / 1e6:8.1f}MB -> {b1 / 1e6:8.1f}MB  "
                  f"({b1 / b0:.1f}x)")
        mx = max(dbn.items(), key=lambda kv: kv[1]) if dbn else ("", 0)
        print(f"driver_bytes max (new): {mx[0]} {mx[1] / 1e6:.1f}MB")


if __name__ == "__main__":
    main()
