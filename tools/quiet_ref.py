#!/usr/bin/env python3
"""Regenerate bench_quiet_ref.json from a full-run BENCH_DETAIL.json.

The committed per-gate quiet steady references anchor Bench's round-12
per-gate degradation channel: a heavy gate measuring >1.5x its reference
gets an end-of-suite quiet retry and, failing that, ships stamped
`gate_degraded`.

Selection is per WINDOW, not per run: a gate contributes a reference
only from iterations whose calibration brackets both read <= 1.10
(Calibration.RunDegradedRatio — the settle bar, stricter than the 1.25
trip) — i.e. windows the probe itself called genuinely quiet. On the
shared VM the host oscillates (one 31-min round-12 run sampled p10 1.03
/ p90 1.26), so requiring a whole quiet RUN would starve the reference;
requiring quiet WINDOWS takes exactly the measurements that are
trustworthy and skips the rest. Gates the sampling regime never probes
(every iteration < 1.5 s) take their steady directly — they sit below
every stamp/retry threshold, so their reference is informational.

    python3 tools/quiet_ref.py BENCH_DETAIL.json [bench_quiet_ref.json] \
        > bench_quiet_ref.json.new

With the optional second arg, keeps the per-gate MIN of old and new
(quiet anchors ratchet down across runs; regenerate without the merge
arg after a gate's code genuinely changes).
"""
import json
import sys

QUIET_BAR = 1.10


def main() -> None:
    detail = json.load(open(sys.argv[1]))
    iters = detail["iter_times"]
    pre = detail["cal_pre"]
    post = detail["cal_post"]
    steady = detail["steady"]
    out = {}
    skipped = []
    for name, times in iters.items():
        if steady.get(name, -1) < 0:
            continue  # failed gate
        cp = pre.get(name, [])
        cq = post.get(name, [])
        quiet = [t for j, t in enumerate(times)
                 if j < len(cp) and 0 <= cp[j] <= QUIET_BAR
                 and j < len(cq) and 0 <= cq[j] <= QUIET_BAR]
        if quiet:
            out[name] = min(quiet)
        elif all(t < 1.5 for t in times[1:]) or steady[name] < 1.5:
            out[name] = steady[name]  # never probe-sampled: sub-threshold
        else:
            skipped.append(name)
    if len(sys.argv) > 2:
        old = json.load(open(sys.argv[2]))
        merged = dict(old)
        for name, t in out.items():
            merged[name] = min(t, old.get(name, t))
        out = merged
    if skipped:
        print(f"skipped (no quiet-window evidence): {sorted(skipped)}",
              file=sys.stderr)
    json.dump({k: round(v, 3) for k, v in sorted(out.items())},
              sys.stdout, indent=0, separators=(",", ": "))
    print()


if __name__ == "__main__":
    main()
