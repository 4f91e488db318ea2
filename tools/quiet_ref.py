#!/usr/bin/env python3
"""Regenerate bench_quiet_ref.json from a QUIET full-run BENCH_DETAIL.json.

The committed per-gate quiet steady references anchor Bench's round-12
per-gate degradation channel: a heavy gate measuring >1.5x its reference
gets an end-of-suite quiet retry and, failing that, ships stamped
`gate_degraded`. Regenerate each round from the builder's quiet closing
run (run_degraded must be false) so the anchor tracks the current code:

    python3 tools/quiet_ref.py BENCH_DETAIL.json > bench_quiet_ref.json

Only certified, non-failed gates are written; an existing reference file
can be passed as a second arg to keep the per-gate MIN of old and new
(references are quiet anchors — they should only ratchet down, except
when a gate's code genuinely changed, in which case regenerate without
the merge arg).
"""
import json
import sys


def main() -> None:
    detail = json.load(open(sys.argv[1]))
    if detail.get("run_degraded"):
        print("refusing: source run is stamped run_degraded", file=sys.stderr)
        sys.exit(1)
    steady = detail["steady"]
    ok = {name: t for name, t in steady.items() if t >= 0}
    if len(sys.argv) > 2:
        old = json.load(open(sys.argv[2]))
        ok = {name: min(t, old.get(name, t)) for name, t in ok.items()}
    json.dump({k: round(v, 3) for k, v in sorted(ok.items())},
              sys.stdout, indent=0, separators=(",", ": "))
    print()


if __name__ == "__main__":
    main()
