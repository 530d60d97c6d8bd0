#!/usr/bin/env python3
"""Compare a graft.Bench JSON line against the committed per-query baseline.

Usage: python3 tools/bench_check.py <file-with-bench-json-line> [ratio]

Flags queries slower than ratio x baseline (default 1.5), failures (-1),
and prints new/removed queries. Exit 1 on any regression or failure.
Baseline: BENCH_BASELINE.json (round-1 driver numbers; update it when a
round's bench is accepted as the new reference).
"""
import json
import os
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    # Shared gate constants (tools/bench_thresholds.json) — the same file
    # graft.Bench reads for its adjudication trigger, so a reading that
    # would fail here is guaranteed to have been re-timed there first.
    try:
        thr = json.load(open(os.path.join(os.path.dirname(__file__),
                                          "bench_thresholds.json")))
        def_ratio, floor = float(thr["ratio"]), float(thr["floor_sec"])
    except (OSError, ValueError, KeyError):
        def_ratio, floor = 1.5, 0.5
    ratio = float(sys.argv[2]) if len(sys.argv) > 2 else def_ratio
    # A -1 failure sentinel in the baseline is "no baseline", not a bar to
    # clear: comparing against it would flag every passing run forever.
    base = {k: v for k, v in
            json.load(open("BENCH_BASELINE.json"))["queries"].items() if v >= 0}
    line = next((l for l in open(sys.argv[1]) if '"metric":"total"' in l), None)
    if line is None:
        print(f"no bench total line found in {sys.argv[1]}", file=sys.stderr)
        return 2
    cur = json.loads(line[line.index("{"):])
    # The stdout line keeps only the slowest queries (driver tail-buffer
    # budget); full per-query times live in the detail file it names.
    detail = cur.get("detail")
    if detail:
        try:
            det = json.load(open(detail))
            # The detail path is cwd-relative and a committed copy from a
            # previous round may sit there: only trust it if its total
            # matches the stdout line of THIS run (same fmt, so equal
            # strings up to the 3-decimal rounding both sides use).
            if abs(det.get("value", -1) - cur["value"]) < 0.0015:
                cur = det
            else:
                print(f"warn: {detail} total {det.get('value')} != run total "
                      f"{cur['value']} (stale file?); "
                      "checking the compact line only", file=sys.stderr)
        except (OSError, ValueError):
            print(f"warn: detail file {detail} unreadable/corrupt; "
                  "checking the compact line only", file=sys.stderr)
    rc = 0
    # The driver measures at sf0.1; a recording made at any other SF is
    # not comparable to the baseline (this exact mistake shipped once: an
    # sf0.001 smoke run overwrote BENCH_DETAIL.json before a commit).
    sf = cur.get("sf", "")
    # Exact basename match: substring matching would let sf0.15 or
    # sf0.1-variant recordings pass as gradeable.
    if sf and os.path.basename(sf.rstrip("/")) != "sf0.1":
        print(f"FAIL: recording is from {sf}, not sf0.1 — not a gradeable run")
        rc = 1
    for name, t in sorted(cur["queries"].items()):
        if t < 0:
            print(f"FAIL {name}: bench recorded failure sentinel -1")
            rc = 1
        elif name not in base:
            print(f"new  {name}: {t:.2f}s (no baseline)")
        elif t > base[name] * ratio and t - base[name] > floor:
            print(f"REGR {name}: {t:.2f}s vs baseline {base[name]:.2f}s "
                  f"({t / base[name]:.1f}x)")
            rc = 1
        elif t < base[name] / ratio and base[name] - t > floor:
            print(f"win  {name}: {t:.2f}s vs baseline {base[name]:.2f}s")
    for name in sorted(set(base) - set(cur["queries"])):
        print(f"gone {name}: in baseline but not in this run")
        rc = 1
    tb = sum(v for v in base.values() if v >= 0)
    print(f"total {cur['value']:.1f}s vs baseline {tb:.1f}s")
    return rc


if __name__ == "__main__":
    sys.exit(main())
