#!/usr/bin/env python3
"""Perf canary: compare a (subset) graft.Bench run against the BASELINE.md
pins with a GENEROUS tripwire (default 3x).

This is not the 2x certification rule — it is a pre-commit smoke check that
catches accidental plan regressions (an un-partitioned window reappearing,
a broadcast turning into a shuffle join, a filter no longer pushed down)
whose cost signature is a large multiple, while staying insensitive to the
+-2x scheduler/GC jitter sub-second entries show on a busy box.

Usage: python3 tools/perfcheck.py target/bench_partial.json BASELINE.md [factor]
Exit 0 = all benched entries within factor x their pin (or unpinned).
Exit 1 = a query failed (-1) or exceeded factor x pin.
"""
import json
import re
import sys


def load_pins(baseline_md: str) -> dict:
    src = open(baseline_md, encoding="utf-8").read()
    row = re.compile(r"\|\s*([A-Za-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|")
    # later tables re-pin earlier ones; keep the LAST occurrence, matching
    # Bench.scala's toMap (last wins on duplicate keys)
    return {m.group(1): float(m.group(2)) for m in row.finditer(src)}


def main() -> int:
    bench_json = sys.argv[1]
    baseline_md = sys.argv[2]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    bench = json.load(open(bench_json, encoding="utf-8"))
    queries = bench.get("queries", {})
    pins = load_pins(baseline_md)
    bad = []
    for name, sec in sorted(queries.items()):
        if name == "_store_build":
            continue
        if sec < 0:
            bad.append(f"{name}: FAILED (-1)")
            continue
        pin = pins.get(name)
        if pin is None:
            print(f"  (no pin) {name}: {sec:.2f}s")
            continue
        ratio = sec / pin
        status = "TRIP" if ratio > factor else "ok"
        print(f"  {status} {name}: {sec:.2f}s vs pin {pin:.2f}s = {ratio:.2f}x")
        if ratio > factor:
            bad.append(f"{name}: {sec:.2f}s = {ratio:.2f}x pin {pin:.2f}s (limit {factor}x)")
    if bad:
        print("== perf canary TRIPPED:")
        for b in bad:
            print("   " + b)
        return 1
    print(f"== perf canary clean ({len(queries)} entries, limit {factor}x pin)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
