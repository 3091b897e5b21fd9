#!/usr/bin/env python3
"""Assemble bench_sf1.json from the raw sfx1 Bench artifact plus the
current sf0.1 artifact (bench_out.json): per-query 10x ratios, totals,
and placeholders for the hand-written findings/config notes.

Dev tool only — the shipped library has no Python deps.

Usage: python3 tools/assemble_sf1.py bench_sf1_raw.json bench_out.json
Prints the vs_sf01 table to stdout; writes nothing (the committed
bench_sf1.json is hand-assembled so findings stay curated).
"""
import json
import sys


def main():
    raw = json.load(open(sys.argv[1]))
    sf01 = json.load(open(sys.argv[2])) if len(sys.argv) > 2 else {"queries": {}}
    q1, q0 = raw["queries"], sf01.get("queries", {})
    print(f"sfx1 queries: {len(q1)}, total {sum(q1.values()):.1f}s, "
          f"errors: {raw.get('errors')}")
    rows = []
    for name in sorted(q1, key=lambda n: -q1[n]):
        base = q0.get(name)
        ratio = f"{q1[name] / base:5.1f}x" if base and base > 0.05 else "   — "
        rows.append((name, q1[name], base, ratio))
    print(f"{'query':38s} {'sfx1':>8s} {'sf0.1':>8s} {'ratio':>7s}")
    for name, v, base, ratio in rows:
        b = f"{base:8.2f}" if base is not None else "       —"
        print(f"{name:38s} {v:8.2f} {b} {ratio:>7s}")


if __name__ == "__main__":
    main()
