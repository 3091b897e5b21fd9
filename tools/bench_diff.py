#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (e.g. last round's bench_out.json vs
this round's): per-query deltas on the shared set, regressions beyond a
noise factor, added/removed queries, and shuffle-byte drift — the same
questions the round verdict asks, answered mechanically.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [noise_factor=1.5]

Dev tool only — the shipped library has no Python deps.
"""
import json
import sys


def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    noise = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    os_, ns_ = sum(oq[q] for q in shared), sum(nq[q] for q in shared)
    print(f"shared {len(shared)} queries: {os_:.1f}s -> {ns_:.1f}s "
          f"({ns_ / os_:.2f}x)" if shared else "no shared queries")
    regressions = [(q, oq[q], nq[q]) for q in shared
                   if nq[q] > oq[q] * noise and nq[q] - oq[q] > 0.5]
    for q, a, b in sorted(regressions, key=lambda t: t[1] - t[2]):
        print(f"  REGRESSED >{noise}x: {q}: {a:.2f}s -> {b:.2f}s")
    improved = [(q, oq[q], nq[q]) for q in shared
                if oq[q] > nq[q] * noise and oq[q] - nq[q] > 0.5]
    for q, a, b in sorted(improved, key=lambda t: t[2] - t[1])[:10]:
        print(f"  improved: {q}: {a:.2f}s -> {b:.2f}s")
    if added:
        print(f"added ({len(added)}): " +
              ", ".join(f"{q}={nq[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    osb = old.get("shuffle_bytes", {})
    nsb = new.get("shuffle_bytes", {})
    sb_shared = [q for q in shared if q in osb and q in nsb]
    drifted = [(q, osb[q]["write"], nsb[q]["write"]) for q in sb_shared
               if nsb[q]["write"] > max(osb[q]["write"] * 1.2, osb[q]["write"] + (1 << 20))]
    for q, a, b in drifted:
        print(f"  SHUFFLE DRIFT: {q}: {a / 1e6:.1f}MB -> {b / 1e6:.1f}MB written "
              f"(a lost map-side partial or broadcast?)")
    errs = new.get("errors", {})
    if errs:
        print(f"errors in new run: {errs}")
    print(f"totals: old {old.get('value')}s ({len(oq)} q) -> "
          f"new {new.get('value')}s ({len(nq)} q); "
          f"new errors: {len(errs)}")


if __name__ == "__main__":
    main()
