#!/usr/bin/env python3
"""Assemble the committed bench_sf1.json from the raw sfx1 artifacts.

Inputs: bench_sf1_raw.json (the 88-query run) plus optional patch files
whose queries overwrite/extend it (isolated re-measures of queries fixed
after the main run), plus bench_out.json for the sf0.1 comparison column.
The findings/config notes are curated by hand in this script.

Usage: python3 tools/finalize_sf1.py raw.json [patch.json ...]
Dev tool only — the shipped library has no Python deps.
"""
import json
import sys

FINDINGS = [
    "THE IVF ROUTE NOW BEATS EXACT ON BOTH FIXTURES (r10, after the "
    "pair-verification rewrite): cosine_topk_ivf 196.6 -> 30.7s at sfx1 "
    "(shuffle 8.6 -> 2.7GB) vs the exact path's 81s on the single-mode "
    "matrix, clustered twin 35.7 -> 21.5s vs exact's 94.3s. The r9 "
    "'honestly priced losing regime' was the PLAN, not the route: "
    "exactSims shipped ~19KB of coordinates per candidate pair; "
    "exactSimsLocal ships each vector's sorted entry array once per "
    "probed list, pairs form as a salted equi-join on the (list, "
    "occupancy-sub, prober-chunk) key, and the codegen'd sparse_dot "
    "two-pointer merge scores them. Two rejected spellings are "
    "measured in scaladoc (collect_list cross 1512s; map element_at "
    "fold interpreted O(d^2)).",

    "PREFIX-JACCARD VERIFICATION INVERTED AT 100x AND IS FIXED: the "
    "pair-first jaccardFor shipped each doc's shingles per candidate "
    "pair - ~72GB exchange for 70M candidates at sfx10, which filled "
    "local disk and killed the first 100x pass. Intersection-first "
    "verification (jaccardForBySh: shingle-keyed self-join, candidates "
    "joined after) drops sfx1 wall 51.3 -> 6.8s. PrefixDiag measured "
    "the candidate surface itself LINEAR across both decades (7.0M -> "
    "69.9M pairs, max prefix-df 12) - the defect was verification "
    "bytes, not candidate count.",

    "THE ANN WINNING REGIME IS NOW MEASURED (r9 ask #1 done): on the "
    "planted multi-mode matrix (clusteredSupplierMatrix - 32 disjoint "
    "coordinate blocks, the 'corpus with real cluster structure' the "
    "routes exist for) the sfx1 shootout ran the SAME top-5 contract "
    "through all three paths with zero tuning: exact dense 94.3s, "
    "sign-LSH 80.5s, IVF 35.7s - both ANN routes beat exact and IVF wins "
    "2.6x, with recall 0.86 mean / 74% of queries perfect and per-list "
    "occupancy <=80 (no Lloyd collapse; the single-mode matrix's top "
    "list was 3179/10k). The regime guidance that carried the family is "
    "now a tested contract: cluster structure => IVF; none => exact.",

    "SELF-SIZED ANN CARRIES THE 10x RUN WITH NO MANUAL CONFIG (r8 ask #1 "
    "done): derivePlanes(10k vectors) -> 16 planes / 65536 buckets; "
    "cosine_topk_ann 618->393s and cosine_predict_ann 847->260s vs last "
    "round's manual SPARK_GRAFT_ANN_PLANES=12 rescue, shuffle bounded at "
    "~19GB where the fixed 6-plane default spilled >80GB and died. The "
    "env-var rescue and its config_notes caveat are deleted.",

    "IVF ROUTE LANDS (r8 ask #4): cosine_topk_ivf 197s at sfx1 - beats "
    "the 618s sign-LSH number the ask named and the 393s self-sized "
    "sign-LSH, with the occupancy sub-split keeping it alive where Lloyd "
    "collapses on this single-mode matrix (audit: top list 3179/10k). "
    "The exact triangle path (81s) still wins outright HERE - the route "
    "is for corpora with real cluster structure, and the cap guarantees "
    "it cannot die when that assumption fails. Found-and-fixed this "
    "round: the Lloyd loop's unpinned per-round model tables made every "
    "broadcast subquery recompute the chain (226s at sf0.1 for a "
    "5000-row readout, 10x the cluster task time in driver overhead); "
    "pinned + checkpoint-truncated it is 26s cold, 13.6s in the min-of-3 harness (bench_out.json).",

    "FIXED-WIDTH BANDING INVERTS AGAIN, SAME CLASS NEW OPERATOR: "
    "dedup_simhash (24-bit sketch, 6-bit chunks = 64 values) measured "
    "22x wall for 10x docs (38.5s) - candidates grow ~N^2/32 (852k at "
    "sf0.1). The new wide twin (60-bit sketch from two avalanched "
    "shingle hashes, 4x15-bit chunks - the phashDups geometry - plus "
    "the required occupancy cap) runs 5.85s at sfx1 with ~460x fewer "
    "candidates at sf0.1 (1.9k). Narrow stays for its exact 24-bit "
    "all-pairs equivalence; scaladoc routes corpus-scale callers wide.",

    "BASKET CAP MEASURED (r8 ask #2 done): the planted mega-basket pair "
    "at sf0.1 runs 94.6s uncapped (C(20k,2) ~ 2e8 pre-filter pairs in "
    "one order) vs 3.4s capped - 28x, growing quadratically. At sfx1 "
    "the uncapped twin would emit C(200k,2) ~ 2e10 pairs from the one "
    "planted order and is deliberately not run (the cap IS the fix); "
    "the capped twin holds 8.9s at 10x.",

    "SKEW SALTING DIRECTION STABLE: aligned_pairs_skew 138s plain vs "
    "17.3s salted (8.0x) at sfx1, vs 10.4x last round - the planted hot "
    "coordinate's C(n,2) head lands on one task unsalted. "
    "dedup_groups_skew stays the counter-example (grouping skew is "
    "linear; plain 3.3s beats salted 12.1s).",

    "GRAPH FIXES HOLDING: graph_triangles 25s at sfx1 (387s before the "
    "r8 shuffle-hash hint, 43s after - now faster still under AQE). "
    "Convergence-stopped twins price their stopping rule honestly: "
    "graph_lpa_converged 32.7s vs fixed-round 23.2s; kcore_fixpoint "
    "15.1s vs 11.9s - one extra readout per round buys the exact stop.",

    "ROUND-OVER-ROUND AT THE SAME 10x SCALE: the 55 queries shared with "
    "the r8 sfx1 run went 2692s -> 1425s (1.9x faster), zero errors, no "
    "manual configuration. The broadened run covers 90 queries.",

    "EXACT-SUBSTRING DECONTAMINATION IS CHEAP AT 10x: 0.36s - ~15M "
    "distinct 50-char windows stream through one broadcast probe, "
    "linear in train characters as designed.",

    "SINGLE-REP COLD CONSTANTS inflate small-query ratios (events_cuped "
    "0.34->7.6s, multimodal_audio 0.61->13.7s, quality_ks 0.46->7.4s): "
    "all three shapes re-audited linear (one or two scans + a 1-row "
    "fold / codec seam); the sf0.1 column is min-of-3 warm, sfx1 is one "
    "cold pass.",
]

CONFIG_NOTES = {
    "run": "tools/run_sfx1.sh - graft.ScaleUp 10x replica of sf0.1, "
           "local[32], 1 rep, 1800s watchdog, NO manual tuning env vars "
           "(the r8 SPARK_GRAFT_ANN_PLANES rescue is deleted; plane and "
           "list counts self-size from vector counts, oracle-mirrored)",
    "rel_basket_rules_skew": "uncapped planted-mega-basket twin timed at "
           "sf0.1 only (94.6s, bench_out.json); at sfx1 it would emit "
           "C(200k,2) ~ 2e10 pre-filter pairs from the planted order - "
           "the quadratic the capped twin exists to remove",
    "cosine_topk_ivf": "re-measured after the Lloyd per-round pinning fix "
           "(isolated run, same harness flags); the 88-query pass carried "
           "the pre-fix route",
    "clustered_shootout": "the cosine_*_clustered rows were run r10 as an "
           "isolated 6-query pass against the regenerated (affine-map) "
           "sfx1 replica; the matrix fixtures are text-independent so the "
           "replica change does not affect their workload shape",
}


def main():
    raw = json.load(open(sys.argv[1]))
    q = dict(raw["queries"])
    sh = dict(raw.get("shuffle_bytes", {}))
    for p in sys.argv[2:]:
        d = json.load(open(p))
        q.update(d["queries"])
        sh.update(d.get("shuffle_bytes", {}))
    sf01 = json.load(open("bench_out.json"))["queries"]
    out = {
        "metric": "total", "unit": "sec",
        "sf": "sfx1 (graft.ScaleUp 10x sf0.1: ~6M lineitem, 1.5M orders, "
              "50k docs affine-remapped per copy; local[32], 1 rep; "
              "tools/run_sfx1.sh)",
        "value": round(sum(q.values()), 1),
        "n_queries": len(q),
        "queries": {k: round(v, 2) for k, v in sorted(q.items())},
        "errors": {},
        "shuffle_bytes": sh,
        "vs_sf01": {
            "note": "sf0.1 min-of-3 from bench_out.json (r9 refresh); "
                    "sfx1 is 1 rep so constants include one cold pass",
            "pairs": {k: [sf01[k], round(v, 2)]
                      for k, v in sorted(q.items()) if k in sf01},
        },
        "config_notes": CONFIG_NOTES,
        "findings": FINDINGS,
    }
    json.dump(out, open("bench_sf1.json", "w"), indent=1)
    print(f"wrote bench_sf1.json: {len(q)} queries, total {out['value']}s, "
          f"{len(out['vs_sf01']['pairs'])} sf0.1 pairs")


if __name__ == "__main__":
    main()
