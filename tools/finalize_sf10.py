#!/usr/bin/env python3
"""Assemble the committed bench_sf10.json from the raw sfx10 artifact.

Joins BOTH earlier decades per kernel — sf0.1 (min-of-3, bench_out.json)
and sfx1 (1 rep, bench_sf1.json) — so each row is a two-decade scaling
curve: [sf0.1, sfx1, sfx10] with the 10x->100x ratio that either
certifies the cap/banding design or catches the next inversion class.
Findings are curated by hand in this script.

Usage: python3 tools/finalize_sf10.py bench_sf10_raw.json [patch.json ...]
Dev tool only — the shipped library has no Python deps.
"""
import json
import sys

FINDINGS = [
    "THE 100x CERTIFICATION IS COMPLETE (VERDICT r10 ask #1): all 14 "
    "kernels in tools/sfx10_queries.txt ran to completion at sfx10 with "
    "zero errors and zero tuning - including dedup_jaccard_prefix "
    "(53.1s; the kernel whose verification filled local disk and killed "
    "the first 100x pass never had a successful 100x row until now). "
    "Every kernel has a committed [sf0.1, sfx1, sfx10] curve below.",

    "SINGLE-MODE IVF SUPERLINEARITY: CAUSE FOUND, FIXED, RE-MEASURED "
    "(r10 What's-wrong #4). Two independent terms: (a) the Lloyd fit "
    "scored assignment through a V*nnz*L join - 3.3B rows at sfx10 "
    "where deriveLists hits the 1024-list cap - making the fit alone "
    "25x wall for 10x data (cosine_ivf_occupancy 18 -> 456s); respelled "
    "as driver-collected model-codebook scoring it is 36-40s at sfx10, "
    "sublinear across the decade. (b) the occupancy sub-split and "
    "prober-chunk hashes keyed on probe-based tokenValue, which "
    "collapses 100k sequential integer ids into ~9k collision classes "
    "- IvfDiag measured max assigned-per-group 977 against the 32 cap "
    "and a 67.3M pair surface (55x for 10x data); the full-string "
    "charFold restores the bound (max 39, 5.9M pairs, linear). "
    "cosine_topk_ivf at sfx10: 831.9s (r10) -> 422.1s (fit fix alone) "
    "-> 147.4s (both fixes, 1024-list ladder) -> 113.5s (final: the "
    "ladder raised to 4096 lists - the 1024 cap existed only for the "
    "deleted V*L-row assignment join, and at 4096 occupancy sits at "
    "the <=32 target through the whole decade - plus an "
    "allocation-free insertion top-k in the scorer). The committed "
    "row is the final config; the step vs the sfx1 column (18.6s "
    "isolated / 13.5s interleaved) is ~6-8x for 10x data. The r10 "
    "npb-replication hypothesis was WRONG - the replication surface "
    "measures linear once the hash spreads ids.",

    "RECALL AT THE FINAL TREE (sfx1, 10k vectors, measured from the "
    "verify dump): clustered fixture 0.868 mean / 75% of queries "
    "perfect - IDENTICAL to the r10 headline (0.86/74%), so neither "
    "the charFold sub-split nor the 4096-list ladder damaged the "
    "route's winning regime. Single-mode fixture 0.02 mean - the "
    "documented LOSING regime (Lloyd collapse; the occupancy audit's "
    "n_sub >> 1 readout is precisely its detector, and the route "
    "guidance sends that corpus to the exact path, which also WINS on "
    "wall there at every measured scale).",

    "CLUSTERED IVF SCALES CLEANLY THROUGH ALL FIXES: topk 5.4s at "
    "sfx1 -> 59.2s at sfx10; occupancy 4.1 -> 28.2s. Single-rep "
    "variance on these kernels is +-40% across the three sfx10 "
    "configurations measured this round (e.g. clustered topk 47.1 / "
    "42.5 / 59.2s); every configuration holds the decade step at or "
    "under ~11x. The route's winning regime (cluster structure) holds "
    "a two-decade at-most-linear curve.",

    "PREFIX-JACCARD IS A TWO-DECADE LINEAR CURVE: 6.3s (sf0.1 cold) "
    "-> 9.7s (sfx1) -> 53.1s (sfx10, 4.7GB shuffle). The r10 "
    "intersection-first verify plus the r11 candidate-doc semi-join "
    "prune and population-consistent maxDf kill switch bound the "
    "df-head; the planted boilerplate-head pair prices the removed "
    "quadratic at sf0.1 (62.8s uncapped vs 7.2s capped).",

    "ALIGNED_PAIRS_SKEW_SALTED IS QUADRATIC BY FIXTURE, NOT BY PLAN: "
    "981.6s at sfx10 (12.3GB shuffle). The planted hot coordinate sits "
    "in 60% of customers, whose count grows with sf - measured df "
    "8,999 / 89,990 / 899,900 across the three decades, so the pair "
    "OUTPUT is C(df,2) = 4.05e7 / 4.05e9 / 4.05e11 - exactly 100x per "
    "decade by construction. Salting distributes that head across the "
    "triangle tasks (the plain twin's single hot task dies) but cannot "
    "shrink the output; the 68x wall step for 100x output means "
    "per-row throughput IMPROVED with scale. Not a shuffle defect.",

    "GRAPH AT 100x: pagerank 178.7s (23.4s at sfx1 = 7.6x, linear - "
    "per-round join+aggregate with localCheckpoint truncation); "
    "triangles 546.3s / 43.7GB shuffle (17.7s at sfx1 = 31x). The "
    "LOGICAL surface is measured LINEAR - the co-ordered-parts graph "
    "has wedges 1.478B at sfx1 vs 14.78B at sfx10 (exactly 10x; max "
    "degree 222 in BOTH decades, so sum(deg^2) scales with nodes, not "
    "degree growth) - and shuffle bytes are linear with it. The "
    "super-proportional WALL step is single-box I/O: 4.4GB of wedge "
    "shuffle fits the page cache at sfx1, 43.7GB at sfx10 is written "
    "and re-read through local disk. On a multi-executor cluster the "
    "same job spreads those bytes over aggregate disk bandwidth - the "
    "plan (degree-oriented wedges + shuffle-hash semi close, never a "
    "wedge sort) is already the byte-minimal spelling: an "
    "adjacency-intersection rewrite would ship sum(deg)x arrays "
    "~= 120GB, 3x more.",

    "THE PREFIX DF-CAP AT 100x REMOVES A 4.5-TRILLION-PAIR SURFACE: "
    "on the planted boilerplate-head fixture at sfx10 (1M docs, 9 "
    "shared trigrams at df = 1M), the UNCAPPED verify surface measures "
    "4.50e12 pairs; maxDf = 24 excises 511,849 over-cap shingles "
    "carrying 99.993% of it, leaving 328.5M pairs - measured LINEAR "
    "across the decade (33.2M at sfx1, 9.9x for 10x docs). The capped "
    "twin completes in 316.7s (15.7s at sfx1; the 20x wall step is the "
    "single-box I/O knee again - 0.46 -> 11.4GB of shuffle through "
    "local disk - on a linear logical surface). cosine_predict_ivf "
    "lands its first 100x row too: 210.4s (32.5s at sfx1 = 6.5x, "
    "sublinear).",

    "CAPS HOLD AT 100x: rel_basket_rules_skew_capped 32.2s (8.2s at "
    "sfx1, 3.9x - the planted mega-basket stays excised); "
    "dedup_minhash_lsh 20.7s, dedup_simhash_wide 15.0s, dedup_exact "
    "1.0s - all linear-or-better steps; decontaminate_substring 3.1s "
    "(linear in train chars); corpus_select_shards 67.9s (5.9x).",
]

CONFIG_NOTES = {
    "run": "tools/run_sfx10.sh - graft.ScaleUp 100x replica of sf0.1 "
           "(~60M lineitem, 15M orders, 500k docs, 100k vectors; affine "
           "per-copy letter bijections so no verbatim cross-copy text), "
           "local[32], 1 rep, 3600s watchdog, NO tuning env vars",
    "kernel_list": "tools/sfx10_queries.txt - the ~12 scale-critical "
           "kernels whose caps/banding were sized at 10x (VERDICT r9 "
           "ask #4: the second decade either certifies them or catches "
           "the next inversion class)",
}


def main():
    args = sys.argv[1:]
    # --rep2 <file>: a second independent observation of (some) kernels
    # (VERDICT r11 ask #6). The headline time stays min-of-reps (the
    # Bench convention); both observations are committed per kernel so
    # the >=100s curves are no longer single draws from a +-40% band.
    rep2 = {}
    if "--rep2" in args:
        i = args.index("--rep2")
        rep2 = json.load(open(args[i + 1]))["queries"]
        args = args[:i] + args[i + 2:]
    raw = json.load(open(args[0]))
    q = dict(raw["queries"])
    sh = dict(raw.get("shuffle_bytes", {}))
    for p in args[1:]:
        d = json.load(open(p))
        q.update(d["queries"])
        sh.update(d.get("shuffle_bytes", {}))
    two_rep = {k: {"rep1": round(q[k], 2), "rep2": round(rep2[k], 2)}
               for k in rep2 if k in q}
    for k, v in rep2.items():
        if k in q:
            q[k] = min(q[k], v)
    sf01 = json.load(open("bench_out.json"))["queries"]
    sfx1 = json.load(open("bench_sf1.json"))["queries"]
    curves = {}
    print(f"{'kernel':32s} {'sf0.1':>8s} {'sfx1':>8s} {'sfx10':>9s} "
          f"{'x1/x0.1':>8s} {'x10/x1':>8s}")
    for k in sorted(q):
        c = [sf01.get(k), sfx1.get(k), round(q[k], 2)]
        curves[k] = c
        r1 = f"{c[1]/c[0]:7.1f}x" if c[0] and c[1] else "      —"
        r2 = f"{c[2]/c[1]:7.1f}x" if c[1] else "      —"
        s0 = f"{c[0]:8.2f}" if c[0] is not None else "       —"
        s1 = f"{c[1]:8.2f}" if c[1] is not None else "       —"
        print(f"{k:32s} {s0} {s1} {c[2]:9.2f} {r1} {r2}")
    out = {
        "metric": "total", "unit": "sec",
        "sf": "sfx10 (graft.ScaleUp 100x sf0.1; local[32], 1 rep; "
              "tools/run_sfx10.sh)",
        "value": round(sum(q.values()), 1),
        "n_queries": len(q),
        "queries": {k: round(v, 2) for k, v in sorted(q.items())},
        "two_rep": two_rep,
        "errors": raw.get("errors", {}),
        "shuffle_bytes": sh,
        "scaling_curves": {
            "note": "[sf0.1 min-of-3 warm, sfx1 1-rep cold, sfx10 1-rep "
                    "cold] seconds per kernel; data grows 10x per step "
                    "so a scale-linear kernel shows ~10x per step minus "
                    "the amortized constant",
            "rows": curves,
        },
        "config_notes": CONFIG_NOTES,
        "findings": FINDINGS,
    }
    json.dump(out, open("bench_sf10.json", "w"), indent=1)
    print(f"\nwrote bench_sf10.json: {len(q)} kernels, "
          f"total {out['value']}s, errors: {out['errors']}")


if __name__ == "__main__":
    main()
