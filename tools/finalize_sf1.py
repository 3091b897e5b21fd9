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
    "R13 DECADE-STEP ATTRIBUTIONS (VERDICT r12 ask #4) - all three >8x "
    "sfx1 steps settled by isolated re-reps + surface measurement, none "
    "a scale defect: (1) multimodal_audio 17.4x was REAL and is FIXED "
    "in code - AudioSystem.write/getAudioInputStream re-ran the JDK "
    "sound-provider ServiceLoader scan per row under Spark task "
    "threads (jstack-sampled); providers now resolve once per "
    "partition and readers reorder adaptively: 9.94s -> 0.45s at sfx1. "
    "(2) rel_join_bucketed 9.4x was measurement semantics: the sf0.1 "
    "min-of-3 denominator reuses the bucketed warehouse tables written "
    "by rep 1 (0.44s warm) while the 1-rep sfx1 run pays the cold "
    "two-table bucketed rebuild; isolated cold-vs-cold it is 4.06s -> "
    "5.31s (1.31x) on byte-identical 1,691-byte join shuffles (the "
    "bucketing holds - no exchange at either scale). (3) "
    "dedup_semantic_sweep_probes 11.0x was the same warm-denominator "
    "artifact: isolated cold-vs-cold 1.42s -> 8.64s (6.1x) on 9.4x "
    "shuffle bytes (198,995 -> 1,878,687) - linear surface, sublinear "
    "time.",

    "R12 PRUNE GATE: jaccardForBySh's candidate-doc semi-join is now "
    "regime-gated on the measured df-head (prune iff max_df^2 > "
    "postings, one aggregate over the shingle table). Isolating the "
    "alternatives at sf0.1 on the planted head fixture measured the "
    "no-op semi-join as PHYSICALLY load-bearing - its shuffle output "
    "forces the sh-keyed self-join into an AQE-skew-splittable "
    "SortMergeJoin (57.9s) where the directly-scanned checkpoint "
    "planned as a BroadcastHashJoin whose hot-key expansion AQE cannot "
    "split (106.4s, same 12,137 output rows) - while on the head-free "
    "contract corpus the prune is pure overhead (2.94s gated vs 4.03s "
    "always-on in r11). The gate picks the right plan in both regimes.",

    "R12 NEW KERNELS AT 10x: dedup_auto (the kernel router - one "
    "corpus pass measuring sigma-C(df,2) against a corpus-linear pair "
    "budget, choice flips exact/prefix_dfcap/minhash_banded across the "
    "planted three-regime fixture) and aligned_pairs_skew_dfcap (the "
    "dfCap mitigation twin of the skew exhibit - cap 64 excises "
    "exactly the planted head; capped pair surface 8.98M -> 89.8M -> "
    "898M per decade, linear by construction).",

    "R12 IVF DIM HASH ON charFold: the last tokenValue-on-ids path "
    "(ivfDimSql's coordinate feature-hash bucket) moved to the "
    "full-string fold (max/mean dim-bucket load 1.04-1.08 vs "
    "1.39-1.89 on 100k sequential integer coords). Clustered-fixture "
    "recall IMPROVED (sf0.01: 0.46 -> 0.66 mean), single-mode (the "
    "documented losing regime) dipped (0.52 -> 0.43); topk at sfx1 "
    "is unchanged (16.5s vs r11's 18.6s isolated).",

    "THE SPARSE-ANN ROUTE IS NOW IVF-ONLY AND WINS EVERYWHERE MEASURED "
    "(r11): the sign-LSH sparse route was DELETED per VERDICT r10 "
    "What's-wrong #1 (it was strictly dominated on every fixture ever "
    "measured - 393s vs IVF's 30.7s single-mode, 80.5s vs 21.5s "
    "clustered at r10 sfx1 - and its two kernels were ~23% of the r10 "
    "artifact's wall). After the r11 fit + id-hash fixes the IVF route "
    "beats the exact path on BOTH fixtures at sfx1: single-mode topk "
    "18.6s (13.5s in the interleaved full pass) vs exact 32.0s, "
    "clustered 5.4s vs 22.0s, predict 32.5s vs 42.9s. Migration note "
    "in ext/SparseAnn's scaladoc. The IVF rows are the isolated "
    "final-kernel re-measure (bench_sf1_ivf_patch.json): r11 also "
    "raised the deriveLists ladder to 4096 (the old 1024 cap existed "
    "for the deleted V*L-row assignment join) and replaced the "
    "scorer's sort with an allocation-free insertion top-k.",

    "LLOYD ASSIGNMENT RESPELLED AS MODEL-BROADCAST SCORING (r11, VERDICT "
    "r10 ask #2a): the fit scored list assignment through a j-keyed join "
    "producing V*nnz*L rows per round (3.3 BILLION at sfx10 where "
    "deriveLists hits the 1024-list cap) plus a V*L ranked-table "
    "localCheckpoint - the fit ALONE was 25x wall for 10x data "
    "(cosine_ivf_occupancy 18->456s). The codebook is model-sized "
    "(<=1024x32 doubles), so each round now collects it to the driver "
    "and every vector scores all live lists in one zero-exchange "
    "compiled projection emitting only top-nprobe. Occupancy fit at "
    "sfx10: 456 -> 36s (sublinear across the decade). An interpreted "
    "HOF spelling of the same kernel was measured LOSING (clustered "
    "fit 32->39s at sfx1) and is documented in the scaladoc.",

    "PROBE-HASH ID COLLAPSE FOUND AND FIXED (r11, VERDICT r10 ask #2b - "
    "the actual cause of the single-mode IVF superlinearity): the "
    "occupancy sub-split and prober-chunk hashes keyed on "
    "TextHash.tokenValue, which probes only (length, first, middle, "
    "last chars). 100k sequential integer-string ids collapse into ~9k "
    "collision classes (~11 ids each), so hash(id) %% n_sub placed whole "
    "classes into single sub-buckets: IvfDiag measured max "
    "assigned-per-group 977 against the 32 cap and a 67.3M pair surface "
    "at sfx10 (55x for 10x data). TextHash.charFold (full-string Horner "
    "fold, DuckDB list_reduce twin for the oracles) restores the bound: "
    "max assigned 39, pair surface 5.9M (linear), cosine_topk_ivf at "
    "sfx10 422 -> 147s = 7.6x for 10x data. NOT npb prober-chunk "
    "replication (r10's hypothesis) - the replication surface was "
    "measured linear once the hash actually spread ids.",

    "PREFIX-JACCARD DF-HEAD BOUNDED (r11, VERDICT r10 ask #4): "
    "jaccardForBySh now (a) semi-joins the shingle table down to "
    "candidate documents before its self-join (semantics-free) and (b) "
    "prefixJaccardDups threads maxDf with population-consistent "
    "dfCapShingles semantics through BOTH branches. The planted "
    "boilerplate-head pair (every doc + a 9-trigram df=|corpus| "
    "suffix + a near-dup variant, so the prune is deliberately "
    "inert): uncapped twin 62.8s at sf0.1 (isolated 1 rep) paying "
    "~C(2N,2) verify rows per boilerplate shingle vs capped twin 7.2s "
    "= 8.7x removed, and the capped twin holds 15.7s at sfx1. "
    "dedup_jaccard_prefix itself holds 9.7s at sfx1 and 53.1s at "
    "sfx10 - the kernel that filled local disk in the first 100x pass "
    "is now a two-decade linear curve.",

    "PREFIX-JACCARD VERIFICATION INVERTED AT 100x AND IS FIXED (r10): "
    "the pair-first jaccardFor shipped each doc's shingles per candidate "
    "pair - ~72GB exchange for 70M candidates at sfx10, which filled "
    "local disk and killed the first 100x pass. Intersection-first "
    "verification (jaccardForBySh) plus the r11 guards above carry the "
    "route across both decades.",

    "DOC_WINNOW r9 ANOMALY EXPLAINED (VERDICT r10 ask #6): the r9 "
    "4.94s sf0.1 reading was harness interleave, not a plan change - "
    "the operator's code has exactly one commit since introduction "
    "(git log -S confirms no modification), its shuffle_bytes are the "
    "59-byte empty-exchange sentinel in every round (the query is a "
    "zero-exchange row-local fold), and re-measured it sits at 1.18s "
    "(sf0.1 min-of-3) / 1.29s (sfx1, one cold rep) - scan-bound and "
    "flat across the decade, exactly what a shuffle-free plan predicts.",

    "FIXED-WIDTH BANDING INVERTS AGAIN, SAME CLASS NEW OPERATOR: "
    "dedup_simhash (24-bit sketch, 6-bit chunks = 64 values) measured "
    "22x wall for 10x docs (38.5s) - candidates grow ~N^2/32 (852k at "
    "sf0.1). The wide twin (60-bit sketch, 4x15-bit chunks + occupancy "
    "cap) runs 5.1s at sfx1 with ~460x fewer candidates; wide is the "
    "default route since r10.",

    "BASKET CAP MEASURED: the planted mega-basket pair at sf0.1 runs "
    "uncapped 43.3s vs capped 3.0s; at sfx1 the uncapped twin would "
    "emit C(200k,2) ~ 2e10 pairs from the one planted order and is "
    "deliberately not run (the cap IS the fix); the capped twin holds "
    "8.2s at 10x and 32.2s at 100x (bench_sf10.json).",

    "SKEW SALTING DIRECTION STABLE: aligned_pairs_skew 108.9s plain vs "
    "14.4s salted (7.5x) at sfx1 - the planted hot coordinate's C(n,2) "
    "head lands on one task unsalted. dedup_groups_skew stays the "
    "counter-example (grouping skew is linear; plain beats salted).",

    "COVERAGE EXTENDED TO 182 QUERIES (VERDICT r10 ask #5): the full "
    "relational family, core cosine chain, dedup verification kernels, "
    "embedding/ANN family, events batch twins, and the tokenizer "
    "family all have a 10x number now; exclusions are documented in "
    "config_notes (the two deliberately-uncapped quadratic exhibits "
    "and three correctness-only plan variants).",
]

CONFIG_NOTES = {
    "run": "tools/run_sfx1.sh recipe - graft.ScaleUp 10x replica of "
           "sf0.1, local[32], 1 rep, 1800s watchdog, NO manual tuning "
           "env vars; r11 run used the snapshotted-classpath java "
           "invocation (run_sfx10.sh pattern) over the full "
           "tools/sfx1_queries.txt (182 queries)",
    "exclusions": "rel_basket_rules_skew and dedup_jaccard_prefix_head "
           "(the deliberately-UNCAPPED planted-quadratic exhibits) are "
           "timed at sf0.1 only - one decade up they would emit "
           "C(200k,2) basket pairs / ~9xC(100k,2) verify rows BY "
           "DESIGN; their capped twins carry the 10x (and 100x) "
           "curves. aligned_pairs_dfcap / pair_dot / pair_mods_dense "
           "are correctness-only variants of benched plans "
           "(aligned_pairs / pair_mods_sparse) and are not in Bench's "
           "headline set.",
    "aligned_pairs_skew_salted": "the fixture's OUTPUT is quadratic by "
           "construction (planted hot coordinate, C(df,2) pairs with "
           "df growing with sf) - salting distributes the head, it "
           "cannot shrink it; the 100x row (981.6s, bench_sf10.json) "
           "prices exactly that.",
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
