#!/usr/bin/env python3
"""Move designated sf0.1 kernels to the isolated measurement protocol.

VERDICT r12 ask #2 / lesson 8: kernels timed inside the full 253-query
JVM inherit whatever heap/page-cache state their neighbors left behind —
corpus_select_shards measured 8.33 s in-run vs 6.88 s isolated on
byte-identical shuffle plans (3,062,5xx bytes written, zero spill), so
the in-run draw is host state, not the kernel's cost. For the kernels
named by the patch files, the committed number becomes the ISOLATED
min (one JVM per rep, SPARK_GRAFT_BENCH_ONLY=<kernel>), and the in-run
draw is kept as a context column under "observations" — the
finalize_sf10.py --isolated convention applied to the sf0.1 artifact.

Usage:
  python3 tools/patch_sf01_isolated.py bench_out.json iso1.json [iso2.json ...]

Each iso*.json is a SPARK_GRAFT_BENCH_OUT file from an isolated Bench
run; every query it carries is patched (min across all iso files).
vs_prev_shared's cur_sec/ratio are recomputed over the same shared set
so the embedded round-over-round ratio reflects the committed values.
Dev tool only — the shipped library has no Python deps.
"""
import json
import sys


def main() -> None:
    out_path, iso_paths = sys.argv[1], sys.argv[2:]
    art = json.load(open(out_path))

    iso = {}
    for p in iso_paths:
        d = json.load(open(p))
        for k, v in d.get("queries", {}).items():
            iso[k] = min(v, iso[k]) if k in iso else v

    obs = art.get("observations", {})
    for k, v in sorted(iso.items()):
        if k not in art["queries"]:
            print(f"[patch_sf01] {k}: not in artifact, skipped")
            continue
        in_run = art["queries"][k]
        obs[k] = {
            "in_run": in_run,
            "isolated": round(v, 3),
            "protocol": "isolated min, one JVM per rep "
                        "(tools/patch_sf01_isolated.py)",
        }
        art["queries"][k] = round(v, 3)
        print(f"[patch_sf01] {k}: in-run {in_run} -> isolated {v}")
    art["observations"] = obs

    art["value"] = round(sum(art["queries"].values()), 3)
    vp = art.get("vs_prev_shared")
    if vp:
        # recompute cur_sec/ratio against the SAME baseline commit: the
        # shared set is every query the baseline artifact also carries
        import subprocess
        base = vp.get("baseline_commit", "")
        try:
            prev = json.loads(subprocess.run(
                ["git", "show", f"{base}:bench_out.json"],
                capture_output=True, text=True, check=True,
                cwd="/root/repo").stdout)
            shared = [k for k in art["queries"] if k in prev["queries"]]
            ps = sum(prev["queries"][k] for k in shared)
            cs = sum(art["queries"][k] for k in shared)
            vp.update(n_shared=len(shared), prev_sec=round(ps, 3),
                      cur_sec=round(cs, 3),
                      ratio=round(cs / ps, 3) if ps > 0 else 0.0)
            print(f"[patch_sf01] vs_prev_shared recomputed: "
                  f"{vp['ratio']} on {len(shared)} shared")
        except Exception as e:  # baseline unreadable: drop, don't lie
            print(f"[patch_sf01] vs_prev_shared NOT recomputed ({e}); "
                  "removing the stale ratio")
            art.pop("vs_prev_shared", None)

    json.dump(art, open(out_path, "w"))
    print(f"[patch_sf01] wrote {out_path}: total {art['value']}s, "
          f"{len(art['queries'])} queries")


if __name__ == "__main__":
    main()
