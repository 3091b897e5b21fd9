#!/bin/bash
# sfx1 spot-bench driver (VERDICT r8 ask #6): regenerates the 10x replica
# of sf0.1 via graft.ScaleUp, then runs the broadened heavy-query list
# (>=80) at local[32], 1 rep, NO manual ANN env-var rescue (the self-sized
# plane/list derivations must carry the run). Raw output lands in
# bench_sf1_raw.json; bench_sf1.json is assembled from it with config
# notes + findings.
set -euo pipefail
cd /root/repo

SFX1_DIR=${SFX1_DIR:-/root/repo/target/sfx1}
if [ ! -d "$SFX1_DIR/lineitem.parquet" ]; then
  echo "[run_sfx1] generating 10x replica at $SFX1_DIR"
  sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 $SFX1_DIR 10"
fi

QUERIES=$(tr '\n' ',' < tools/sfx1_queries.txt | sed 's/,$//')
echo "[run_sfx1] $(echo "$QUERIES" | tr ',' '\n' | wc -l) queries"

SPARK_GRAFT_SF_DIR="$SFX1_DIR" \
SPARK_GRAFT_BENCH_REPS=1 \
SPARK_GRAFT_QUERY_TIMEOUT=1800 \
SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf1_raw.json \
sbt -batch "runMain graft.Bench"
