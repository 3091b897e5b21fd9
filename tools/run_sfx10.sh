#!/bin/bash
# sfx10 (100x sf0.1) spot-bench driver (VERDICT r9 ask #4): the SECOND
# scale decade. Generates the 100-copy replica via graft.ScaleUp (affine
# per-copy letter bijections — the Caesar i%26 recycle is fixed, so no
# verbatim cross-copy text at 100 copies), then runs the ~12
# scale-critical kernels at local[32], 1 rep, no manual tuning env vars.
# Raw output lands in bench_sf10_raw.json; bench_sf10.json is assembled
# from it with config notes + findings (tools/finalize_sf1.py pattern).
#
# Runs from a SNAPSHOTTED classpath (java -cp, not sbt) so the build stays
# free while the long run executes.
set -euo pipefail
cd /root/repo

SFX10_DIR=${SFX10_DIR:-/root/repo/target/sfx10}
CLASSES=${CLASSES:-/tmp/graft_classes_r10}

if [ ! -d "$SFX10_DIR/lineitem.parquet" ]; then
  echo "[run_sfx10] generating 100x replica at $SFX10_DIR"
  java -cp "$CLASSES:/opt/spark/jars/*" \
    -Xmx24g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
    graft.ScaleUp /root/testdata/sf0.1 "$SFX10_DIR" 100
fi

QUERIES=$(tr '\n' ',' < tools/sfx10_queries.txt | sed 's/,$//')
echo "[run_sfx10] $(echo "$QUERIES" | tr ',' '\n' | wc -l) queries"

SPARK_GRAFT_SF_DIR="$SFX10_DIR" \
SPARK_GRAFT_BENCH_REPS=1 \
SPARK_GRAFT_QUERY_TIMEOUT=3600 \
SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf10_raw.json \
java -cp "$CLASSES:/opt/spark/jars/*" \
  -Xmx100g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  graft.Bench
