#!/bin/bash
# 32-core A/B of the three r08 rewrites with contrary/missing driver
# evidence (r08 verdict next-round #1): old = pre-optimization b4822c6
# (worktree /tmp/repo_pre_opt), new = this repo's HEAD.  ABAB ordering,
# each leg a fresh JVM running tools/minibench.py (bench.py's exact
# noop/settle/median-of-3 methodology, drift-probe bracketed).
set -u
Q="ts_anomaly_zscore ml_naive_bayes mix_dsir_weights"
OUT=${1:-/tmp/ab32_r09}
mkdir -p "$OUT"
for leg in 1 2; do
  for side in old new; do
    dir=/root/repo; [ $side = old ] && dir=/tmp/repo_pre_opt
    echo "=== leg $leg $side ($dir) ===" >&2
    (cd "$dir" && SPARK_GRAFT_CPUS=32 MB_RUNS=3 \
      python tools/minibench.py $Q \
      > "$OUT/${side}_${leg}.json" 2> "$OUT/${side}_${leg}.log")
    tail -1 "$OUT/${side}_${leg}.json"
  done
done
