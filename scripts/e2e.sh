#!/usr/bin/env bash
# E2E QPS sweep (reference scripts/paper/e2e.sh: DP=1, QPS x policy matrix).
# Produces client_{model}_{policy}_{qps}.csv + printed SLO metrics per run.
set -euo pipefail
MODEL=${MODEL:-sdxl}
NUM=${NUM:-500}
OUT=${OUT:-outputs/e2e}
mkdir -p "$OUT"

case "$MODEL" in
  sdxl) QPS_LIST=${QPS_LIST:-"0.8 0.9 1.0 1.1 1.2"} ;;
  sd3)  QPS_LIST=${QPS_LIST:-"0.1 0.2 0.3 0.4 0.5"} ;;
  *)    QPS_LIST=${QPS_LIST:-"1.0 2.0 3.0"} ;;
esac
POLICIES=${POLICIES:-"esymred fcfs_mixed orca_resbyres"}

# learned artifacts, used when present (reference e2e.sh:50-55 env-var analog)
EXTRA=()
[ -f "exp/predictor_${MODEL}_v5e.npz" ] && EXTRA+=(--predictor "exp/predictor_${MODEL}_v5e.npz")
[ -f "exp/profile_${MODEL}_v5e.json" ] && EXTRA+=(--profile "exp/profile_${MODEL}_v5e.json")
[ -f "exp/cache_classifiers_${MODEL}_v5e.npz" ] && \
  EXTRA+=(--classifiers "exp/cache_classifiers_${MODEL}_v5e.npz")

for qps in $QPS_LIST; do
  for pol in $POLICIES; do
    echo "== $MODEL qps=$qps policy=$pol =="
    python -m sduss_tpu.benchmark.replay \
      --model "$MODEL" --qps "$qps" --num-requests "$NUM" \
      --policy "$pol" --slo "${SLO:-5}" "${EXTRA[@]}" \
      --out "$OUT/client_${MODEL}_${pol}_${qps}.csv" \
      | tee "$OUT/metrics_${MODEL}_${pol}_${qps}.json"
  done
done
