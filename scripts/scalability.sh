#!/usr/bin/env bash
# DP scaling sweep (reference scripts/paper/scalibility.sh: DP=2/4/8,
# QPS scaled by replica count).
set -euo pipefail
MODEL=${MODEL:-sdxl}
BASE_QPS=${BASE_QPS:-1.0}
NUM=${NUM:-500}
OUT=${OUT:-outputs/scalability}
mkdir -p "$OUT"

for dp in ${DP_LIST:-1 2 4 8}; do
  qps=$(python -c "print($BASE_QPS * $dp)")
  echo "== $MODEL dp=$dp qps=$qps =="
  python -m sduss_tpu.benchmark.replay \
    --model "$MODEL" --qps "$qps" --num-requests "$NUM" --dp "$dp" \
    --policy "${POLICY:-esymred}" --slo "${SLO:-5}" \
    --out "$OUT/client_${MODEL}_dp${dp}.csv" \
    | tee "$OUT/metrics_${MODEL}_dp${dp}.json"
done
