#!/usr/bin/env bash
# SLO sensitivity sweep (reference scripts/paper/SLO.sh: SLO=3/5/10).
set -euo pipefail
MODEL=${MODEL:-sdxl}
QPS=${QPS:-1.0}
NUM=${NUM:-500}
OUT=${OUT:-outputs/slo}
mkdir -p "$OUT"

for slo in ${SLO_LIST:-3 5 10}; do
  echo "== $MODEL slo=$slo =="
  python -m sduss_tpu.benchmark.replay \
    --model "$MODEL" --qps "$QPS" --num-requests "$NUM" \
    --policy "${POLICY:-esymred}" --slo "$slo" \
    --out "$OUT/client_${MODEL}_slo${slo}.csv" \
    | tee "$OUT/metrics_${MODEL}_slo${slo}.json"
done
