#!/usr/bin/env bash
# Resolution-distribution sensitivity (reference scripts/paper/distribution.sh:
# small/medium/large mixes).
set -euo pipefail
MODEL=${MODEL:-sdxl}
QPS=${QPS:-1.0}
NUM=${NUM:-500}
OUT=${OUT:-outputs/distribution}
mkdir -p "$OUT"

for dist in ${DIST_LIST:-small medium large}; do
  echo "== $MODEL dist=$dist =="
  python -m sduss_tpu.benchmark.replay \
    --model "$MODEL" --qps "$QPS" --num-requests "$NUM" \
    --distribution "$dist" --policy "${POLICY:-esymred}" --slo "${SLO:-5}" \
    --out "$OUT/client_${MODEL}_${dist}.csv" \
    | tee "$OUT/metrics_${MODEL}_${dist}.json"
done
