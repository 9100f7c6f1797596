#!/bin/bash
# Chained after tpu_queue_r2.sh: SD3 jobs that needed the host-side encoder
# generation fix (T5-XXL was being generated on device and filling HBM).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while [ -f /tmp/queue_r2.pid ] && kill -0 "$(cat /tmp/queue_r2.pid)" 2>/dev/null; do
  sleep 60
done
# SD3 cache classifiers (retry with host-resident encoders)
timeout 7200 python -u -m sduss_tpu.cache.train --family sd3 --steps 12 \
    --encoders-on-host --resolutions 512 768 \
    --out exp/cache_classifiers_sd3_v5e.npz
# SD3 profile + predictor (grouped isolation)
timeout 10800 python -u -m sduss_tpu.scheduler.profiler --family sd3 \
    --encoders-on-host --isolate group \
    --out-profile exp/profile_sd3_v5e.json \
    --out-predictor exp/predictor_sd3_v5e.npz
# SD3 token-fine step bench (per-token delta-skip at 0.5)
BENCH_SD3_FINE=0.5 timeout 5400 python scripts/bench_sd3.py \
    | tee exp/bench_sd3_v5e_r2_fine.json
echo QUEUE_R2B_DONE
