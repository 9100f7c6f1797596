#!/bin/bash
# Chained after tpu_queue_r2d.sh, in priority order:
#  1. serving probe rerun (bucket-ceiling fix; prewarm keys already hot)
#  2. SD3 profile regen with worker-true routing
#  3. SD3 attention + step re-measure after the two-pass 128-alignment
#     change (4480 no longer pads to 4608 -> nobias kernel everywhere)
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while [ -f /tmp/queue_r2d.pid ] && kill -0 "$(cat /tmp/queue_r2d.pid)" 2>/dev/null; do
  sleep 60
done
timeout 14400 python -u scripts/serving_probe.py --qps 0.25,0.35,0.45 \
    --num 14 --steps 30 --deep-interval 3 --batch-buckets 2,4,8 \
    --out exp/serving_sdxl_v5e_r2.json
timeout 10800 python -u -m sduss_tpu.scheduler.profiler --family sd3 \
    --encoders-on-host --isolate group \
    --out-profile exp/profile_sd3_v5e.json \
    --out-predictor exp/predictor_sd3_v5e.npz
timeout 3600 python -u scripts/bench_attn_pipe.py
timeout 5400 python -u scripts/bench_sd3.py | tee exp/bench_sd3_v5e_r2_dense.json
BENCH_SD3_CACHE=0.5 timeout 5400 python -u scripts/bench_sd3.py | tee exp/bench_sd3_v5e_r2_compact.json
echo QUEUE_R2G_DONE
