#!/bin/bash
# Chained after tpu_queue_r2c.sh:
#  1. regenerate sdxl/sd15 stage profiles + predictors with worker-true
#     routing (uniform comps dense; the old singleton rows overstated 1.8x)
#  2. headline bench refresh, sequential vs head-pipelined kernels
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while [ -f /tmp/queue_r2c.pid ] && kill -0 "$(cat /tmp/queue_r2c.pid)" 2>/dev/null; do
  sleep 60
done
timeout 7200 python -u -m sduss_tpu.scheduler.profiler --family sdxl \
    --isolate group \
    --out-profile exp/profile_sdxl_v5e.json \
    --out-predictor exp/predictor_sdxl_v5e.npz
timeout 5400 python -u -m sduss_tpu.scheduler.profiler --family sd15 \
    --isolate group \
    --out-profile exp/profile_sd15_v5e.json \
    --out-predictor exp/predictor_sd15_v5e.npz
timeout 3600 python -u bench.py | tee /tmp/bench_r2_seq.json
SDUSS_ATTN_PIPE=1 timeout 3600 python -u bench.py | tee /tmp/bench_r2_pipe.json
echo QUEUE_R2D_DONE
