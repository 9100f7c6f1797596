#!/bin/bash
# Chained after tpu_queue_r2b.sh (waits on its pid):
#  1. head-pipelined flash schedule A/B at production shapes
#  2. serving probe with Engine.prewarm + phase-aligned admission +
#     dense-uniform routing (round-1 verdict item 3, redone post-fixes)
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while [ -f /tmp/queue_r2b.pid ] && kill -0 "$(cat /tmp/queue_r2b.pid)" 2>/dev/null; do
  sleep 60
done
timeout 5400 python -u scripts/bench_attn_pipe.py
timeout 14400 python -u scripts/serving_probe.py --qps 0.25,0.35,0.45 \
    --num 14 --steps 30 --deep-interval 3 --batch-buckets 2,4,8 \
    --out exp/serving_sdxl_v5e_r2.json
echo QUEUE_R2C_DONE
