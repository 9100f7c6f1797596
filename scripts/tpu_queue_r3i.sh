#!/bin/bash
# Round-3 queue r3i — runs AFTER r3h (waits on its pid):
# 1. The last SDXL ladder point: cap 30 (ONE full step per 30).  Quality
#    at full size first; bench regardless (the artifact records both).
# 2. Zero-env bench.py confirm at the NEW default (w1/t0.3/c20) so the
#    driver's BENCH_r03 number is reproduced before round end.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3h.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3h.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
timeout 7200 python -u scripts/cache_quality.py --family sdxl --steps 30 \
    --batch 2 --seeds 2 --deep-boundary 1 \
    --deep "" --deep-adaptive "" --compact "" --fine "" \
    --hybrid 0.3 --hybrid-pairwise --hybrid-threshold 0.3 \
    --hybrid-predict 0.5 --max-interval 30 --warmup 1 \
    --out exp/cache_quality_sdxl_bdy1_w1c30_full_v5e.json \
    > /tmp/cq_bdy1_w1c30.log 2>&1
BENCH_DEEP_BOUNDARY=1 BENCH_DEEP_ADAPTIVE=0.3 BENCH_DEEP_CAP=30 \
BENCH_DEEP_WARMUP=1 \
timeout 7200 python -u bench.py > /tmp/bench_sdxl_bdy1_w1c30.log 2>&1
timeout 7200 python -u bench.py > /tmp/bench_default_r3i.log 2>&1
echo QUEUE_R3I_DONE
