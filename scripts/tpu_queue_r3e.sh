#!/bin/bash
# Round-3 queue r3e — runs AFTER r3d (waits on its pid):
# 1. SD1.5 boundary-1 bench A/B at the SHIPPED schedule (t0.05/cap6):
#    the 4-level SD1.5-structure proxy PASSES bdy1 there (rel_mse
#    0.00676 < 0.01, exp/cache_quality_sd15proxy_bdy1_t005c6_tiny.json)
#    but REJECTS the SDXL-winner schedule t0.2/cap15 (0.0324) — so only
#    the boundary flips, not the schedule, per the adjudication rule.
# 2. SD3 span@30 serving probe at the new bench default (chunked
#    dispatch): the interval-30 point has no serving artifact yet.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3d.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3d.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
BENCH_DEEP_BOUNDARY=1 \
timeout 7200 python -u scripts/bench_sd15.py \
    > /tmp/bench_sd15_bdy1.log 2>&1
timeout 7200 python -u scripts/bench_sd15.py \
    > /tmp/bench_sd15_default_r3e.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.2 --num 16 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --sd3-deep-span 1:24 \
    --deep-interval 30 --steps-per-dispatch 6 --collect \
    --out exp/serving_sd3_span130_chunk_v5e_r3e.json \
    > /tmp/serving_sd3_span130_r3e.log 2>&1
echo QUEUE_R3E_DONE
