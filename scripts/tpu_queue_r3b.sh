#!/bin/bash
# Round-2 session-11 queue (r3b) — runs AFTER r3a (waits on its pid):
# 1. SDXL bdy1 long-interval candidate: boundary 1 + threshold 0.2/cap 15
#    (6/30 fulls at tiny rel_mse 0.00629, exp/cache_quality_sdxl_bdy1_
#    t02c15_tiny.json) -> projected (6*829+24*50)/30 = 206 ms = 1.30 img/s
#    = 2.88x anchor.  Fresh ~40 min relay compile.
# 2. SD3 span serving probe at the @12 bench default with fused 3-step
#    chunks (serving cadence through the relay is RTT-bound; chunks cut
#    host round trips 3x).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3a.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3a.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
BENCH_DEEP_BOUNDARY=1 BENCH_DEEP_ADAPTIVE=0.2 BENCH_DEEP_CAP=15 \
timeout 7200 python -u bench.py \
    > /tmp/bench_sdxl_bdy1_t02c15.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.1 --num 8 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --sd3-deep-span 1:24 \
    --deep-interval 12 --steps-per-dispatch 3 --collect \
    --out exp/serving_sd3_span124_chunk_v5e_r3b.json \
    > /tmp/serving_sd3_span124_r3b.log 2>&1
echo QUEUE_R3B_DONE
