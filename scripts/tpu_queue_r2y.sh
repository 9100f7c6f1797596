#!/bin/bash
# Round-2 session-10 queue (r2y):
# 1. SD3 dense WIDE-SPAN interval ladder (the new frontier from
#    exp/cache_quality_sd3_spanwide_tiny.json: span 1:24 at intervals
#    6-16 is 7-20x quality-tighter than the shipped 2:24@3+compact0.5
#    default at the real 24-block depth, and faster by estimate).
#    BENCH_SD3_STEPS=30 realizes the true full fraction; the interval is
#    a traced scalar so all four legs share one compiled program.
# 2. Current default rerun at STEPS=30 for apples-to-apples timing.
# 3. SDXL hybrid serving probe rerun behind the proactive prewarm
#    capacity gate (r2w leg died: caught b12 OOM poisoned the process).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
for ITV in 6 8 12 16; do
  BENCH_SD3_STEPS=30 BENCH_SD3_DEEP=1:24 BENCH_SD3_CACHE=0 \
  BENCH_SD3_DEEP_INTERVAL=$ITV \
  timeout 7200 python -u scripts/bench_sd3.py \
      > /tmp/bench_sd3_span124_i$ITV.json 2>/tmp/bench_sd3_span124_i$ITV.log \
      && cp /tmp/bench_sd3_span124_i$ITV.json \
           exp/bench_sd3_v5e_span124_i$ITV.json
done
BENCH_SD3_STEPS=30 \
timeout 7200 python -u scripts/bench_sd3.py \
    > /tmp/bench_sd3_default30.json 2>/tmp/bench_sd3_default30.log \
    && cp /tmp/bench_sd3_default30.json exp/bench_sd3_v5e_default_steps30.json
timeout 10800 python -u scripts/serving_probe.py --qps 0.35 --num 12 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --resolutions 1024 \
    --collect --out exp/serving_sdxl_hybrid_v5e_r2y.json \
    > /tmp/serving_hybrid_r2y.log 2>&1
echo QUEUE_R2Y_DONE
