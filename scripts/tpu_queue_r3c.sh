#!/bin/bash
# Round-3 session-1 queue (r3c) — serving legs for VERDICT items 1/4/7:
# 1. SDXL hybrid interval-3 serving at SATURATING qps (0.45 = the anchor
#    capacity, 0.6 = beyond): the headline-cache serving artifact at a load
#    that exercises admission/abort, extending the clean single-point r2z
#    pass (qps 0.35, 100% machine SLO).
# 2. SD1.5 serving rerun behind the EMA-priming fix
#    (profiles.cache_step_factor: the r2w cold-start overprediction starved
#    admissions at b3) + fused 3-step dispatch for the RTT-bound short
#    step.  VERDICT item 4.
# 3. SD1.5 MIXED 256/512/768 pass — the reference's first-class SD1.5
#    configuration (reference scripts/env.sh:12-15).
# 4. SD3 span@12 chunked serving scale-up: 16 requests, 2 qps points.
#    VERDICT item 7.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/bench_r3c.pid ]; then
  while kill -0 "$(cat /tmp/bench_r3c.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
timeout 14400 python -u scripts/serving_probe.py --qps 0.45,0.6 --num 16 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --resolutions 1024 \
    --collect --out exp/serving_sdxl_hybrid_sat_v5e_r3c.json \
    > /tmp/serving_sdxl_hybrid_sat_r3c.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd15 \
    --resolutions 512 --qps 1.0,1.5 --num 16 --steps 30 \
    --deep-interval 3 --steps-per-dispatch 3 --collect \
    --out exp/serving_sd15_chunk_v5e_r3c.json \
    > /tmp/serving_sd15_chunk_r3c.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd15 \
    --resolutions 256,512,768 --qps 1.0 --num 18 --steps 30 \
    --deep-interval 3 --mixed-prewarm auto --collect \
    --out exp/serving_sd15_mixed_v5e_r3c.json \
    > /tmp/serving_sd15_mixed_r3c.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.1,0.2 --num 16 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --sd3-deep-span 1:24 \
    --deep-interval 12 --steps-per-dispatch 3 --collect \
    --out exp/serving_sd3_span124_chunk_v5e_r3c.json \
    > /tmp/serving_sd3_chunk_r3c.log 2>&1
echo QUEUE_R3C_DONE
