#!/bin/bash
# Round-2 session-9 queue (r2v): the two serving legs left over from r2u
# (the session ended before they ran; bench legs 1-2 completed and were
# committed in c1da96d).
# 1. SDXL hybrid serving rerun: r2t crashed RESOURCE_EXHAUSTED in the
#    prewarm decode (hybrid comp-state was live during postprocess; now
#    released first).
# 2. SD3 span serving rerun: r2t had 75% aborts from (a) blocking 23 s
#    host T5 prepares (now async + T5 row cache + one-pass pos+neg
#    encode) and (b) 3x step-time overprediction (now EMA-corrected).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 5
timeout 10800 python -u scripts/serving_probe.py --qps 0.35 --num 12 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --resolutions 1024 \
    --collect --out exp/serving_sdxl_hybrid_v5e_r2v.json \
    > /tmp/serving_hybrid_r2v.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.1 --num 8 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --sd3-deep-span 2:24 \
    --deep-interval 6 --collect \
    --out exp/serving_sd3_span_v5e_r2v.json \
    > /tmp/serving_sd3_span_r2v.log 2>&1
echo QUEUE_R2V_DONE
