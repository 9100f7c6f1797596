#!/bin/bash
# Round-2 session-7 queue C (chains after r2s): SD3 adaptive span-skip
# bench legs (tiny frontier: a0.005 beat fixed interval 3 on both axes;
# thresholds here scaled to the medium model's 0.0037/step drift), the
# SDXL hybrid serving rerun with the comp-state byte-budget OOM fix, and
# the SD3 span-deep serving probe.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while kill -0 "$(cat /tmp/queue_r2s.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 30
BENCH_SD3_DEEP=2:24 BENCH_SD3_DEEP_ADAPTIVE=0.003 BENCH_SD3_DEEP_CAP=6 \
    timeout 7200 python -u scripts/bench_sd3.py \
    > /tmp/bench_sd3_deep224_a003.json 2>/tmp/bench_sd3_deep224_a003.log \
    && mv /tmp/bench_sd3_deep224_a003.json \
          exp/bench_sd3_v5e_deep224_a003.json
BENCH_SD3_DEEP=2:24 BENCH_SD3_DEEP_ADAPTIVE=0.008 BENCH_SD3_DEEP_CAP=8 \
    timeout 7200 python -u scripts/bench_sd3.py \
    > /tmp/bench_sd3_deep224_a008.json 2>/tmp/bench_sd3_deep224_a008.log \
    && mv /tmp/bench_sd3_deep224_a008.json \
          exp/bench_sd3_v5e_deep224_a008.json
timeout 10800 python -u scripts/serving_probe.py --qps 0.35 --num 12 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --resolutions 1024 \
    --collect --out exp/serving_sdxl_hybrid_v5e_r2t.json \
    > /tmp/serving_hybrid_r2t.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.1 --num 8 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --sd3-deep-span 2:24 \
    --deep-interval 3 --collect \
    --out exp/serving_sd3_span_v5e_r2t.json \
    > /tmp/serving_sd3_span_r2t.log 2>&1
echo QUEUE_R2T_DONE
