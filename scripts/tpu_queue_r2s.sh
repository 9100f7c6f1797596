#!/bin/bash
# Round-2 session-7 queue B: SD3 span-skip deep cache on chip (the new
# lever from exp/cache_quality_sd3_deepspan*_tiny.json — ANY span at
# interval 3 is ~2.5e-5 rel_mse, 40x tighter than fine-0.5; wide spans
# hold to 4.5e-5).  Legs 1-3 map the latency/quality frontier; leg 4 is
# the compact-full hybrid; leg 5 is the SD1.5 family bench (absolute
# number, scripts/bench_sd15.py rationale).  Chains after queue_r2r.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while kill -0 "$(cat /tmp/queue_r2r.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 30
BENCH_SD3_DEEP=2:24 BENCH_SD3_DEEP_INTERVAL=3 timeout 7200 \
    python -u scripts/bench_sd3.py \
    > /tmp/bench_sd3_deep224_i3.json 2>/tmp/bench_sd3_deep224_i3.log \
    && mv /tmp/bench_sd3_deep224_i3.json exp/bench_sd3_v5e_deep224_i3.json
BENCH_SD3_DEEP=2:24 BENCH_SD3_DEEP_INTERVAL=6 timeout 7200 \
    python -u scripts/bench_sd3.py \
    > /tmp/bench_sd3_deep224_i6.json 2>/tmp/bench_sd3_deep224_i6.log \
    && mv /tmp/bench_sd3_deep224_i6.json exp/bench_sd3_v5e_deep224_i6.json
BENCH_SD3_DEEP=13:24 BENCH_SD3_DEEP_INTERVAL=3 timeout 7200 \
    python -u scripts/bench_sd3.py \
    > /tmp/bench_sd3_deep1324_i3.json 2>/tmp/bench_sd3_deep1324_i3.log \
    && mv /tmp/bench_sd3_deep1324_i3.json exp/bench_sd3_v5e_deep1324_i3.json
BENCH_SD3_DEEP=2:24 BENCH_SD3_DEEP_INTERVAL=6 BENCH_SD3_CACHE=0.5 \
    timeout 7200 python -u scripts/bench_sd3.py \
    > /tmp/bench_sd3_deep224_i6_c05.json 2>/tmp/bench_sd3_deep224_i6_c05.log \
    && mv /tmp/bench_sd3_deep224_i6_c05.json \
          exp/bench_sd3_v5e_deep224_i6_compact05.json
timeout 7200 python -u scripts/bench_sd15.py \
    > /tmp/bench_sd15_default.json 2>/tmp/bench_sd15_default.log \
    && mv /tmp/bench_sd15_default.json exp/bench_sd15_default_v5e.json
echo QUEUE_R2S_DONE
