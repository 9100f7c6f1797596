#!/bin/bash
# Round-4 queue r4b (after r4a): the DELIVERED-latency axis.
# 1. SDXL row-warm + PARTIAL CHUNK (steps_per_dispatch 3): chunks now stay
#    engaged under rolling admissions (_plan_partial_chunk — the r3r chunk
#    leg regressed because any in-warmup row made full-boundary chunks
#    ineligible and the pass ran RTT-bound per-step).  Target: e2e
#    (H100-table) SLO > 0.5 at the preset, like SD1.5's 0.81.
# 2. SD3 deeper chunks at the serving preset (VERDICT r3 item 8): span
#    1:24 @16 with k=8 any-phase chunks against the 30 s 1024^2 deadline
#    (r3j p50 was 46-67 s at k=6/@30; @16 + k=8 halves dispatch count).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r4d.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4d.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
# Scan-mode control: PLAIN deep bdy1 i12 with zero dispatch overhead —
# pins the device-only shallow cost against the probe's 149 ms dispatched
# figure (separates device vs relay-dispatch in the serving numbers).
BENCH_DEEP_HYBRID=0 BENCH_DEEP_ADAPTIVE=0 BENCH_DEEP=12 \
BENCH_DEEP_BOUNDARY=1 BENCH_REPEATS=2 \
timeout 7200 python -u bench.py > /tmp/bench_plain_i12_bdy1_r4b.log 2>&1
cp /tmp/bench_plain_i12_bdy1_r4b.log exp/bench_sdxl_plain_i12_bdy1_v5e_r4b.log
timeout 14400 python -u scripts/serving_probe.py --qps 1.1,1.5 \
    --num 16 --steps 30 --deep-interval 12 --deep-boundary 1 \
    --deep-row-warmup --steps-per-dispatch 3 --resolutions 1024 \
    --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_rowwarm_chunk_v5e_r4b.json \
    > /tmp/serving_sdxl_rowwarm_chunk_r4b.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.2,0.3 --num 16 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --sd3-deep-span 1:24 \
    --deep-interval 16 --steps-per-dispatch 8 --collect \
    --out exp/serving_sd3_span16_k8_v5e_r4b.json \
    > /tmp/serving_sd3_span16_k8_r4b.log 2>&1
echo QUEUE_R4B_DONE
