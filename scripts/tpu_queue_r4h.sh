#!/bin/bash
# Round-4 queue r4h (after r4g): the delivered-axis chunk rung for the
# SD1.5 row-warm preset, plus the SD3 capacity-knee point between the
# r4b qps 0.2 (e2e SLO 1.0) and 0.3 (past the b<=2 knee) passes.
set -x
cd /root/repo
# The baked packages live in /opt/venv — a bare shell's `python` is the
# package-less interpreter (cost one dead queue launch this session).
export PATH="/opt/venv/bin:$PATH"
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r4g.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4g.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 10800 python -u scripts/serving_probe.py --model sd15 \
    --qps 2.5,4.0 --num 16 --steps 30 --deep-interval 12 \
    --deep-hybrid 0.3 --deep-boundary 1 --deep-row-warmup \
    --steps-per-dispatch 6 --resolutions 512 \
    --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sd15_preset_chunk6_v5e_r4h.json \
    > /tmp/serving_sd15_preset_chunk6_r4h.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.25 --num 16 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --sd3-deep-span 1:24 \
    --deep-interval 16 --steps-per-dispatch 8 --collect \
    --out exp/serving_sd3_span16_k8_qps025_v5e_r4h.json \
    > /tmp/serving_sd3_knee_r4h.log 2>&1
echo QUEUE_R4H_DONE
