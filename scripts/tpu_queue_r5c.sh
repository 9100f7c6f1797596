#!/bin/bash
# Round-5 queue r5c (after r5b): rerun the SDXL preset x k=6 chunk leg with
# ASYNC POSTPROCESS live (EngineConfig.async_postprocess, built from the
# r4g decomposition: 25-39% of makespan was the serial b8 decode + image
# fetch blocking the loop).  Programs are warm from the r4g run — this is
# a cheap delivered-axis A/B against exp/serving_sdxl_preset_chunk6_v5e_
# r4g.json.
set -x
cd /root/repo
export PATH="/opt/venv/bin:$PATH"
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r5b.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5b.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 10800 python -u scripts/serving_probe.py --qps 1.1,1.5 \
    --num 16 --steps 30 --deep-interval 24 --deep-hybrid 0.3 \
    --deep-boundary 1 --deep-row-warmup --steps-per-dispatch 6 \
    --resolutions 1024 --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_preset_chunk6_asyncpost_v5e_r5c.json \
    > /tmp/serving_sdxl_chunk6_asyncpost_r5c.log 2>&1
echo QUEUE_R5C_DONE
