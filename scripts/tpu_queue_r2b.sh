#!/bin/bash
# Chained after tpu_queue_r2.sh: grouped-isolation SD3 profiler (the r2
# queue grabbed the slot when the per-point profiler was superseded).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while [ -f /tmp/queue_r2.pid ] && kill -0 "$(cat /tmp/queue_r2.pid)" 2>/dev/null; do
  sleep 60
done
timeout 10800 python -u -m sduss_tpu.scheduler.profiler --family sd3 \
    --encoders-on-host --isolate group \
    --out-profile exp/profile_sd3_v5e.json \
    --out-predictor exp/predictor_sd3_v5e.npz
echo QUEUE_R2B_DONE
