#!/bin/bash
# Chained after tpu_queue_r2g.sh: serving sweep rerun with the bounded
# async-dispatch runahead fix (engine/worker.py _throttle) + schedule-log
# instrumentation to confirm honest cadence.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while [ -f /tmp/queue_r2g.pid ] && kill -0 "$(cat /tmp/queue_r2g.pid)" 2>/dev/null; do
  sleep 60
done
timeout 14400 python -u scripts/serving_probe.py --qps 0.25,0.35,0.45 \
    --num 14 --steps 30 --deep-interval 3 --batch-buckets 2,4,8 --collect \
    --out exp/serving_sdxl_v5e_r2.json
echo QUEUE_R2H_DONE
