#!/bin/bash
# Chained after tpu_queue_r2g.sh: instrumented serving rerun — one slow
# qps point with the per-iteration schedule log to localize where the
# small-rolling-batch passes lose their time.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while [ -f /tmp/queue_r2g.pid ] && kill -0 "$(cat /tmp/queue_r2g.pid)" 2>/dev/null; do
  sleep 60
done
timeout 7200 python -u scripts/serving_probe.py --qps 0.25 --num 10 \
    --steps 30 --deep-interval 3 --batch-buckets 2,4,8 --collect \
    --out exp/serving_sdxl_v5e_r2_diag.json
echo QUEUE_R2H_DONE
