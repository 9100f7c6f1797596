#!/bin/bash
# Round-3 queue r3h — runs AFTER r3g (waits on its pid):
# SDXL boundary-1 SERVING retry with buckets capped at 8.  The r3d
# attempt OOMed at the b12 1024^2 prewarm — the bdy1 hybrid state is
# smaller than bdy2's, so the proactive capacity estimate (params +
# state + fixed margin) passed a bucket whose step WORKSPACE it can't
# cover; the new fail-fast error surfaced it immediately instead of a
# poisoned limp.  b8 is the measured throughput sweet spot anyway.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3g.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3g.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
timeout 14400 python -u scripts/serving_probe.py --qps 0.45 --num 16 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --deep-boundary 1 \
    --resolutions 1024 --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_bdy1_v5e_r3h.json \
    > /tmp/serving_sdxl_bdy1_r3h.log 2>&1
echo QUEUE_R3H_DONE
