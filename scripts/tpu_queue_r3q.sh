#!/bin/bash
# Round-3 queue r3q (final): saturation probe of the new SDXL serving
# preset (bdy1 interval-6, capacity ~1.23 img/s/chip): qps 0.9 and 1.1
# should show graceful shed above saturation (p99 pinned, aborts only).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3p.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3p.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 14400 python -u scripts/serving_probe.py --qps 0.9,1.1 --num 16 \
    --steps 30 --deep-interval 6 --deep-hybrid 0.3 --deep-boundary 1 \
    --resolutions 1024 --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_bdy1_i6_sat_v5e_r3q.json \
    > /tmp/serving_sdxl_bdy1_i6_sat_r3q.log 2>&1
echo QUEUE_R3Q_DONE
