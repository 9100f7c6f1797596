#!/bin/bash
# Round-3 queue r3p — after r3o: SD1.5 serving at the flipped boundary-1
# serving preset (fixed interval 3, hybrid rows, fused 3-step dispatch).
# The r3c artifact (100% machine SLO at qps 1.5, warm 137 ms) predates
# the boundary flip; bdy1 should cut the warm step toward ~70-90 ms and
# raise the saturation qps.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3o.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3o.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 10800 python -u scripts/serving_probe.py --model sd15 \
    --resolutions 512 --qps 1.5,2.5 --num 16 --steps 30 \
    --deep-interval 3 --deep-hybrid 0.3 --deep-boundary 1 \
    --steps-per-dispatch 3 --collect \
    --out exp/serving_sd15_bdy1_v5e_r3p.json \
    > /tmp/serving_sd15_bdy1_r3p.log 2>&1
echo QUEUE_R3P_DONE
