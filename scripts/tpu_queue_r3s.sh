#!/bin/bash
# Round-3 queue r3s: SD1.5 boundary-1 serving retry WITH the first-call
# jit instrumentation — the r3p 64.8 s mid-pass stall will name its key.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 10800 python -u scripts/serving_probe.py --model sd15 \
    --resolutions 512 --qps 1.5,2.5 --num 16 --steps 30 \
    --deep-interval 3 --deep-hybrid 0.3 --deep-boundary 1 \
    --steps-per-dispatch 3 --collect \
    --out exp/serving_sd15_bdy1_v5e_r3s.json \
    > /tmp/serving_sd15_bdy1_r3s.log 2>&1
echo QUEUE_R3S_DONE
