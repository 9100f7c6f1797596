#!/bin/bash
# Round-3 queue r3m — after r3l: zero-env confirms for the flipped SD1.5
# (bdy1 w1/t0.3/c30) and SD3 (span 1:24@30) bench defaults.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3l.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3l.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 7200 python -u scripts/bench_sd15.py > /tmp/bench_sd15_default_r3m.log 2>&1
timeout 7200 python -u scripts/bench_sd3.py > /tmp/bench_sd3_default_r3m.log 2>&1
echo QUEUE_R3M_DONE
