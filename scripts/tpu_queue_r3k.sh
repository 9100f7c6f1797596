#!/bin/bash
# Round-3 queue r3k — after r3j: zero-env bench.py confirm at the cap-30
# default (ONE full step per 30; the driver's BENCH_r03 must reproduce).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3j.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3j.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 7200 python -u bench.py > /tmp/bench_default_r3k.log 2>&1
echo QUEUE_R3K_DONE
