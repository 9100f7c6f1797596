#!/bin/bash
# Round-3 queue r3o — after r3n: zero-env bench_sd3 confirm at the fixed
# 30-step default (the 10-step default silently under-reported the
# wide-span cache 1.9x: 37.1 ms vs the real 19.7).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3n.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3n.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 7200 python -u scripts/bench_sd3.py > /tmp/bench_sd3_default_r3o.log 2>&1
echo QUEUE_R3O_DONE
