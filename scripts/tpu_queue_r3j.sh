#!/bin/bash
# Round-3 queue r3j — runs AFTER r3i (waits on its pid):
# SD3 span@30 serving RETRY behind the EMA outlier-cut fix.  The r3e leg
# collapsed (69% aborts, machine SLO 0.25) because its probe predated the
# fix: at interval 30 a legitimate FULL step is ~11.8x the averaged
# prediction, the old fixed 4x cut dropped every full as an "outlier",
# the correction decayed to the shallow-only cost and the slack math
# over-admitted — exactly the failure the round-3 self-review predicted.
# The cut now primes to max(6, 2/cache_factor) = ~23.6 at @30.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3i.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3i.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.2 --num 16 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --sd3-deep-span 1:24 \
    --deep-interval 30 --steps-per-dispatch 6 --collect \
    --out exp/serving_sd3_span130_chunk_v5e_r3j.json \
    > /tmp/serving_sd3_span130_r3j.log 2>&1
echo QUEUE_R3J_DONE
