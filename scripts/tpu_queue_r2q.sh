#!/bin/bash
# Session-6 tail queue: one bench.py run at the NEW default (hybrid 0.3
# pairwise) so the driver's end-of-round bench hits a warm compile cache
# even if intermediate code changes shifted the HLO fingerprint, and the
# default-config artifact exists under its own name.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while kill -0 "$(cat /tmp/queue_r2p.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 30
timeout 7200 python -u bench.py \
    > /tmp/bench_default_r2q.json 2>/tmp/bench_default_r2q.log \
    && mv /tmp/bench_default_r2q.json exp/bench_sdxl_hybrid03p_default_v5e.json
echo QUEUE_R2Q_DONE
