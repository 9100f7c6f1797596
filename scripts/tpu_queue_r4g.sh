#!/bin/bash
# Round-4 queue r4g (after r4f): the preset x fused-dispatch rungs + the
# zero-env bench confirm.  (Split out of r4e, whose script was edited
# while its shell was parked on the wait loop — the old lesson holds:
# never touch a queue script bash is still executing.)
set -x
cd /root/repo
# The baked packages live in /opt/venv — a bare shell's `python` is the
# package-less interpreter (cost one dead queue launch this session).
export PATH="/opt/venv/bin:$PATH"
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r4f.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4f.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 14400 python -u scripts/serving_probe.py --qps 1.1,1.5 \
    --num 16 --steps 30 --deep-interval 24 --deep-hybrid 0.3 \
    --deep-boundary 1 --deep-row-warmup --steps-per-dispatch 6 \
    --resolutions 1024 --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_preset_chunk6_v5e_r4g.json \
    > /tmp/serving_sdxl_preset_chunk6_r4g.log 2>&1
timeout 14400 python -u bench.py > /tmp/bench_default_r4g.log 2>&1
tail -1 /tmp/bench_default_r4g.log > exp/bench_sdxl_default_r4g.json || true
echo QUEUE_R4G_DONE
