#!/bin/bash
# Round-3 queue r3n — after r3m: serving-capacity push at boundary 1.
# The serving preset (fixed interval 3, bdy1) warm step is 355.2 ms; a
# fixed interval 6 halves the full-step frequency: avg ~(830+5*50)/6 =
# 180 ms => ~1.48 img/s/chip under load (3.3x anchor).  Quality first at
# FULL size (threshold 999 + cap 6 = fixed-6 cadence on the hybrid
# schedule), then the serving probe at interval 6.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3m.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3m.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 7200 python -u scripts/cache_quality.py --family sdxl --steps 30 \
    --batch 2 --seeds 2 --deep-boundary 1 \
    --deep "" --deep-adaptive "" --compact "" --fine "" \
    --hybrid 0.3 --hybrid-pairwise --hybrid-threshold 999 \
    --hybrid-predict 0.5 --max-interval 6 --warmup 3 \
    --out exp/cache_quality_sdxl_bdy1_fixed6_full_v5e.json \
    > /tmp/cq_bdy1_fixed6.log 2>&1
timeout 14400 python -u scripts/serving_probe.py --qps 0.45,0.7 --num 16 \
    --steps 30 --deep-interval 6 --deep-hybrid 0.3 --deep-boundary 1 \
    --resolutions 1024 --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_bdy1_i6_v5e_r3n.json \
    > /tmp/serving_sdxl_bdy1_i6_r3n.log 2>&1
echo QUEUE_R3N_DONE
