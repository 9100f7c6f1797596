#!/bin/bash
# Round-3 queue r3d — runs AFTER r3c (waits on its pid):
# 1-2. FULL-SIZE SDXL cache-quality trajectories for the flipped default
#    (boundary 1, hybrid 0.3 pairwise, t0.2/cap15, predict 0.5) and the
#    boundary-default control at the same schedule.  The adjudication
#    rule (docs/DESIGN.md) requires the full-depth/width check for
#    candidates within 2x of the 0.01 bar — bdy1's 3-level-proxy 0.00629
#    qualifies.  b2 x 2 seeds x 30 steps; programs warm from the bench
#    runs.
# 3. SDXL boundary-1 SERVING candidate: conv-only shallow steps at the
#    serving preset (fixed interval 3 + hybrid rows).  If machine SLO
#    holds with zero aborts, the serving preset flips next round (rule
#    item 3 needs this artifact).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3c.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3c.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
timeout 7200 python -u scripts/cache_quality.py --family sdxl --steps 30 \
    --batch 2 --seeds 2 --deep-boundary 1 \
    --deep "" --deep-adaptive "" --compact "" --fine "" \
    --hybrid 0.3 --hybrid-pairwise --hybrid-threshold 0.2 \
    --hybrid-predict 0.5 --max-interval 15 \
    --out exp/cache_quality_sdxl_bdy1_t02c15_full_v5e.json \
    > /tmp/cq_bdy1_full.log 2>&1
timeout 7200 python -u scripts/cache_quality.py --family sdxl --steps 30 \
    --batch 2 --seeds 2 \
    --deep "" --deep-adaptive "" --compact "" --fine "" \
    --hybrid 0.3 --hybrid-pairwise --hybrid-threshold 0.2 \
    --hybrid-predict 0.5 --max-interval 15 \
    --out exp/cache_quality_sdxl_bdy2_t02c15_full_v5e.json \
    > /tmp/cq_bdy2_full.log 2>&1
timeout 14400 python -u scripts/serving_probe.py --qps 0.45 --num 16 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --deep-boundary 1 \
    --resolutions 1024 --collect \
    --out exp/serving_sdxl_bdy1_v5e_r3d.json \
    > /tmp/serving_sdxl_bdy1_r3d.log 2>&1
echo QUEUE_R3D_DONE
