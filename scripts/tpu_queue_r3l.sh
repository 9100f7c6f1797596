#!/bin/bash
# Round-3 queue r3l — after r3k: FULL-SIZE SD1.5 quality at the aggressive
# boundary-1 schedule.  The 4-level random-tiny proxy REJECTED it (0.0324)
# — but the full-size SDXL lesson is that the tiny proxy over-estimates
# ~90x (random tiny weights drift far harder than full-size ones).  If
# full-size sd15 quality clears the bar/10, bench the aggressive point.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3k.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3k.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 7200 python -u scripts/cache_quality.py --family sd15 --steps 30 \
    --batch 4 --seeds 2 --deep-boundary 1 \
    --deep "" --deep-adaptive "" --compact "" --fine "" \
    --hybrid 0.3 --hybrid-pairwise --hybrid-threshold 0.3 \
    --hybrid-predict 0.5 --max-interval 30 --warmup 1 \
    --out exp/cache_quality_sd15_bdy1_w1c30_full_v5e.json \
    > /tmp/cq_sd15_w1c30.log 2>&1
BENCH_DEEP_BOUNDARY=1 BENCH_DEEP_ADAPTIVE=0.3 BENCH_DEEP_CAP=30 \
BENCH_DEEP_WARMUP=1 \
timeout 7200 python -u scripts/bench_sd15.py \
    > /tmp/bench_sd15_bdy1_w1c30.log 2>&1
echo QUEUE_R3L_DONE
