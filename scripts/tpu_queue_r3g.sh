#!/bin/bash
# Round-3 queue r3g — runs AFTER r3f (waits on its pid):
# The full-size bdy1 quality margin is 138x (rel_mse 7.25e-5 vs the 0.01
# bar at 4/30 fulls — 3 warmup + 1 adaptive).  Fulls dominate the step
# budget (829 ms full vs ~50 ms conv-only shallow), so the next frontier
# points cut the WARMUP prefix: w2/t0.25/c15 (~3/30 fulls, projected
# ~128 ms avg = 1.87 img/s = 4.2x anchor) and w1/t0.3/c20 (~2/30,
# ~2.1 img/s).  Quality at FULL size first (same warm programs, minutes
# each); bench only the points that stay under the bar/10 (the early
# steps carry the largest drift — warmup cuts are where quality breaks
# first, so the margin gate is strict).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3f.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3f.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
timeout 7200 python -u scripts/cache_quality.py --family sdxl --steps 30 \
    --batch 2 --seeds 2 --deep-boundary 1 \
    --deep "" --deep-adaptive "" --compact "" --fine "" \
    --hybrid 0.3 --hybrid-pairwise --hybrid-threshold 0.25 \
    --hybrid-predict 0.5 --max-interval 15 --warmup 2 \
    --out exp/cache_quality_sdxl_bdy1_w2t025_full_v5e.json \
    > /tmp/cq_bdy1_w2.log 2>&1
timeout 7200 python -u scripts/cache_quality.py --family sdxl --steps 30 \
    --batch 2 --seeds 2 --deep-boundary 1 \
    --deep "" --deep-adaptive "" --compact "" --fine "" \
    --hybrid 0.3 --hybrid-pairwise --hybrid-threshold 0.3 \
    --hybrid-predict 0.5 --max-interval 20 --warmup 1 \
    --out exp/cache_quality_sdxl_bdy1_w1t03_full_v5e.json \
    > /tmp/cq_bdy1_w1.log 2>&1
BENCH_DEEP_BOUNDARY=1 BENCH_DEEP_ADAPTIVE=0.25 BENCH_DEEP_CAP=15 \
BENCH_DEEP_WARMUP=2 \
timeout 7200 python -u bench.py > /tmp/bench_sdxl_bdy1_w2.log 2>&1
BENCH_DEEP_BOUNDARY=1 BENCH_DEEP_ADAPTIVE=0.3 BENCH_DEEP_CAP=20 \
BENCH_DEEP_WARMUP=1 \
timeout 7200 python -u bench.py > /tmp/bench_sdxl_bdy1_w1.log 2>&1
echo QUEUE_R3G_DONE
