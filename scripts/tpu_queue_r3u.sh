#!/bin/bash
# Round-3 queue r3u: serving ladder continues while it stays clean.
# 1. SDXL bdy1 fixed-24: avg (830+23*50)/24 ~ 82.5 ms => ~3.2 img/s/chip
#    under load if SLO holds.  Quality first.
# 2. SD1.5 bdy1 interval-12 probe (its i3 preset warm step is 115 ms;
#    i12 projects ~45 ms => ~5.9 img/s under load).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3t.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3t.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 7200 python -u scripts/cache_quality.py --family sdxl --steps 30 \
    --batch 2 --seeds 2 --deep-boundary 1 \
    --deep "" --deep-adaptive "" --compact "" --fine "" \
    --hybrid 0.3 --hybrid-pairwise --hybrid-threshold 999 \
    --hybrid-predict 0.5 --max-interval 24 --warmup 3 \
    --out exp/cache_quality_sdxl_bdy1_fixed24_full_v5e.json \
    > /tmp/cq_bdy1_fixed24.log 2>&1
timeout 14400 python -u scripts/serving_probe.py --qps 1.1,1.5 --num 16 \
    --steps 30 --deep-interval 24 --deep-hybrid 0.3 --deep-boundary 1 \
    --resolutions 1024 --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_bdy1_i24_v5e_r3u.json \
    > /tmp/serving_sdxl_bdy1_i24_r3u.log 2>&1
timeout 10800 python -u scripts/cache_quality.py --family sd15 --steps 30 \
    --batch 4 --seeds 2 --deep-boundary 1 \
    --deep "" --deep-adaptive "" --compact "" --fine "" \
    --hybrid 0.3 --hybrid-pairwise --hybrid-threshold 999 \
    --hybrid-predict 0.5 --max-interval 12 --warmup 3 \
    --out exp/cache_quality_sd15_bdy1_fixed12_full_v5e.json \
    > /tmp/cq_sd15_fixed12.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd15 \
    --resolutions 512 --qps 2.5,4.0 --num 16 --steps 30 \
    --deep-interval 12 --deep-hybrid 0.3 --deep-boundary 1 \
    --steps-per-dispatch 3 --collect \
    --out exp/serving_sd15_bdy1_i12_v5e_r3u.json \
    > /tmp/serving_sd15_bdy1_i12_r3u.log 2>&1
echo QUEUE_R3U_DONE
