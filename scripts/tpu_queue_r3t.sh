#!/bin/bash
# Round-3 queue r3t: the next SDXL serving ladder rung — boundary-1 FIXED
# interval 12 (projected (830+11*50)/12 ~ 115 ms warm => ~2.3 img/s/chip
# under load).  Quality first at full size (fixed-12 cadence), then the
# serving probe (with the new rinse pass) at qps 0.7 and 1.1.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 7200 python -u scripts/cache_quality.py --family sdxl --steps 30 \
    --batch 2 --seeds 2 --deep-boundary 1 \
    --deep "" --deep-adaptive "" --compact "" --fine "" \
    --hybrid 0.3 --hybrid-pairwise --hybrid-threshold 999 \
    --hybrid-predict 0.5 --max-interval 12 --warmup 3 \
    --out exp/cache_quality_sdxl_bdy1_fixed12_full_v5e.json \
    > /tmp/cq_bdy1_fixed12.log 2>&1
timeout 14400 python -u scripts/serving_probe.py --qps 0.7,1.1 --num 16 \
    --steps 30 --deep-interval 12 --deep-hybrid 0.3 --deep-boundary 1 \
    --resolutions 1024 --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_bdy1_i12_v5e_r3t.json \
    > /tmp/serving_sdxl_bdy1_i12_r3t.log 2>&1
echo QUEUE_R3T_DONE
