#!/bin/bash
# Round-4 queue r4c (after r4b): the serving end-to-end evidence VERDICT r3
# called out.
# 1. MIXED-resolution serving at the current presets (VERDICT item 2): the
#    reference's core configuration (FCFS_Mixed is_sliced batches).  The
#    only prior mixed artifact predates every round-3 default (r2n-era
#    interval 3).  Hybrid preset config (mixed path has no row warmup);
#    auto composition prewarm capped by prewarm_mixed_limit, warm-key
#    routing covers the tail; buckets <= 8 (the r3d b12 OOM lesson).
# 2. LARGER-SCALE pass (VERDICT item 5): 64 requests at the SDXL preset,
#    one saturating QPS point — anchors the 500-request simulator claims
#    (abort behavior + p99 past saturation) on hardware.
# 3. Policy chip controls (VERDICT item 6): fcfs_mixed and orca_resbyres
#    on the SAME trace shape as esymred's saturating pass — the hardware
#    anchor for the sim's goodput margins.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r4b.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4b.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 21600 python -u scripts/serving_probe.py --qps 0.7,1.1 \
    --num 16 --steps 30 --deep-interval 12 --deep-hybrid 0.3 \
    --deep-boundary 1 --resolutions 512,768,1024 --mixed-prewarm auto \
    --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_mixed_preset_v5e_r4c.json \
    > /tmp/serving_sdxl_mixed_r4c.log 2>&1
timeout 14400 python -u scripts/serving_probe.py --qps 1.5 \
    --num 64 --steps 30 --deep-interval 12 --deep-boundary 1 \
    --deep-row-warmup --resolutions 1024 --batch-buckets 1,2,4,8 \
    --collect --out exp/serving_sdxl_scale64_v5e_r4c.json \
    > /tmp/serving_sdxl_scale64_r4c.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --qps 1.5 \
    --num 16 --steps 30 --deep-interval 12 --deep-boundary 1 \
    --deep-row-warmup --resolutions 1024 --batch-buckets 1,2,4,8 \
    --policy fcfs_mixed --collect \
    --out exp/serving_sdxl_fcfs_ctrl_v5e_r4c.json \
    > /tmp/serving_sdxl_fcfs_r4c.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --qps 1.5 \
    --num 16 --steps 30 --deep-interval 12 --deep-boundary 1 \
    --deep-row-warmup --resolutions 1024 --batch-buckets 1,2,4,8 \
    --policy orca_resbyres --collect \
    --out exp/serving_sdxl_orca_ctrl_v5e_r4c.json \
    > /tmp/serving_sdxl_orca_r4c.log 2>&1
echo QUEUE_R4C_DONE
