#!/bin/bash
# Round-4 queue r4f (after r4e): policy chip controls rerun (VERDICT item
# 6) — the r4c legs crashed on the probe's machine-SLO table for
# profile-less baseline policies (fixed: serving_probe falls back to
# get_profile).  Same trace shape as esymred's saturating pass.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r4e.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4e.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 10800 python -u scripts/serving_probe.py --qps 1.5 \
    --num 16 --steps 30 --deep-interval 12 --deep-boundary 1 \
    --deep-row-warmup --resolutions 1024 --batch-buckets 1,2,4,8 \
    --policy fcfs_mixed --collect \
    --out exp/serving_sdxl_fcfs_ctrl_v5e_r4f.json \
    > /tmp/serving_sdxl_fcfs_r4f.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --qps 1.5 \
    --num 16 --steps 30 --deep-interval 12 --deep-boundary 1 \
    --deep-row-warmup --resolutions 1024 --batch-buckets 1,2,4,8 \
    --policy orca_resbyres --collect \
    --out exp/serving_sdxl_orca_ctrl_v5e_r4f.json \
    > /tmp/serving_sdxl_orca_r4f.log 2>&1
echo QUEUE_R4F_DONE
