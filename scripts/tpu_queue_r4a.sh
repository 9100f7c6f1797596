#!/bin/bash
# Round-4 queue r4a: row-granular deep warmup (CacheConfig.deep_row_warmup)
# on chip — the round-3 serving floor breaker.
#
# Background: the serving interval ladder saturated at ~184 ms warm step
# because deep warmup was BATCH-wide — every admission dragged the whole
# batch through full passes, flooring realized fulls at ~10% regardless of
# interval (exp/serving_sdxl_bdy1_i24_v5e_r3u.json: i24 == i12).  The
# partial program warms only the admitted rows (models/unet.py _deep_tail;
# pipelines/base.py mode "partial"), so the steady state under rolling
# admissions becomes shallow + ~(batch/interval) row refreshes per step:
# projected ~115 ms at i12 and ~82 ms at i24 (full 830 / conv-only shallow
# ~50 ms at b8).  Quality needs no new run: each request sees EXACTLY the
# fixed-interval cadence already adjudicated at full size
# (exp/cache_quality_sdxl_bdy1_fixed12_full_v5e.json 6.64e-5, fixed24
# artifact same ladder 7-9e-5).
#
# Legs (compile note: partial kb keys are ~6 new full-size SDXL compiles
# ~15-25 min each cold through the relay, cached afterwards; the i24 leg
# reuses i12's keys — interval is host-side, zero extra compiles):
# 1. SDXL bdy1 i12 plain-deep + row warmup, qps 0.7/1.1/1.5 (r3t mirror).
# 2. SDXL bdy1 i24 row warmup, qps 1.1/1.5 (the rung that was floored).
# 3. SD1.5 bdy1 i12 row warmup, qps 2.5/4.0 (r3u mirror).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 21600 python -u scripts/serving_probe.py --qps 0.7,1.1,1.5 \
    --num 16 --steps 30 --deep-interval 12 --deep-boundary 1 \
    --deep-row-warmup --resolutions 1024 --batch-buckets 1,2,4,8 \
    --collect --out exp/serving_sdxl_bdy1_i12_rowwarm_v5e_r4a.json \
    > /tmp/serving_sdxl_rowwarm_i12_r4a.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --qps 1.1,1.5 \
    --num 16 --steps 30 --deep-interval 24 --deep-boundary 1 \
    --deep-row-warmup --resolutions 1024 --batch-buckets 1,2,4,8 \
    --collect --out exp/serving_sdxl_bdy1_i24_rowwarm_v5e_r4a.json \
    > /tmp/serving_sdxl_rowwarm_i24_r4a.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd15 \
    --qps 2.5,4.0 --num 16 --steps 30 --deep-interval 12 \
    --deep-boundary 1 --deep-row-warmup --resolutions 512 \
    --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sd15_bdy1_i12_rowwarm_v5e_r4a.json \
    > /tmp/serving_sd15_rowwarm_i12_r4a.log 2>&1
echo QUEUE_R4A_DONE
