#!/bin/bash
# Round-4 queue r4d (replaces the aborted r4a tail): the HYBRID x row-warmup
# serving ladder with composition row carry-over.
#
# r4a findings that shaped this (exp/serving_sdxl_bdy1_i12_rowwarm_v5e_r4a
# + the uncontended i24 windows): plain-deep bdy1 shallow costs 149 ms at
# b8 (not the 50 ms the 0.06 profile ratio implied — that ratio came from
# HYBRID-gated shallows), one-request deep tails run ~1.8x/row less
# efficiently than the batched tail (aligned 177.3 vs staggered 201.2 ms at
# i24), so interval expiry stays batch-aligned and partial programs serve
# only admissions; and the HYBRID's 0.3-gated shallow (~125 ms dispatched)
# is the cheap shallow worth pairing with row warmup.  This queue measures
# hybrid x partial x carry-over — admissions no longer force anchoring
# fulls (pipelines/base.py _hybrid_entry_carry).
#
# Projections at b8 (full 830 / hybrid shallow ~125): i12 aligned warm
# ~184 ms (same as r3t's number, but realized serving fulls drop from the
# ~10% warmup floor to 2/24); i24 ~154 ms => ~1.8 img/s/chip device
# capacity.  Quality artifacts already exist at BOTH cadences (hybrid
# fixed-12 6.64e-5 / fixed-24 ~7-9e-5, full size, r3t/r3u).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
# Per-mode microbench FIRST (fast, warm keys): pins the dispatched cost of
# shallow / partial(kb=1) / full for both hybrid and plain configs — the
# r4d leg-1 pass implied a ~790 ms effective hybrid partial; attribute it.
timeout 7200 python -u scripts/bench_step_modes.py --model sdxl \
    --res 1024 --batch 8 --steps 12 --deep-interval 24 --deep-boundary 1 \
    --deep-hybrid 0.3 --out exp/bench_step_modes_sdxl_hybrid_v5e.json \
    > /tmp/bench_step_modes_hybrid.log 2>&1
timeout 7200 python -u scripts/bench_step_modes.py --model sdxl \
    --res 1024 --batch 8 --steps 12 --deep-interval 24 --deep-boundary 1 \
    --out exp/bench_step_modes_sdxl_plain_v5e.json \
    > /tmp/bench_step_modes_plain.log 2>&1
timeout 21600 python -u scripts/serving_probe.py --qps 1.1,1.5 \
    --num 16 --steps 30 --deep-interval 24 --deep-hybrid 0.3 \
    --deep-boundary 1 --deep-row-warmup --resolutions 1024 \
    --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_hybrid_i24_rowwarm_v5e_r4d.json \
    > /tmp/serving_sdxl_hyb_i24_rowwarm_r4d.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --qps 1.1,1.5 \
    --num 16 --steps 30 --deep-interval 12 --deep-hybrid 0.3 \
    --deep-boundary 1 --deep-row-warmup --resolutions 1024 \
    --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_hybrid_i12_rowwarm_v5e_r4d.json \
    > /tmp/serving_sdxl_hyb_i12_rowwarm_r4d.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd15 \
    --qps 2.5,4.0 --num 16 --steps 30 --deep-interval 12 \
    --deep-hybrid 0.3 --deep-boundary 1 --deep-row-warmup \
    --resolutions 512 --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sd15_hybrid_i12_rowwarm_v5e_r4d.json \
    > /tmp/serving_sd15_hyb_i12_rowwarm_r4d.log 2>&1
echo QUEUE_R4D_DONE
