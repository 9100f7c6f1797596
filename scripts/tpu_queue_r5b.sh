#!/bin/bash
# Round-5 queue r5b (after r4h): the remaining VERDICT r4 measurement legs.
# 1. MIXED serving with fused dispatch (VERDICT item 3): the new
#    denoise_chunk_mixed (any-phase in-graph interval schedule) at the
#    mixed preset (hybrid i12 bdy1; the mixed path has no row warmup),
#    k=6 chunks, auto composition prewarm (now also mints chunk programs).
# 2. Row-carry cadence quality at FULL SIZE (VERDICT item 6): phase-swept
#    hybrid fixed-interval schedule (batch-aligned expiry lands at
#    arbitrary request phase under row carry-over) — phase is traced, one
#    compile sweeps all phases.
# 3. Trace-matched policy control (VERDICT item 5): esymred at 16 requests
#    on the EXACT r4f control trace (generate_trace seed = int(qps*100) is
#    deterministic given qps/num/resolutions) and the same i12 row-warm
#    cache config the FCFS/Orca controls ran.
# 4. Serving scale past 64 (VERDICT item 4): one 128-request pass at the
#    SDXL preset spanning sub- and post-saturation QPS.
set -x
cd /root/repo
export PATH="/opt/venv/bin:$PATH"
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r4h.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4h.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
timeout 21600 python -u scripts/serving_probe.py --qps 0.7,1.1 \
    --num 16 --steps 30 --deep-interval 12 --deep-hybrid 0.3 \
    --deep-boundary 1 --steps-per-dispatch 6 \
    --resolutions 512,768,1024 --mixed-prewarm auto \
    --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_mixed_chunk6_v5e_r5b.json \
    > /tmp/serving_sdxl_mixed_chunk6_r5b.log 2>&1
timeout 14400 python -u scripts/cache_quality.py --family sdxl --batch 8 \
    --res 1024 --steps 30 --seeds 1 --deep "" --compact "" \
    --deep-adaptive "" --hybrid "" --cfg-reuse "" --deep-boundary 1 \
    --rowwarm-phases 0,3,8,13,18,23 --rowwarm-interval 24 \
    --rowwarm-fraction 0.3 --hybrid-pairwise \
    --out exp/cache_quality_sdxl_rowphase_full_v5e.json \
    > /tmp/cache_quality_rowphase_r5b.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --qps 1.5 \
    --num 16 --steps 30 --deep-interval 12 --deep-boundary 1 \
    --deep-row-warmup --resolutions 1024 --batch-buckets 1,2,4,8 \
    --policy esymred --collect \
    --out exp/serving_sdxl_esymred_ctrl16_v5e_r5b.json \
    > /tmp/serving_sdxl_esymred_ctrl16_r5b.log 2>&1
timeout 14400 python -u scripts/serving_probe.py --qps 0.9,1.5 \
    --num 128 --steps 30 --deep-interval 24 --deep-hybrid 0.3 \
    --deep-boundary 1 --deep-row-warmup --resolutions 1024 \
    --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_scale128_v5e_r5b.json \
    > /tmp/serving_sdxl_scale128_r5b.log 2>&1
echo QUEUE_R5B_DONE
