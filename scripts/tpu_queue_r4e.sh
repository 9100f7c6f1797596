#!/bin/bash
# Round-4 queue r4e (after r4c): final-build confirms.
# 1. SDXL hybrid i24 row-warm RERUN on the carry-store build (the r4d i24
#    leg ran the pre-carry commit — this pins the headline serving
#    artifact to the final code).
# 2. Zero-env bench confirm (offline headline unchanged by the serving
#    work — guard against regressions from the deep-path refactor).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r4c.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4c.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do sleep 60; done
sleep 10
# Best-of-everything rung: the new preset (hybrid 0.3 bdy1 i24 row-warm)
# x fused k=6 dispatch — the r4b plain k=3 leg brought p50 to 20.9 s vs
# the ~19 s H100-table deadline; deeper chunks halve the dispatch count
# again.  NOTE: hybrid x row-warm chunks fall back per-step when the
# hybrid chunk is ineligible; the probe still measures the realized mix.
timeout 14400 python -u scripts/serving_probe.py --qps 1.1,1.5 \
    --num 16 --steps 30 --deep-interval 24 --deep-hybrid 0.3 \
    --deep-boundary 1 --deep-row-warmup --steps-per-dispatch 6 \
    --resolutions 1024 --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_preset_chunk6_v5e_r4e.json \
    > /tmp/serving_sdxl_preset_chunk6_r4e.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --qps 1.1,1.5 \
    --num 16 --steps 30 --deep-interval 24 --deep-boundary 1 \
    --deep-row-warmup --steps-per-dispatch 6 --resolutions 1024 \
    --batch-buckets 1,2,4,8 --collect \
    --out exp/serving_sdxl_plain_i24_chunk6_v5e_r4e.json \
    > /tmp/serving_sdxl_plain_i24_chunk6_r4e.log 2>&1
timeout 14400 python -u bench.py > /tmp/bench_default_r4e.log 2>&1
tail -1 /tmp/bench_default_r4e.log > exp/bench_sdxl_default_r4e.json || true
echo QUEUE_R4E_DONE
