#!/bin/bash
# Round-2 session-6 queue, part 2 (after r2o).  Info-per-chip-minute order:
#  1. bench.py at the NEW default (deep x compact hybrid 0.5): records the
#     headline artifact AND prewarms the compile cache for the driver's
#     end-of-round bench run (mk_state0 moved inside the trace, so the
#     program changed since the r2o hybrid legs).
#  2. Pairwise (CFG-pair-symmetric) hybrid A/B: 0.5 pairwise should match
#     0.5 independent on PERF (same row count; selection differs) — a
#     parity check before any default flip; 0.3 pairwise is the 1.82x
#     claim IF the tiny quality harness clears it (run locally first;
#     gate on exp/cache_quality_sdxl_hybrid_pairwise_tiny.json).
#  3. SD3 serving probe at its best cache config (compact token 0.5,
#     119.5 ms/step device-side) with the composition state store +
#     anchoring sync — the serving-level SD3 evidence the r2n leg never
#     produced (it OOMed on per-request rows; VERDICT weak #2 analog).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while kill -0 "$(cat /tmp/queue_r2o.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 30
timeout 7200 python -u bench.py \
    > /tmp/bench_hybrid_default.json 2>/tmp/bench_hybrid_default.log \
    && mv /tmp/bench_hybrid_default.json exp/bench_sdxl_hybrid_default_v5e.json
BENCH_DEEP_HYBRID=0.5 BENCH_HYBRID_PAIRWISE=1 timeout 7200 python -u bench.py \
    > /tmp/bench_hyb05p.json 2>/tmp/bench_hyb05p.log \
    && mv /tmp/bench_hyb05p.json exp/bench_sdxl_hybrid05_pairwise_v5e.json
BENCH_DEEP_HYBRID=0.3 BENCH_HYBRID_PAIRWISE=1 timeout 7200 python -u bench.py \
    > /tmp/bench_hyb03p.json 2>/tmp/bench_hyb03p.log \
    && mv /tmp/bench_hyb03p.json exp/bench_sdxl_hybrid03_pairwise_v5e.json
# b8 tiny quality frontier (cache_quality_sdxl_hybrid{_pairwise,}_b8_tiny):
# 0.3-indep 0.00587 (too loose) / 0.3-pair 0.00341 / 0.4 0.00306 /
# 0.5 0.00277 vs adaptive 0.00248 and the round-1 fixed-3 default 0.0040
# -> 0.4 is the candidate default sweet spot; bench it too.
BENCH_DEEP_HYBRID=0.4 BENCH_HYBRID_PAIRWISE=1 timeout 7200 python -u bench.py \
    > /tmp/bench_hyb04p.json 2>/tmp/bench_hyb04p.log \
    && mv /tmp/bench_hyb04p.json exp/bench_sdxl_hybrid04_pairwise_v5e.json
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.05,0.1 --num 8 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --cache-mode compact \
    --cache-fraction 0.5 --collect \
    --out exp/serving_sd3_v5e_r2p.json
#  4. Serving-level SDXL with the hybrid: FIXED interval 3 (the rolling-
#     admission-friendly schedule per exp/sim_adaptive_serving.json)
#     composed with hybrid row gating 0.5 — cheaper shallow steps at the
#     fixed schedule's quality bound.  The serving-side evidence for the
#     new headline (VERDICT weak #2: the north star is img/s/chip under
#     load, not bench.py).
timeout 10800 python -u scripts/serving_probe.py --qps 0.35 --num 12 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.5 --resolutions 1024 \
    --collect --out exp/serving_sdxl_hybrid_v5e_r2p.json
echo QUEUE_R2P_DONE
