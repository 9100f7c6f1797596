#!/bin/bash
# Round-2 session-3 chip queue (supersedes r2k).  Waits for the axon relay,
# then runs in info-per-chip-minute order, one TPU python at a time
# (CLAUDE.md):
#  1. bench.py adaptive-deep A/B at thresholds 0.05 / 0.1 vs the fixed
#     interval-3 headline — drift-triggered refresh measured ~6x less
#     trajectory divergence at fewer full steps on the tiny harness
#     (exp/cache_quality_sdxl_adaptive_tiny.json); if the realized full
#     fraction lands near the projection (~0.30 vs 0.40) this is a new
#     headline at BETTER quality.
#  2. SDXL uniform serving sweep (bounded runahead + prewarm + phase-aligned
#     admission) — the north-star img/s-chip-under-load number.
#  3. SDXL serving probe with adaptive refresh at one qps point (A/B vs 2).
#  4. attention pipe / bf16-scores A/B at production shapes.
#  5. SD3 dense step with the pipelined schedule (separate output file).
#  6. SD3 compact 0.35 (linear cost model predicts ~85 ms).
#  7. SD3 1024 serving probe, per-token fine cache 0.5.
#  8. SDXL mixed-resolution serving probe with composition prewarm.
# tee is never pointed at a good artifact (it truncates at start).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 30
# bench.py prints '# ...' progress lines before the one JSON line — keep
# only the JSON in the exp artifact (full log stays in /tmp)
BENCH_DEEP_ADAPTIVE=0.05 timeout 5400 python -u bench.py \
    > /tmp/bench_a05.log \
    && tail -1 /tmp/bench_a05.log > exp/bench_sdxl_adaptive05_v5e.json
BENCH_DEEP_ADAPTIVE=0.1 timeout 3600 python -u bench.py \
    > /tmp/bench_a10.log \
    && tail -1 /tmp/bench_a10.log > exp/bench_sdxl_adaptive10_v5e.json
timeout 14400 python -u scripts/serving_probe.py --qps 0.25,0.35,0.45 \
    --num 14 --steps 30 --deep-interval 3 --batch-buckets 2,4,8 --collect \
    --out exp/serving_sdxl_v5e_r2.json
timeout 7200 python -u scripts/serving_probe.py --qps 0.35 \
    --num 14 --steps 30 --deep-interval 6 --deep-adaptive 0.05 \
    --batch-buckets 2,4,8 --collect \
    --out exp/serving_sdxl_adaptive_v5e_r2.json
timeout 3600 python -u scripts/bench_attn_pipe.py
SDUSS_ATTN_PIPE=1 timeout 5400 python -u scripts/bench_sd3.py \
    > /tmp/sd3_pipe.json && mv /tmp/sd3_pipe.json exp/bench_sd3_v5e_r2_pipe.json
# compact 0.35: linear cost model predicts ~85 ms (246.5 dense, 119.5 at
# 0.5, zero fixed cost); quality bound rel_mse 0.0086 at 0.3 (cache_quality)
BENCH_SD3_CACHE=0.35 timeout 5400 python -u scripts/bench_sd3.py \
    > /tmp/sd3_c35.json && mv /tmp/sd3_c35.json exp/bench_sd3_v5e_r2_compact35.json
timeout 7200 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.05,0.1 --num 8 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --cache-mode fine \
    --cache-fraction 0.5 --collect --out exp/serving_sd3_v5e_r2.json
timeout 10800 python -u scripts/serving_probe.py --qps 0.3 --num 12 \
    --steps 30 --deep-interval 3 --batch-buckets 2,4,8 \
    --resolutions 512,1024 --mixed-prewarm "512:2,1024:2;512:4,1024:4" \
    --collect --out exp/serving_sdxl_mixed_v5e_r2.json
# VAE mid-attention A/B: dense (known-good 337 ms b8 1024 decode) vs
# q-row-blocked (kills the ~1 GB/image f32 score matrix)
timeout 5400 python -u scripts/bench_vae_attn.py
echo QUEUE_R2L_DONE
