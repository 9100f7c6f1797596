#!/bin/bash
# Round-2 session-8 queue (r2u): serving-layer fixes + SD3 span default.
# 1. bench_sd3 DEFAULT confirm: span 2:24 @ interval 6 (0.99x anchor in
#    r2t, now the default config) — validates the default wiring on chip.
# 2. span@3 + compact 0.5: quality-clean combo (tiny rel_mse 0.0019 vs
#    0.0179 for span@6+compact) — may tie span@6's latency with 5x
#    tighter divergence.
# 3. SDXL hybrid serving rerun: r2t crashed RESOURCE_EXHAUSTED in the
#    prewarm decode (hybrid comp-state was live during postprocess; now
#    released first).
# 4. SD3 span serving rerun: r2t had 75% aborts from (a) blocking 23 s
#    host T5 prepares (now async + T5 row cache + one-pass pos+neg
#    encode) and (b) 3x step-time overprediction (now EMA-corrected).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
timeout 7200 python -u scripts/bench_sd3.py \
    > /tmp/bench_sd3_default.json 2>/tmp/bench_sd3_default.log \
    && mv /tmp/bench_sd3_default.json exp/bench_sd3_v5e_default.json
BENCH_SD3_DEEP_INTERVAL=3 BENCH_SD3_CACHE=0.5 \
    timeout 7200 python -u scripts/bench_sd3.py \
    > /tmp/bench_sd3_i3_c05.json 2>/tmp/bench_sd3_i3_c05.log \
    && mv /tmp/bench_sd3_i3_c05.json \
          exp/bench_sd3_v5e_deep224_i3_compact05.json
timeout 10800 python -u scripts/serving_probe.py --qps 0.35 --num 12 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --resolutions 1024 \
    --collect --out exp/serving_sdxl_hybrid_v5e_r2u.json \
    > /tmp/serving_hybrid_r2u.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.1 --num 8 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --sd3-deep-span 2:24 \
    --deep-interval 6 --collect \
    --out exp/serving_sd3_span_v5e_r2u.json \
    > /tmp/serving_sd3_span_r2u.log 2>&1
echo QUEUE_R2U_DONE
