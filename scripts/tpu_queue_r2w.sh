#!/bin/bash
# Round-2 session-10 queue (r2w): rerun the two serving legs that died in
# r2v, with the two fixes that postmortem produced:
#   - cache-state buffer DONATION (jit input/output aliasing): the b8
#     1024^2 hybrid row state is ~4 GB and holding old+new copies across
#     the step OOMed the serving prewarm next to the text-encoder params
#     (bench only survived because its bundle has no encoders resident).
#   - encoder bucket ladder extended to 2x (base.py _encode_buckets):
#     SD3's one-pass pos+neg encode doubled the batch past
#     batch_buckets[-1] and crashed bucket_for in prewarm.
# Legs:
# 1. bench.py default (SDXL hybrid 0.3 pairwise): donation mints NEW
#    compile keys — confirm the 0.8752 img/s headline still holds and
#    warm the persistent cache before the driver's BENCH_r02 run.
# 2. bench_sd3 default (span 2:24 @3 + compact 0.5): same confirm for the
#    donated SD3 trunk (57.0 ms pre-donation).
# 3. SDXL hybrid serving probe (r2v leg 1 repeat).
# 4. SD3 span serving probe (r2v leg 2 repeat).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
timeout 7200 python -u bench.py \
    > /tmp/bench_default_r2w.json 2>/tmp/bench_default_r2w.log \
    && cp /tmp/bench_default_r2w.json exp/bench_sdxl_default_v5e_r2w.json
timeout 7200 python -u scripts/bench_sd3.py \
    > /tmp/bench_sd3_r2w.json 2>/tmp/bench_sd3_r2w.log \
    && cp /tmp/bench_sd3_r2w.json exp/bench_sd3_v5e_default_r2w.json
timeout 10800 python -u scripts/serving_probe.py --qps 0.35 --num 12 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --resolutions 1024 \
    --collect --out exp/serving_sdxl_hybrid_v5e_r2w.json \
    > /tmp/serving_hybrid_r2w.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.1 --num 8 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --sd3-deep-span 2:24 \
    --deep-interval 6 --collect \
    --out exp/serving_sd3_span_v5e_r2w.json \
    > /tmp/serving_sd3_span_r2w.log 2>&1
# 5. SD1.5 serving probe: the only family never serving-probed on chip
#    (profile/predictor/classifier artifacts all exist) — completes the
#    three-family serving matrix.
timeout 10800 python -u scripts/serving_probe.py --model sd15 \
    --resolutions 512 --qps 1.0 --num 16 --steps 30 \
    --deep-interval 3 --collect \
    --out exp/serving_sd15_v5e_r2w.json \
    > /tmp/serving_sd15_r2w.log 2>&1
echo QUEUE_R2W_DONE
