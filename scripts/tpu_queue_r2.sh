#!/bin/bash
# Round-2 chip queue: runs after the SD3 profiler frees the single TPU slot.
# Ordered by verdict priority: SD3 artifact chain -> serving-level numbers ->
# SD3 step evidence -> sd15 classifiers -> cache quality -> two-level bench.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

# wait for the sd3 profiler (single TPU slot; see /tmp/profile_sd3.pid)
while [ -f /tmp/profile_sd3.pid ] && kill -0 "$(cat /tmp/profile_sd3.pid)" 2>/dev/null; do
  sleep 60
done

# 1. SD3 cache classifiers (1024^2 trace state OOMs 16 GB; 512/768 drift
#    features train the same per-block classifiers)
timeout 7200 python -m sduss_tpu.cache.train --family sd3 --steps 12 \
    --encoders-on-host --resolutions 512 768 \
    --out exp/cache_classifiers_sd3_v5e.npz

# 2. Serving-level refresh (north star): warm engine + QPS passes
timeout 10800 python scripts/serving_probe.py --qps 0.2,0.3,0.4 --num 14 \
    --warmup 6 --steps 30 --deep-interval 3 \
    --out exp/serving_sdxl_v5e_r2.json

# 3. SD3 step refresh on the new kernels (dense + compact)
timeout 5400 python scripts/bench_sd3.py | tee exp/bench_sd3_v5e_r2_dense.json
BENCH_SD3_CACHE=0.5 timeout 5400 python scripts/bench_sd3.py \
    | tee exp/bench_sd3_v5e_r2_compact.json

# 4. Attention microbench refresh (validates base-2 softmax + retune)
timeout 5400 python scripts/bench_attn_sweep.py

# 5. sd15 cache classifiers
timeout 7200 python -m sduss_tpu.cache.train --family sd15 --steps 12 \
    --out exp/cache_classifiers_sd15_v5e.npz

# 6. Full-size cache quality spot checks (deep 3 + compact 0.5, 1 seed)
timeout 10800 python scripts/cache_quality.py --family sdxl --steps 30 \
    --seeds 1 --batch 2 --deep 3 --compact 0.5 \
    --out exp/cache_quality_sdxl_v5e.json

# 7. Two-level patch cache measurement (vs the 134.4 ms image-granular)
BENCH_PATCH_FRACTION=0.5 BENCH_MIXED_OUT=exp/bench_mixed_twolevel_v5e.json \
    timeout 7200 python scripts/bench_mixed.py

echo QUEUE_R2_DONE
