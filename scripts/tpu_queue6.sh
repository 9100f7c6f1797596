#!/bin/bash
# Final TPU batch: headline with fused attention (also precompiles the
# driver's bench program), then profiler artifacts with the remaining time.
set -x
export PYTHONPATH="/root/repo:$PYTHONPATH"
cd /root/repo
timeout 5400 python bench.py
timeout 3600 python scripts/bench_sd3.py
BENCH_SD3_CACHE=0.5 timeout 3600 python scripts/bench_sd3.py
timeout 7200 python -m sduss_tpu.scheduler.profiler --family sdxl \
    --out-profile exp/profile_sdxl_v5e.json --out-predictor exp/predictor_sdxl_v5e.npz
timeout 5400 python -m sduss_tpu.cache.train --family sd3 --steps 12 \
    --out exp/cache_classifiers_sd3_v5e.npz
echo QUEUE6_DONE
