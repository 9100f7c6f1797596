#!/bin/bash
# Sequential TPU jobs, batch 5: perf A/Bs first, then profiles/artifacts.
set -x
export PYTHONPATH="/root/repo:$PYTHONPATH"
cd /root/repo
BENCH_COMPACT_FRACTION=0.5 timeout 4800 python scripts/bench_mixed.py
timeout 3600 python scripts/bench_fused_attn.py
BENCH_DEEP=0 BENCH_REPEATS=2 timeout 5400 python bench.py
SDUSS_FUSED_ATTN=1 BENCH_DEEP=0 BENCH_REPEATS=2 timeout 5400 python bench.py
timeout 9000 python -m sduss_tpu.scheduler.profiler --family sdxl \
    --out-profile exp/profile_sdxl_v5e.json --out-predictor exp/predictor_sdxl_v5e.npz
timeout 9000 python -m sduss_tpu.scheduler.profiler --family sd3 \
    --out-profile exp/profile_sd3_v5e.json --out-predictor exp/predictor_sd3_v5e.npz
timeout 5400 python -m sduss_tpu.cache.train --family sd3 --steps 12 \
    --out exp/cache_classifiers_sd3_v5e.npz
timeout 9000 python -m sduss_tpu.scheduler.profiler --family sd15 \
    --out-profile exp/profile_sd15_v5e.json --out-predictor exp/predictor_sd15_v5e.npz
echo QUEUE5_DONE
