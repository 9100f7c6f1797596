#!/bin/bash
# Sequential TPU jobs (ONE TPU python process at a time — CLAUDE.md).
set -x
export PYTHONPATH="/root/repo:$PYTHONPATH"
cd /root/repo
timeout 3600 python scripts/bench_sd3.py                     # dense refresh (hb=2 retune)
BENCH_SD3_CACHE=0.5 timeout 3600 python scripts/bench_sd3.py # compact token cache
timeout 3600 python scripts/bench_sdxl_ops.py                # op budget refresh
timeout 5400 python -m sduss_tpu.cache.train --family sdxl --steps 12 \
    --out exp/cache_classifiers_sdxl_v5e.npz
timeout 5400 python -m sduss_tpu.cache.train --family sd3 --steps 12 \
    --out exp/cache_classifiers_sd3_v5e.npz
echo QUEUE1_DONE
