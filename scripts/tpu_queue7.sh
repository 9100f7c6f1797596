#!/bin/bash
set -x
export PYTHONPATH="/root/repo:$PYTHONPATH"
cd /root/repo
timeout 5400 python -m sduss_tpu.scheduler.profiler --family sd15 \
    --out-profile exp/profile_sd15_v5e.json --out-predictor exp/predictor_sd15_v5e.npz
# 1024^2 trace state OOMs a 16 GB chip (B=2 x S=4480 inp+out per 24 blocks);
# drift features at 512/768 train the same per-block classifiers
timeout 5400 python -m sduss_tpu.cache.train --family sd3 --steps 12 \
    --resolutions 512 768 --out exp/cache_classifiers_sd3_v5e.npz
timeout 5400 python -m sduss_tpu.scheduler.profiler --family sd3 \
    --out-profile exp/profile_sd3_v5e.json --out-predictor exp/predictor_sd3_v5e.npz
echo QUEUE7_DONE
