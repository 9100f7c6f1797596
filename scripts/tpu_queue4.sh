#!/bin/bash
# Sequential TPU jobs, batch 4: real engine-level serving replay on chip.
set -x
export PYTHONPATH="/root/repo:$PYTHONPATH"
cd /root/repo
# Deep-reuse serving (headline cache); modest load near measured capacity.
timeout 7200 python -m sduss_tpu.benchmark.replay --model sdxl --qps 0.25 \
    --num-requests 24 --steps 30 --policy esymred --slo 10 \
    --deep-interval 3 --out outputs/client_sdxl_serving_v5e.csv \
    > exp/serving_replay_sdxl_v5e.json
timeout 7200 python -m sduss_tpu.benchmark.replay --model sdxl --qps 0.25 \
    --num-requests 24 --steps 30 --policy fcfs_mixed --slo 10 \
    --deep-interval 3 --out outputs/client_sdxl_serving_fcfs_v5e.csv \
    > exp/serving_replay_sdxl_fcfs_v5e.json
echo QUEUE4_DONE
