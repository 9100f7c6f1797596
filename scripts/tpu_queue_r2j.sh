#!/bin/bash
# Round-2 session-3 chip queue.  Waits for the axon relay, then runs in
# priority order (one TPU python at a time per CLAUDE.md):
#  1. serving sweep with the bounded-runahead fix + prewarm + phase-aligned
#     admission (the north-star img/s-chip-under-load measurement; compile
#     cache is warm for current kernels so prewarm ~7 min)
#  2. attention pipe/bf16-scores A/B at production shapes
#  3. SD3 dense step with the pipelined schedule enabled, written to a
#     SEPARATE file (never tee over a good artifact: tee truncates at
#     start, which emptied bench_sd3_v5e_r2_dense.json last session)
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 30
timeout 14400 python -u scripts/serving_probe.py --qps 0.25,0.35,0.45 \
    --num 14 --steps 30 --deep-interval 3 --batch-buckets 2,4,8 --collect \
    --out exp/serving_sdxl_v5e_r2.json
timeout 3600 python -u scripts/bench_attn_pipe.py
SDUSS_ATTN_PIPE=1 timeout 5400 python -u scripts/bench_sd3.py \
    > /tmp/sd3_pipe.json && mv /tmp/sd3_pipe.json exp/bench_sd3_v5e_r2_pipe.json
echo QUEUE_R2J_DONE
