#!/bin/bash
# Round-2 session-4 chip queue (runs after r2l).  One TPU python at a time.
#  1. bench_attn_pipe rerun: the bf16-score tiles now accumulate f32 on the
#     MXU (Mosaic rejected bf16 matmul accumulators — every bf16s leg of the
#     r2l run failed with a 'tpu.matmul' verification error); this decides
#     the bf16-scores and pipe routing rules with real numbers.
#  2. SD3 dense step rerun at pipe0: r2l measured 229.9 ms with
#     SDUSS_ATTN_PIPE=1 vs the 246.5 ms r2 dense baseline, but the isolated
#     joint-op delta is ~1% — bound run-to-run variance before crediting
#     the pipelined schedule.
#  3. bench.py with its new adaptive-0.05 default: the recorded headline
#     should reflect the final kernel state of the round.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 30
timeout 5400 python -u scripts/bench_attn_pipe.py \
    > /tmp/attn_pipe_r2m.log 2>&1 \
    && tail -1 /tmp/attn_pipe_r2m.log > exp/bench_attn_pipe_v5e_r2m.json
timeout 5400 env SDUSS_ATTN_PIPE=0 python -u scripts/bench_sd3.py \
    > /tmp/sd3_dense_r2m.json 2>/tmp/sd3_dense_r2m.log \
    && mv /tmp/sd3_dense_r2m.json exp/bench_sd3_v5e_r2m_dense.json
timeout 5400 python -u bench.py > /tmp/bench_r2m.log 2>&1 \
    && tail -1 /tmp/bench_r2m.log > exp/bench_sdxl_adaptive_default_v5e.json
echo QUEUE_R2M_DONE
