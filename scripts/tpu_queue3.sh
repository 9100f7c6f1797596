#!/bin/bash
# Sequential TPU jobs, batch 3.
set -x
export PYTHONPATH="/root/repo:$PYTHONPATH"
cd /root/repo
BENCH_COMPACT_FRACTION=0.5 timeout 4800 python scripts/bench_mixed.py
timeout 3600 python scripts/bench_fused_attn.py
# full-step A/B of the fused attention dispatch (cache off for clean signal)
BENCH_DEEP=0 BENCH_REPEATS=2 timeout 5400 python bench.py
SDUSS_FUSED_ATTN=1 BENCH_DEEP=0 BENCH_REPEATS=2 timeout 5400 python bench.py
echo QUEUE3_DONE
