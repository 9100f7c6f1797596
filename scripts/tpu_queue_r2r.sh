#!/bin/bash
# Round-2 session-7 queue.  Fresh VM: the jax compile cache is EMPTY, so
# leg 1 (bench.py at the shipped default) both records the default-config
# artifact the r2q queue never produced AND warms the persistent compile
# cache for the driver's end-of-round bench run.  Legs 2-3 are the two
# serving-level measurements the r2p queue never reached (session ended):
# the serving-side evidence for the hybrid headline and for SD3's best
# cache config.  Leg 4 is the remaining hybrid-fraction bench A/B (0.4
# pairwise = the tiny-harness quality sweet spot candidate).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
timeout 7200 python -u bench.py \
    > /tmp/bench_default_r2r.json 2>/tmp/bench_default_r2r.log \
    && mv /tmp/bench_default_r2r.json exp/bench_sdxl_hybrid03p_default_v5e.json
timeout 10800 python -u scripts/serving_probe.py --qps 0.35 --num 12 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --resolutions 1024 \
    --collect --out exp/serving_sdxl_hybrid_v5e_r2r.json \
    > /tmp/serving_hybrid_r2r.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.05,0.1 --num 8 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --cache-mode compact \
    --cache-fraction 0.5 --collect \
    --out exp/serving_sd3_v5e_r2r.json \
    > /tmp/serving_sd3_r2r.log 2>&1
BENCH_DEEP_HYBRID=0.4 BENCH_HYBRID_PAIRWISE=1 timeout 7200 python -u bench.py \
    > /tmp/bench_hyb04p.json 2>/tmp/bench_hyb04p.log \
    && mv /tmp/bench_hyb04p.json exp/bench_sdxl_hybrid04_pairwise_v5e.json
echo QUEUE_R2R_DONE
