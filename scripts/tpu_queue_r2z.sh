#!/bin/bash
# Round-2 session-11 queue (r2z):
# 1-2. SDXL long-interval frontier chip A/B (from
#    exp/cache_quality_sdxl_frontier_tiny.json): hybrid 0.3 pairwise with
#    adaptive threshold 0.1 / cap 10 (7/30 fulls, rel_mse 0.0074) and
#    threshold 0.2 / cap 15 (6/30, 0.0096).  Both share the headline's
#    compiled programs (threshold/cap are schedule-side), so warm.
# 3. SDXL hybrid serving probe rerun behind the session-10 OOM fixes
#    (finish-time state eviction, capacity-gated decode chunk, blocked
#    VAE attention default).  This leg died in r2w (caught b12 OOM
#    poisoned the process) and was skipped in r2x/r2y.
# 4. Same probe with fused 3-step dispatch (da2b0fb): serving cadence
#    through the relay is RTT-bound, so k-step chunks cut host round
#    trips 3x; on real hardware it trims dispatch overhead.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
BENCH_DEEP_ADAPTIVE=0.1 BENCH_DEEP_CAP=10 \
timeout 7200 python -u bench.py \
    > /tmp/bench_frontier_t01c10.log 2>&1
BENCH_DEEP_ADAPTIVE=0.2 BENCH_DEEP_CAP=15 \
timeout 7200 python -u bench.py \
    > /tmp/bench_frontier_t02c15.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --qps 0.35 --num 12 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --resolutions 1024 \
    --collect --out exp/serving_sdxl_hybrid_v5e_r2z.json \
    > /tmp/serving_hybrid_r2z.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --qps 0.35 --num 12 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --resolutions 1024 \
    --steps-per-dispatch 3 \
    --collect --out exp/serving_sdxl_hybrid_chunk_v5e_r2z.json \
    > /tmp/serving_hybrid_chunk_r2z.log 2>&1
echo QUEUE_R2Z_DONE
