#!/bin/bash
# Round-2 session-6 chip queue: reruns the three r2n legs that failed, with
# their root causes fixed, plus the deep x compact hybrid A/B.
#  1. SD3 per-token fine cache A/B (stale-KV OFF/ON).  r2n legs 1-2 died at
#     remote_compile: make_body closed over main()'s concrete params
#     (5.1 GB lowered as jit CONSTANTS -> relay broken pipe).  Fixed:
#     params threaded, state0 built inside the trace.
#  2. SDXL mixed-resolution serving rerun (warm-key routing + auto
#     composition prewarm).  r2n leg 3 died on a compile-key COLLISION:
#     (2,4,4) and (2,2,4,4) share build_meta.compile_key under batch
#     buckets (2,4,8) but their CFG-doubled metas bucket ipc 2 vs 4; the
#     second composition retraced the first's closure.  Fixed: jit key =
#     meta.compile_key + meta2.compile_key (tests/test_warm_routing.py).
#  3. Deep x compact hybrid bench A/B at row fraction 0.5 then 0.3
#     (BENCH_DEEP_HYBRID; adaptive threshold stays at the 0.05 default).
#     Candidate new headline: shallow steps currently recompute every row
#     of the shallow pairs; top-K row gating should cut the ~229 ms shallow
#     step substantially.  Flip the bench default ONLY if it wins here AND
#     the tiny quality harness bounds its divergence near the adaptive
#     schedule's.
# One TPU python at a time (CLAUDE.md).  tee is never pointed at a good
# artifact.  Waits for the r2n queue (SD3 serving probe) to exit first.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
while kill -0 "$(cat /tmp/queue_r2n.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 30
BENCH_SD3_FINE=0.5 BENCH_SD3_FINE_STALE_KV=0 timeout 5400 \
    python -u scripts/bench_sd3.py \
    > /tmp/sd3_fine.json 2>/tmp/sd3_fine.log \
    && mv /tmp/sd3_fine.json exp/bench_sd3_v5e_r2n_fine.json
BENCH_SD3_FINE=0.5 BENCH_SD3_FINE_STALE_KV=1 timeout 5400 \
    python -u scripts/bench_sd3.py \
    > /tmp/sd3_fine_stale.json 2>/tmp/sd3_fine_stale.log \
    && mv /tmp/sd3_fine_stale.json exp/bench_sd3_v5e_r2n_fine_stale.json
BENCH_DEEP_HYBRID=0.5 timeout 7200 python -u bench.py \
    > /tmp/bench_hybrid05.json 2>/tmp/bench_hybrid05.log \
    && mv /tmp/bench_hybrid05.json exp/bench_sdxl_hybrid05_v5e.json
BENCH_DEEP_HYBRID=0.3 timeout 7200 python -u bench.py \
    > /tmp/bench_hybrid03.json 2>/tmp/bench_hybrid03.log \
    && mv /tmp/bench_hybrid03.json exp/bench_sdxl_hybrid03_v5e.json
timeout 10800 python -u scripts/serving_probe.py --qps 0.3 --num 12 \
    --steps 30 --deep-interval 3 --batch-buckets 2,4,8 \
    --resolutions 512,1024 --mixed-prewarm auto \
    --collect --out exp/serving_sdxl_mixed_v5e_r2n.json
echo QUEUE_R2O_DONE
