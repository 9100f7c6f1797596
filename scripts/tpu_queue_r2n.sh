#!/bin/bash
# Round-2 session-5 chip queue (after r2m).  One TPU python at a time
# (CLAUDE.md).  Info-per-chip-minute order:
#  1. SD3 per-token fine cache A/B at fraction 0.5: stale-KV splice ON vs
#     OFF.  Without stale KV the unselected tokens still pay full K/V
#     projections + attention rows; the splice is the remaining lever
#     toward the <=90 ms compact target (VERDICT #5).  Both legs share the
#     primed-sync-step protocol in bench_sd3.py, so ms_per_step is the
#     steady stale cost.
#  2. SDXL mixed-resolution serving rerun with warm-key routing +
#     auto-enumerated composition prewarm.  The r2l pass aborted 10/12 on
#     two ~150 s cold-key stalls (exp/serving_sdxl_mixed_v5e_r2.json);
#     this validates the fix at the serving level.
#  3. SD3 1024 serving probe, fine cache 0.5 (r2l leg produced no artifact:
#     the b2 VAE decode OOMed during prewarm; tiled decode now forces
#     chunk=1).  Runs with stale-KV on — serving is where the splice must
#     hold up (sync forced after every dense/cold-routed step).
# tee is never pointed at a good artifact (it truncates at start).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
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
timeout 10800 python -u scripts/serving_probe.py --qps 0.3 --num 12 \
    --steps 30 --deep-interval 3 --batch-buckets 2,4,8 \
    --resolutions 512,1024 --mixed-prewarm auto \
    --collect --out exp/serving_sdxl_mixed_v5e_r2n.json
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.05,0.1 --num 8 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --cache-mode fine \
    --cache-fraction 0.5 --fine-stale-kv --collect \
    --out exp/serving_sd3_v5e_r2n.json
echo QUEUE_R2N_DONE
