#!/bin/bash
# Round-2 session-10 queue (r2x): the three serving legs of r2w (its bench
# legs 1-2 completed and were committed in fad7f9a: SDXL 0.8767 img/s,
# SD3 58.2 ms).  All run with the donation + encoder-ladder + prewarm
# capacity-discovery fixes from eca04bf/fad7f9a.
# 1. SDXL hybrid serving probe (r2v leg 1 repeat).
# 2. SD3 span serving probe (r2v leg 2 repeat).
# 3. SD1.5 serving probe: the only family never serving-probed on chip.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
timeout 10800 python -u scripts/serving_probe.py --qps 0.35 --num 12 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --resolutions 1024 \
    --collect --out exp/serving_sdxl_hybrid_v5e_r2w.json \
    > /tmp/serving_hybrid_r2w.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd3 \
    --resolutions 1024 --qps 0.1 --num 8 --steps 30 \
    --batch-buckets 1,2 --probe-batch 2 --sd3-deep-span 2:24 \
    --deep-interval 6 --collect \
    --out exp/serving_sd3_span_v5e_r2w.json \
    > /tmp/serving_sd3_span_r2w.log 2>&1
timeout 10800 python -u scripts/serving_probe.py --model sd15 \
    --resolutions 512 --qps 1.0 --num 16 --steps 30 \
    --deep-interval 3 --collect \
    --out exp/serving_sd15_v5e_r2w.json \
    > /tmp/serving_sd15_r2w.log 2>&1
echo QUEUE_R2X_DONE
