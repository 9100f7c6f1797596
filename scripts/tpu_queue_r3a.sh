#!/bin/bash
# Round-2 session-11 queue (r3a) — runs AFTER r2z (waits on its pid):
# 1-2. SD3 wide-span long intervals @30 and @20 (ONE full step / two):
#    tiny quality 0.00165 / 0.00056 (exp/cache_quality_sd3_spanlong_tiny);
#    interval is a traced scalar -> reuses the warm span program (fast legs
#    first).
# 3. SDXL hybrid bench at deep boundary 1 (conv-only shallow step): tiny
#    3-level quality holds (rel_mse 0.00199 vs 0.00142 at default boundary,
#    exp/cache_quality_sdxl_bdy1_tiny.json); projected ~1.15 img/s (2.56x)
#    if the conv-only shallow lands near its ~50 ms conv roofline.  Fresh
#    ~30 min relay compile, so it goes last.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r2z.pid ]; then
  while kill -0 "$(cat /tmp/queue_r2z.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
for ITV in 30 20; do
  BENCH_SD3_STEPS=30 BENCH_SD3_DEEP=1:24 BENCH_SD3_CACHE=0 \
  BENCH_SD3_DEEP_INTERVAL=$ITV \
  timeout 7200 python -u scripts/bench_sd3.py \
      > /tmp/bench_sd3_span124_i$ITV.json 2>/tmp/bench_sd3_span124_i$ITV.log \
      && cp /tmp/bench_sd3_span124_i$ITV.json \
           exp/bench_sd3_v5e_span124_i$ITV.json
done
BENCH_DEEP_BOUNDARY=1 \
timeout 7200 python -u bench.py \
    > /tmp/bench_sdxl_bdy1.log 2>&1
echo QUEUE_R3A_DONE
