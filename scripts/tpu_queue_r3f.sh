#!/bin/bash
# Round-3 queue r3f — runs AFTER r3e (waits on its pid):
# 1. SDXL hybrid + fused 3-step chunk serving retry.  The r2z attempt
#    OOMed in the chunk-config prewarm at bucket 4 (the plain capacity
#    estimate passed, the chunk program's extra live state copies did
#    not fit) and the caught RESOURCE_EXHAUSTED poisoned the relay
#    device for the rest of the process.  Since then: _bucket_fits
#    budgets composition state 2x under steps_per_dispatch > 1, and a
#    still-poisoned device now fails fast with a clear error instead of
#    limping to an arbitrary later crash.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
if [ -f /tmp/queue_r3e.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3e.pid)" 2>/dev/null; do sleep 60; done
fi
until (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; do
  sleep 60
done
sleep 10
timeout 14400 python -u scripts/serving_probe.py --qps 0.45 --num 12 \
    --steps 30 --deep-interval 3 --deep-hybrid 0.3 --resolutions 1024 \
    --steps-per-dispatch 3 --collect \
    --out exp/serving_sdxl_hybrid_chunk_v5e_r3f.json \
    > /tmp/serving_sdxl_hybrid_chunk_r3f.log 2>&1
echo QUEUE_R3F_DONE

# SD1.5 MIXED serving retry with the capped auto prewarm (the r3c attempt
# enumerated 309 mixed compile keys = ~15 h of relay compiles and was
# killed; prewarm_mixed_limit=24 + warm-key routing covers the tail).
timeout 10800 python -u scripts/serving_probe.py --model sd15 \
    --resolutions 256,512,768 --qps 1.0 --num 18 --steps 30 \
    --deep-interval 3 --mixed-prewarm auto --collect \
    --out exp/serving_sd15_mixed_v5e_r3f.json \
    > /tmp/serving_sd15_mixed_r3f.log 2>&1
echo QUEUE_R3F_APPENDIX_DONE
