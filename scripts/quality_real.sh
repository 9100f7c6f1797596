#!/bin/bash
# One-command real-weight quality close-out (VERDICT r3 item 10).
#
# The zero-egress build image has no HF snapshots, so the rebuild's quality
# numbers are weight-free trajectory divergence.  On a weight-bearing
# machine this script closes the gap end-to-end:
#   1. loader smoke    — snapshot -> ModelBundle params (models/loader.py)
#   2. parity tier     — independent-torch golden tests (random weights;
#                        structural parity of every converted module)
#   3. real generation — cache-off vs production-preset images, relative
#                        MSE vs the reference's 0.01 bar, CLIP score
#
# Usage:
#   SDXL_SNAPSHOT=/path/to/stable-diffusion-xl-base-1.0 \
#   CLIP_SNAPSHOT=/path/to/clip-vit-large-patch14 \
#   bash scripts/quality_real.sh sdxl
set -euo pipefail
cd "$(dirname "$0")/.."
FAMILY="${1:-sdxl}"
VAR="$(echo "$FAMILY" | tr '[:lower:]' '[:upper:]')_SNAPSHOT"
SNAPSHOT="${!VAR:-}"
if [ -z "$SNAPSHOT" ]; then
    echo "set $VAR to the HF snapshot dir (model_index.json + safetensors)"
    exit 2
fi
echo "== 1/3 loader smoke ($SNAPSHOT)"
python - "$FAMILY" "$SNAPSHOT" <<'EOF'
import sys
from sduss_tpu.models.loader import load_bundle
bundle = load_bundle(sys.argv[1], snapshot=sys.argv[2])
import jax
n = sum(x.size for x in jax.tree.leaves(bundle.params))
print(f"loaded {sys.argv[1]} from snapshot: {n/1e6:.1f}M params")
EOF
echo "== 2/3 parity tier"
PYTHONPATH= python -m pytest tests/test_parity_torch.py tests/test_convert.py -q
echo "== 3/3 real-weight generation quality"
python scripts/quality_real.py --family "$FAMILY" --snapshot "$SNAPSHOT" \
    ${CLIP_SNAPSHOT:+--clip-snapshot "$CLIP_SNAPSHOT"} \
    --steps 30 --n 8 --out "exp/quality_real_${FAMILY}.json"
