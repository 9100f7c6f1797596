#!/usr/bin/env bash
# Full experiment matrix (reference scripts/paper/run_all.sh).
set -euo pipefail
HERE=$(dirname "$0")
for m in sdxl sd3; do
  MODEL=$m bash "$HERE/e2e.sh"
  MODEL=$m bash "$HERE/distribution.sh"
  MODEL=$m bash "$HERE/scalability.sh"
  MODEL=$m bash "$HERE/slo.sh"
done
