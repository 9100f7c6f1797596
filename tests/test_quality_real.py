"""Dry run of the real-weight quality harness (scripts/quality_real.py).

The zero-egress image has no HF snapshots, so the weight-bearing quality
path (loader -> generation cache-off vs production preset -> rel MSE +
CLIP score) must stay executable as code: this drives the identical flow
on tiny random weights (--tiny) so the one-command close-out
(scripts/quality_real.sh) cannot rot.  VERDICT r3 item 10.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quality_real_tiny_dry_run(tmp_path):
    out = tmp_path / "q.json"
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "quality_real.py"),
         "--family", "sd15", "--tiny", "--n", "2", "--steps", "3",
         "--resolution", "128", "--dump-dir", str(tmp_path / "imgs"),
         "--out", str(out)],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.loads(out.read_text())
    assert rep["tiny_dry_run"] and rep["n"] == 2
    assert "cache_rel_mse_mean" in rep and "clip_score_cached" in rep
    # PNGs dumped for inspection
    assert rep.get("dump_dir") and os.listdir(rep["dump_dir"])
