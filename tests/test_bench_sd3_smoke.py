"""scripts/bench_sd3.py trajectory builders smoke-tested at tiny scale.

Same rationale as tests/test_bench_smoke.py: the real bench compiles the
full SD3.5-medium MMDiT (chip-only in practice); these pin the trajectory
GRAPHS — dense, compact, fine, and the span-skip deep hybrid — on
TINY_MMDIT so a bench code change can't brick a relay compile run.
"""

import importlib
import json
import sys

import pytest


@pytest.fixture()
def run_bench(monkeypatch, capsys):
    import sduss_tpu.models.mmdit as mmdit_mod

    monkeypatch.setattr(mmdit_mod, "SD35_MEDIUM", mmdit_mod.TINY_MMDIT)
    monkeypatch.setenv("BENCH_SD3_HW", "8")
    monkeypatch.setenv("BENCH_SD3_CTX", "7")
    sys.path.insert(0, "/root/repo/scripts")

    def run(**env):
        for k, v in env.items():
            monkeypatch.setenv(k, str(v))
        mod = importlib.import_module("bench_sd3")
        mod.main()
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return json.loads(out)

    yield run
    sys.path.remove("/root/repo/scripts")


def test_default_is_wide_span(run_bench):
    """DEFAULT = dense wide span 1:24 @30 — ONE full step per 30-step
    trajectory, token gates off (19.7 ms on chip,
    exp/bench_sd3_v5e_span124_i30.json; rel_mse 0.00165 at real depth,
    6x under the bar); TINY_MMDIT's 2 blocks clamp the span to 1:2."""
    r = run_bench()
    assert r["ms_per_step"] > 0
    assert r["deep_span"] == [1, 2] and r["deep_interval"] == 30
    assert r["compact_cache_fraction"] == 0.0


def test_dense(run_bench):
    r = run_bench(BENCH_SD3_DEEP="")
    assert r["ms_per_step"] > 0 and r["deep_span"] is None


def test_compact(run_bench):
    r = run_bench(BENCH_SD3_CACHE="0.5", BENCH_SD3_BATCH="2")
    assert r["compact_cache_fraction"] == 0.5


def test_fine(run_bench):
    r = run_bench(BENCH_SD3_FINE="0.5")
    assert r["token_fine_fraction"] == 0.5


def test_deep_dense(run_bench):
    r = run_bench(BENCH_SD3_DEEP="1:2", BENCH_SD3_DEEP_INTERVAL="2",
                  BENCH_SD3_CACHE="0")
    assert r["deep_span"] == [1, 2] and r["deep_interval"] == 2
    assert r["compact_cache_fraction"] == 0.0


def test_span_compact_combo(run_bench):
    # The superseded default (span + compact token cache; 57.0 ms on chip)
    # stays reachable via env.
    r = run_bench(BENCH_SD3_DEEP="0:1", BENCH_SD3_DEEP_INTERVAL="3",
                  BENCH_SD3_CACHE="0.5")
    assert r["deep_span"] == [0, 1] and r["deep_interval"] == 3
    assert r["compact_cache_fraction"] == 0.5


def test_deep_hybrid_fine(run_bench):
    r = run_bench(BENCH_SD3_DEEP="0:1", BENCH_SD3_FINE="0.5")
    assert r["deep_span"] == [0, 1] and r["token_fine_fraction"] == 0.5


def test_deep_adaptive(run_bench):
    r = run_bench(BENCH_SD3_DEEP="1:2", BENCH_SD3_DEEP_ADAPTIVE="0.01",
                  BENCH_SD3_DEEP_CAP="3")
    assert r["deep_adaptive_threshold"] == 0.01
    assert 1 <= r["n_full"] <= r["n_steps"]
