"""scripts/bench_sd15.py smoke-tested at tiny scale (same rationale as
test_bench_smoke.py: a bench code change must not brick a relay compile)."""

import importlib
import json

import numpy as np
import pytest


@pytest.fixture()
def bench_sd15(monkeypatch):
    import sduss_tpu.models.unet as unet_mod

    monkeypatch.setattr(unet_mod, "SD15_UNET", unet_mod.TINY_UNET)
    mod = importlib.import_module("scripts.bench_sd15")
    return mod


@pytest.mark.parametrize("mode", ["dense", "deep", "hybrid"])
def test_bench_sd15_modes(bench_sd15, monkeypatch, capsys, mode):
    import sduss_tpu.models.unet as unet_mod

    monkeypatch.setenv("BENCH_SD15_RES", "256")
    monkeypatch.setenv("BENCH_BATCH", "2")
    monkeypatch.setenv("BENCH_STEPS", "4")
    monkeypatch.setenv("BENCH_REPEATS", "1")
    monkeypatch.setenv("BENCH_MODE", mode)
    # tiny cross-attention width
    monkeypatch.setattr(unet_mod, "SD15_UNET", unet_mod.TINY_UNET)
    bench_sd15.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["unit"] == "img/s"
    assert out["value"] > 0
    assert np.isfinite(out["value"])
    if mode == "dense":
        assert out["n_full"] == 4
    else:
        assert 1 <= out["n_full"] <= 4


def test_bench_sd15_boundary1(bench_sd15, monkeypatch, capsys):
    """BENCH_DEEP_BOUNDARY=1 (conv-only shallow, SDXL bdy1 analog) runs
    and reports the boundary; clamps inside [1, n_levels-1] on the tiny
    2-level config."""
    import sduss_tpu.models.unet as unet_mod

    monkeypatch.setenv("BENCH_SD15_RES", "256")
    monkeypatch.setenv("BENCH_BATCH", "2")
    monkeypatch.setenv("BENCH_STEPS", "4")
    monkeypatch.setenv("BENCH_REPEATS", "1")
    monkeypatch.setenv("BENCH_MODE", "hybrid")
    monkeypatch.setenv("BENCH_DEEP_BOUNDARY", "1")
    monkeypatch.setattr(unet_mod, "SD15_UNET", unet_mod.TINY_UNET)
    bench_sd15.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] > 0 and np.isfinite(out["value"])
    assert out["deep_boundary"] == 1
