"""Profiler smoke tests on the tiny CPU model (real numbers come from TPU)."""

import json

import numpy as np
import pytest

from sduss_tpu.scheduler.profiler import Profiler


@pytest.fixture(scope="module")
def prof():
    return Profiler("sd15", tiny=True, dtype="float32", resolutions=(256, 512))


class TestProfiler:
    def test_step_latency_positive(self, prof):
        t = prof.step_latency({256: 1}, iters=2)
        assert t > 0

    def test_mixed_latency(self, prof):
        t = prof.step_latency({256: 1, 512: 1}, iters=2)
        assert t > 0

    def test_build_profile_and_fit(self, prof, tmp_path):
        profile = prof.build_profile(max_post_batch=2)
        assert set(profile["step_latency"]) == {"256", "512"}
        assert profile["standalone"]["denoising"]["256"] > 0
        path = tmp_path / "profile.json"
        with open(path, "w") as f:
            json.dump(profile, f)

        # profile loads back into the scheduler's StageProfile
        from sduss_tpu.scheduler.profiles import StageProfile

        with open(path) as f:
            d = json.load(f)
        sp = StageProfile(**d)
        assert sp.step_latency_s(256) == profile["step_latency"]["256"]
        assert sp.denoising_ddl_s(512) > 0

    def test_predictor_fit_roundtrip(self, prof, tmp_path):
        from sduss_tpu.scheduler.predictor import LatencyPredictor
        from sduss_tpu.scheduler.profiles import get_profile

        rows = [[1, 0], [0, 1], [1, 1], [2, 0], [2, 1]]
        ys = [0.01, 0.02, 0.028, 0.018, 0.036]
        pred = LatencyPredictor([256, 512], get_profile("sd15"))
        pred.fit(rows, ys)
        p = str(tmp_path / "pred.npz")
        pred.save(p)
        back = LatencyPredictor.load(p, get_profile("sd15"))
        for row, y in zip(rows, ys):
            assert abs(back.predict(row) - y) < 0.01

    def test_isolated_measurement_subprocess(self):
        """isolate="all" must never initialize jax in the parent and still
        return valid numbers via the one-shot --measure-one subprocess."""
        p = Profiler("sd15", tiny=True, dtype="float32",
                     resolutions=(256,), isolate="all")
        assert p._pipe is None
        t = p.step_latency({256: 1}, iters=1)
        assert t > 0
        t2 = p.post_latency(256, 1, iters=1)
        assert t2 > 0
        assert p._pipe is None  # parent stayed off-device
