"""Fused multi-step dispatch on the UNet dense path (base.denoise_chunk).

Mirrors tests/test_sd3_chunk.py for the SD1.5/SDXL families: chunk(k) must
equal k per-step calls for dense / compact / deep / hybrid modes, and
host-decision configurations (adaptive refresh, reuse-then-predict,
off-boundary deep state, un-anchored compact) must refuse and fall back.
"""

import numpy as np
import pytest

from sduss_tpu.config import CacheConfig, Config, ModelConfig, SchedulerConfig
from sduss_tpu.pipelines import build_pipeline
from sduss_tpu.request import Request, SamplingParams, Stage


def make_pipe(mode=None, interval=2, hybrid=None, adaptive=0.0, predict=0.0,
              warmup=0):
    config = Config()
    config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
    config.scheduler = SchedulerConfig(use_mixed_resolution=False)
    cc = CacheConfig(enabled=mode is not None, deep_interval=interval,
                     deep_warmup=warmup, deep_adaptive=adaptive,
                     deep_predict=predict, max_hits=4, min_level=0)
    if mode is not None:
        cc.mode = mode
        if mode == "compact":
            cc.compact_fraction = 0.5
        if hybrid is not None:
            cc.deep_compact_fraction = hybrid
    config.cache = cc
    return build_pipeline(config)


def make_reqs(n=2, res=256, steps=6):
    return [Request(f"r{i}", SamplingParams(prompt=f"p{i}", resolution=res,
                                            num_inference_steps=steps,
                                            seed=i))
            for i in range(n)]


def prep(pipe, reqs):
    pipe.prepare(reqs)
    by_res = {}
    for r in reqs:
        r.stage = Stage.DENOISING
        by_res.setdefault(r.resolution, []).append(r)
    return by_res


def _steps(pipe, by_res, n):
    for _ in range(n):
        pipe.denoise_step(by_res)


class TestUNetChunkExactness:
    def _compare(self, mk, k=4, pre_steps=0, atol=5e-4):
        a_pipe = mk()
        a = make_reqs(steps=pre_steps + k)
        by_a = prep(a_pipe, a)
        _steps(a_pipe, by_a, pre_steps)
        assert a_pipe.denoise_chunk(by_a, k), "chunk unexpectedly ineligible"

        b_pipe = mk()
        b = make_reqs(steps=pre_steps + k)
        by_b = prep(b_pipe, b)
        _steps(b_pipe, by_b, pre_steps + k)

        for x, y in zip(a, b):
            assert x.remain_steps == y.remain_steps == 0
            np.testing.assert_allclose(np.asarray(x.latents, np.float32),
                                       np.asarray(y.latents, np.float32),
                                       atol=atol, rtol=5e-3)

    def test_dense(self):
        self._compare(lambda: make_pipe(), k=4)

    def test_compact_after_anchor(self):
        self._compare(lambda: make_pipe("compact"), k=4, pre_steps=1)

    def test_deep_from_boundary(self):
        # one per-step full seeds deep_state; next boundary at step 2
        self._compare(lambda: make_pipe("deep", interval=2), k=4,
                      pre_steps=2)

    def test_hybrid_from_boundary(self):
        self._compare(lambda: make_pipe("deep", interval=2, hybrid=0.5),
                      k=4, pre_steps=2)


class TestUNetChunkEligibility:
    def test_first_step_refuses_until_deep_seeded(self):
        pipe = make_pipe("deep", interval=2)
        reqs = make_reqs(steps=6)
        by_res = prep(pipe, reqs)
        assert pipe.denoise_chunk(by_res, 2) is False  # no deep state yet
        _steps(pipe, by_res, 2)  # full + shallow -> age 1 -> boundary
        assert pipe.denoise_chunk(by_res, 2) is True

    def test_off_boundary_refuses(self):
        pipe = make_pipe("deep", interval=3)
        reqs = make_reqs(steps=9)
        by_res = prep(pipe, reqs)
        _steps(pipe, by_res, 1)  # full ran -> age 0, mid-interval
        assert pipe.denoise_chunk(by_res, 3) is False
        _steps(pipe, by_res, 2)
        assert pipe.denoise_chunk(by_res, 3) is True

    def test_adaptive_refuses(self):
        pipe = make_pipe("deep", interval=2, adaptive=0.05)
        reqs = make_reqs(steps=6)
        by_res = prep(pipe, reqs)
        _steps(pipe, by_res, 2)
        assert pipe.denoise_chunk(by_res, 2) is False

    def test_predict_refuses(self):
        pipe = make_pipe("deep", interval=2, predict=0.5)
        reqs = make_reqs(steps=6)
        by_res = prep(pipe, reqs)
        _steps(pipe, by_res, 2)
        assert pipe.denoise_chunk(by_res, 2) is False

    def test_unanchored_compact_refuses(self):
        pipe = make_pipe("compact")
        reqs = make_reqs(steps=4)
        by_res = prep(pipe, reqs)
        assert pipe.denoise_chunk(by_res, 4) is False

    def test_warmup_refuses(self):
        pipe = make_pipe("deep", interval=2, warmup=4)
        reqs = make_reqs(steps=8)
        by_res = prep(pipe, reqs)
        _steps(pipe, by_res, 2)
        assert pipe.denoise_chunk(by_res, 2) is False


@pytest.mark.slow
class TestUNetChunkServing:
    def test_engine_serves_with_chunking(self):
        from sduss_tpu.engine.engine import Engine

        c = Config()
        c.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        c.scheduler.use_mixed_resolution = False
        c.scheduler.policy = "esymred"
        c.scheduler.steps_per_dispatch = 2
        c.cache = CacheConfig(enabled=True, mode="deep", deep_interval=2,
                              deep_warmup=0, deep_compact_fraction=0.5,
                              min_level=0)
        eng = Engine(c)
        eng.prewarm(resolutions=(256,))
        pipe = eng.workers[0].pipeline
        assert any(isinstance(kk, tuple) and kk[0] == "unet_chunk"
                   for kk in pipe._executed_keys), "chunk program not minted"
        reqs = [Request(f"c{i}", SamplingParams(prompt=f"p{i}",
                                                resolution=256,
                                                num_inference_steps=6,
                                                seed=i)) for i in range(3)]
        eng.add_requests(reqs)
        outs = []
        while eng.has_unfinished_requests():
            outs.extend(eng.step())
        assert len(outs) == 3 and all(o.finished for o in outs)
        for o in outs:
            assert np.isfinite(np.asarray(o.image).astype(np.float32)).all()
