"""SD3 mixed-resolution padded-token batching vs the dense per-res path."""

import numpy as np
import pytest

from sduss_tpu.config import Config, ModelConfig, SchedulerConfig
from sduss_tpu.pipelines import build_pipeline
from sduss_tpu.request import Request, SamplingParams, Stage


def make_pipe():
    config = Config()
    config.model = ModelConfig(model="sd3", test_tiny=True, dtype="float32",
                               resolutions=(256, 512))
    config.scheduler = SchedulerConfig(use_mixed_resolution=True)
    return build_pipeline(config)


def make_reqs(steps=3):
    return [
        Request("a", SamplingParams(prompt="a cat", resolution=256,
                                    num_inference_steps=steps, seed=0)),
        Request("b", SamplingParams(prompt="a dog", resolution=512,
                                    num_inference_steps=steps, seed=1)),
    ]


def prep(pipe, reqs):
    pipe.prepare(reqs)
    for r in reqs:
        r.stage = Stage.DENOISING
    return {r.resolution: [r] for r in reqs}


class TestSD3Mixed:
    def test_mixed_equals_dense(self):
        pipe = make_pipe()
        reqs_mixed = make_reqs()
        by_res = {}
        for r in reqs_mixed:
            by_res.setdefault(r.resolution, []).append(r)
        prep(pipe, reqs_mixed)
        for _ in range(2):
            pipe.denoise_step_mixed(by_res)

        reqs_dense = make_reqs()
        by_res_d = {}
        for r in reqs_dense:
            by_res_d.setdefault(r.resolution, []).append(r)
        prep(pipe, reqs_dense)
        for _ in range(2):
            pipe.denoise_step(by_res_d)

        for m, d in zip(reqs_mixed, reqs_dense):
            np.testing.assert_allclose(
                np.asarray(m.latents), np.asarray(d.latents),
                atol=5e-4, rtol=5e-3,
                err_msg=f"res={m.resolution}")

    def test_single_resolution_falls_back_dense(self):
        pipe = make_pipe()
        reqs = [Request(f"r{i}", SamplingParams(prompt="x", resolution=256,
                                                num_inference_steps=2, seed=i))
                for i in range(2)]
        by_res = prep(pipe, reqs)
        by_res = {256: reqs}
        pipe.denoise_step_mixed(by_res)
        assert all(r.remain_steps == 1 for r in reqs)

    def test_uniform_batch_with_cache_routes_to_token_path(self):
        """The worker sends uniform-resolution batches to denoise_step; with
        the token cache on, the SD3 pipeline must still take the cached
        TOKEN trunk (the dense path has no token-cache support — without the
        override, cache-mode serving silently ran dense)."""
        config = Config()
        config.model = ModelConfig(model="sd3", test_tiny=True,
                                   dtype="float32", resolutions=(256, 512))
        config.scheduler = SchedulerConfig(use_mixed_resolution=True)
        config.cache.enabled = True
        config.cache.mode = "compact"
        config.cache.patch_fraction = 0.5   # per-token fine flavor
        pipe = build_pipeline(config)
        reqs = [Request(f"u{i}", SamplingParams(prompt="x", resolution=256,
                                                num_inference_steps=3, seed=i))
                for i in range(2)]
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        pipe.denoise_step({256: reqs})     # uniform batch, worker-style call
        assert getattr(pipe, "_sd3_state", None), \
            "token cache did not engage on the uniform path"
        assert all(np.isfinite(np.asarray(r.latents)).all() for r in reqs)
        # and the token-path jit key was minted, not only the dense one
        assert any(isinstance(k, tuple) and k[0] == "sd3_mixed"
                   for k in pipe._fns)

    @pytest.mark.slow
    def test_full_generation_mixed(self):
        """End-to-end through the engine with mixed SD3 resolutions."""
        from sduss_tpu.entrypoints.offline import DiffusionPipeline

        pipe = DiffusionPipeline(model="sd3", test_tiny=True,
                                 policy="fcfs_mixed",
                                 config=None)
        pipe.config.model.resolutions = (256, 512)
        outs = pipe.generate(["a", "b"], resolution=[256, 512],
                             num_inference_steps=2)
        assert len(outs) == 2
        for o in outs:
            assert o.image is not None
            assert np.isfinite(np.asarray(o.image, np.float32)).all()


class TestSD3TokenCache:
    def _pipe(self, threshold):
        config = Config()
        config.model = ModelConfig(model="sd3", test_tiny=True, dtype="float32",
                                   resolutions=(256, 512))
        config.scheduler = SchedulerConfig(use_mixed_resolution=True)
        config.cache.enabled = True
        config.cache.mode = "block"
        config.cache.mse_threshold = threshold
        return build_pipeline(config)

    def test_always_recompute_matches_cache_off(self):
        reqs_c = make_reqs()
        by_res_c = prep(self._pipe(threshold=-1.0), reqs_c)
        pipe_c = self._pipe(threshold=-1.0)
        by_res_c = prep(pipe_c, reqs_c)
        for _ in range(2):
            pipe_c.denoise_step_mixed(by_res_c)

        pipe0 = make_pipe()
        reqs0 = make_reqs()
        by_res0 = prep(pipe0, reqs0)
        for _ in range(2):
            pipe0.denoise_step_mixed(by_res0)
        for a, b in zip(reqs_c, reqs0):
            np.testing.assert_allclose(np.asarray(a.latents),
                                       np.asarray(b.latents), atol=1e-4,
                                       rtol=1e-3)

    def test_reuse_rows_exist_and_finite(self):
        pipe = self._pipe(threshold=1e9)
        reqs = make_reqs(steps=4)
        by_res = prep(pipe, reqs)
        for _ in range(3):
            pipe.denoise_step_mixed(by_res)
        for r in reqs:
            assert np.isfinite(np.asarray(r.latents)).all()
        # token state lives per batch composition on the pipeline store
        (entry,) = pipe._sd3_state.values()
        key = next(iter(entry["state"]))
        # CFG-doubled rows: 2 * batch bucket
        assert entry["state"][key]["inp"].shape[0] == 2 * len(reqs)
        # with a huge threshold everything reuses after the first step
        hits = int(np.asarray(entry["state"][key]["hits"]).max())
        assert hits >= 1


class TestSD3CompactCache:
    def _pipe(self, fraction=0.5, threshold=0.01):
        config = Config()
        config.model = ModelConfig(model="sd3", test_tiny=True, dtype="float32",
                                   resolutions=(256, 512))
        config.scheduler = SchedulerConfig(use_mixed_resolution=True)
        config.cache.enabled = True
        config.cache.mode = "compact"
        config.cache.compact_fraction = fraction
        config.cache.mse_threshold = threshold
        return build_pipeline(config)

    def test_full_capacity_matches_cache_off(self):
        """fraction=1.0 -> every row recomputes every step == cache off."""
        pipe_c = self._pipe(fraction=1.0)
        reqs_c = make_reqs()
        by_res_c = prep(pipe_c, reqs_c)
        for _ in range(2):
            pipe_c.denoise_step_mixed(by_res_c)

        pipe0 = make_pipe()
        reqs0 = make_reqs()
        by_res0 = prep(pipe0, reqs0)
        for _ in range(2):
            pipe0.denoise_step_mixed(by_res0)
        for a, b in zip(reqs_c, reqs0):
            np.testing.assert_allclose(np.asarray(a.latents),
                                       np.asarray(b.latents), atol=1e-4,
                                       rtol=1e-3)

    def test_half_capacity_runs_and_reuses(self):
        pipe = self._pipe(fraction=0.5)
        reqs = make_reqs(steps=4)
        by_res = prep(pipe, reqs)
        for _ in range(3):
            pipe.denoise_step_mixed(by_res)
        for r in reqs:
            assert np.isfinite(np.asarray(r.latents)).all()
        (entry,) = pipe._sd3_state.values()
        key = next(iter(entry["state"]))
        # compact mode caches both streams
        assert isinstance(entry["state"][key]["out"], dict)
        assert set(entry["state"][key]["out"]) == {"x", "c"}
        # at half capacity some rows must have reused at least once
        hits = max(int(np.asarray(e["hits"]).max())
                   for e in entry["state"].values())
        assert hits >= 1

    def test_single_resolution_takes_token_path_with_cache(self):
        pipe = self._pipe(fraction=0.5)
        reqs = [Request(f"r{i}", SamplingParams(prompt="x", resolution=256,
                                                num_inference_steps=3, seed=i))
                for i in range(2)]
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        by_res = {256: reqs}
        for _ in range(2):
            pipe.denoise_step_mixed(by_res)
        assert all(r.remain_steps == 1 for r in reqs)
        assert getattr(pipe, "_sd3_state", None)
