"""Fused multi-step dispatch on the MIXED patch path (denoise_chunk_mixed).

Mirrors tests/test_unet_chunk.py for mixed-resolution compositions: a k-step
chunk must equal k per-step denoise_step_mixed calls for dense / block-cache /
deep / hybrid configurations, including ANY-PHASE starts (fulls fire in-graph
at (j + off) % itv == 0 with off a traced scalar, so shallow-only chunks fuse
— the long-interval serving presets would otherwise chunk once per interval).
Host-decision configurations (adaptive refresh, reuse-then-predict,
non-lockstep ages, stateful samplers) must refuse and fall back.
"""

import numpy as np
import pytest

from sduss_tpu.config import CacheConfig, Config, ModelConfig, SchedulerConfig
from sduss_tpu.pipelines import build_pipeline
from sduss_tpu.request import Request, SamplingParams, Stage


def make_pipe(mode=None, interval=2, hybrid=None, adaptive=0.0, predict=0.0,
              warmup=0, mse_threshold=1e9, sampler=None):
    config = Config()
    config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
    if sampler:
        config.model.sampler = sampler
    config.scheduler = SchedulerConfig(use_mixed_resolution=True,
                                       patch_size=256)
    cc = CacheConfig(enabled=mode is not None, deep_interval=interval,
                     deep_warmup=warmup, deep_adaptive=adaptive,
                     deep_predict=predict, max_hits=2, min_level=0,
                     mse_threshold=mse_threshold)
    if mode is not None:
        cc.mode = mode
        if hybrid is not None:
            cc.deep_compact_fraction = hybrid
    config.cache = cc
    return build_pipeline(config)


def make_reqs(steps=6):
    """One 256 + one 512 request: grids (1, 2) — a genuinely mixed batch."""
    return [Request(f"r{i}", SamplingParams(prompt=f"p{i}", resolution=res,
                                            num_inference_steps=steps,
                                            seed=i))
            for i, res in enumerate((256, 512))]


def prep(pipe, reqs):
    pipe.prepare(reqs)
    by_res = {}
    for r in reqs:
        r.stage = Stage.DENOISING
        by_res.setdefault(r.resolution, []).append(r)
    return by_res


def _steps(pipe, by_res, n):
    for _ in range(n):
        pipe.denoise_step_mixed(by_res)


class TestMixedChunkExactness:
    def _compare(self, mk, k=4, pre_steps=0, atol=5e-4):
        a_pipe = mk()
        a = make_reqs(steps=pre_steps + k)
        by_a = prep(a_pipe, a)
        _steps(a_pipe, by_a, pre_steps)
        assert a_pipe.denoise_chunk_mixed(by_a, k), \
            "chunk unexpectedly ineligible"

        b_pipe = mk()
        b = make_reqs(steps=pre_steps + k)
        by_b = prep(b_pipe, b)
        _steps(b_pipe, by_b, pre_steps + k)

        for x, y in zip(a, b):
            assert x.remain_steps == y.remain_steps == 0
            np.testing.assert_allclose(np.asarray(x.latents, np.float32),
                                       np.asarray(y.latents, np.float32),
                                       atol=atol, rtol=5e-3)
        return a_pipe, a, b_pipe, b

    def test_dense(self):
        self._compare(lambda: make_pipe(), k=4)

    def test_block_cache_threads_state(self):
        # mse_threshold=1e9 + max_hits=2: full reuse with forced refresh
        # cycling — the strongest state dependence the gate has
        self._compare(lambda: make_pipe("block"), k=4, pre_steps=1)

    def test_deep_from_boundary(self):
        a_pipe, a, _, b = self._compare(
            lambda: make_pipe("deep", interval=2), k=4, pre_steps=2)
        # lockstep ages advanced like the per-step path
        assert {r.deep_age for r in a} == {r.deep_age for r in b}

    def test_deep_any_phase_shallow_only(self):
        # interval 4, start at age 0 (one step after the full): the 3-step
        # chunk contains NO full — the pure-shallow fusion the long-interval
        # presets need
        a_pipe, a, _, b = self._compare(
            lambda: make_pipe("deep", interval=4), k=3, pre_steps=1)
        assert all(r.deep_age == 3 for r in a)
        assert {r.deep_age for r in a} == {r.deep_age for r in b}

    def test_deep_any_phase_mid_interval_full(self):
        # interval 3, start at age 1: full fires in-graph at j=1
        self._compare(lambda: make_pipe("deep", interval=3), k=4,
                      pre_steps=2)

    def test_hybrid_from_boundary(self):
        self._compare(lambda: make_pipe("deep", interval=2, hybrid=0.5),
                      k=4, pre_steps=2)

    def test_hybrid_any_phase(self):
        self._compare(lambda: make_pipe("deep", interval=3, hybrid=0.5),
                      k=4, pre_steps=2)

    def test_chunk_then_per_step_continues(self):
        # state handed back from the chunk must serve the per-step path
        a_pipe = make_pipe("deep", interval=2, hybrid=0.5)
        a = make_reqs(steps=6)
        by_a = prep(a_pipe, a)
        _steps(a_pipe, by_a, 2)
        assert a_pipe.denoise_chunk_mixed(by_a, 2)
        _steps(a_pipe, by_a, 2)

        b_pipe = make_pipe("deep", interval=2, hybrid=0.5)
        b = make_reqs(steps=6)
        by_b = prep(b_pipe, b)
        _steps(b_pipe, by_b, 6)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x.latents, np.float32),
                                       np.asarray(y.latents, np.float32),
                                       atol=5e-4, rtol=5e-3)


class TestMixedChunkEligibility:
    def test_adaptive_refuses(self):
        pipe = make_pipe("deep", interval=2, adaptive=0.05)
        reqs = make_reqs(steps=6)
        by_res = prep(pipe, reqs)
        _steps(pipe, by_res, 2)
        assert pipe.denoise_chunk_mixed(by_res, 2) is False

    def test_predict_refuses(self):
        pipe = make_pipe("deep", interval=2, predict=0.5)
        reqs = make_reqs(steps=6)
        by_res = prep(pipe, reqs)
        _steps(pipe, by_res, 2)
        assert pipe.denoise_chunk_mixed(by_res, 2) is False

    def test_warmup_refuses(self):
        pipe = make_pipe("deep", interval=2, warmup=4)
        reqs = make_reqs(steps=8)
        by_res = prep(pipe, reqs)
        _steps(pipe, by_res, 2)
        assert pipe.denoise_chunk_mixed(by_res, 2) is False

    def test_non_lockstep_ages_refuse(self):
        pipe = make_pipe("deep", interval=4)
        reqs = make_reqs(steps=8)
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        # advance the two requests separately to different mid-interval ages
        _steps(pipe, {reqs[0].resolution: [reqs[0]]}, 2)  # age 1
        _steps(pipe, {reqs[1].resolution: [reqs[1]]}, 3)  # age 2
        by_res = {reqs[0].resolution: [reqs[0]],
                  reqs[1].resolution: [reqs[1]]}
        assert pipe.denoise_chunk_mixed(by_res, 2) is False

    def test_stateful_sampler_refuses(self):
        pipe = make_pipe(sampler="pndm")
        reqs = make_reqs(steps=6)
        by_res = prep(pipe, reqs)
        assert pipe.denoise_chunk_mixed(by_res, 2) is False

    def test_short_requests_refuse(self):
        pipe = make_pipe()
        reqs = make_reqs(steps=2)
        by_res = prep(pipe, reqs)
        assert pipe.denoise_chunk_mixed(by_res, 4) is False

    def test_cold_key_queues_warm_and_refuses(self):
        pipe = make_pipe()
        reqs = make_reqs(steps=6)
        by_res = prep(pipe, reqs)
        assert pipe.denoise_chunk_mixed(by_res, 2, allow_cold=False) is False


class TestWarmDaemonDefersToProduction:
    def test_wait_idle_blocks_daemon_until_production_quiet(self):
        """The warm daemon must not contend with production device work
        (measured: an unthrottled warm drive at load collapsed the r5b
        mixed qps-1.1 pass to machine SLO 0.0).  _warm_wait_idle blocks
        the daemon thread while production dispatched within the last
        second, and is a no-op off the daemon thread."""
        import threading
        import time

        pipe = make_pipe()
        # off-daemon: returns immediately even right after a stamp
        pipe._production_stamp()
        t0 = time.monotonic()
        pipe._warm_wait_idle()
        assert time.monotonic() - t0 < 0.05

        released = threading.Event()

        def daemon_body():
            pipe._warm_wait_idle(idle_s=0.4)
            released.set()

        pipe._production_stamp()
        th = threading.Thread(target=daemon_body, name="mixed-key-warm")
        th.start()
        assert not released.wait(0.15), "daemon did not defer to production"
        th.join(3.0)
        assert released.is_set(), "daemon never released after idle window"

    def test_daemon_thread_does_not_stamp_production(self):
        import threading
        import time

        pipe = make_pipe()
        pipe._last_production = 0.0

        def daemon_body():
            pipe._production_stamp()

        th = threading.Thread(target=daemon_body, name="mixed-key-warm")
        th.start()
        th.join(2.0)
        assert pipe._last_production == 0.0
        pipe._production_stamp()  # main thread DOES stamp
        assert time.monotonic() - pipe._last_production < 1.0


class TestMixedWarmMintsChunk:
    def test_warm_composition_mints_chunk_key(self):
        pipe = make_pipe("deep", interval=2, hybrid=0.5)
        pipe.config.scheduler.steps_per_dispatch = 2
        pipe._warm_composition(((256, 1), (512, 1)))
        assert any(isinstance(kk, tuple) and kk[0] == "mixed_chunk"
                   for kk in pipe._executed_keys), \
            "warm daemon did not mint the mixed chunk program"


@pytest.mark.slow
class TestMixedChunkServing:
    def test_engine_serves_mixed_with_chunking(self):
        from sduss_tpu.engine.engine import Engine

        c = Config()
        c.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        c.scheduler.use_mixed_resolution = True
        c.scheduler.patch_size = 256
        c.scheduler.policy = "esymred"
        c.scheduler.steps_per_dispatch = 2
        c.cache = CacheConfig(enabled=True, mode="deep", deep_interval=2,
                              deep_warmup=0, deep_compact_fraction=0.5,
                              min_level=0)
        eng = Engine(c)
        reqs = [Request(f"c{i}", SamplingParams(prompt=f"p{i}",
                                                resolution=res,
                                                num_inference_steps=6,
                                                seed=i))
                for i, res in enumerate((256, 256, 512))]
        eng.add_requests(reqs)
        outs = []
        for _ in range(600):
            outs.extend(eng.step())
            if not eng.has_unfinished_requests():
                break
        assert len(outs) == 3 and all(o.finished for o in outs)
        for o in outs:
            assert np.isfinite(np.asarray(o.image).astype(np.float32)).all()
