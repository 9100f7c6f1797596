"""Warm-key routing: a COLD mixed compile key must never stall serving.

Measured failure this guards (exp/serving_sdxl_mixed_v5e_r2.json): the r2l
mixed pass prewarmed two hand-listed compositions, then a 512:1+1024:1
admission minted TWO cold patched-path keys mid-pass (~150 s each through
the relay) and aborted 10/12 requests.  Fixes under test:

1. ``enumerate_mixed_compositions`` — prewarm "auto" covers EVERY reachable
   mixed compile key (the key is a pure function of bucketed counts).
2. Worker-level routing — ``denoise_step_mixed(allow_cold=False)`` serves a
   cold-key mix as dense per-res groups (always-warm keys) and warms the
   mixed programs on throwaway requests in a daemon thread.
"""

import time

import numpy as np

from sduss_tpu.config import Config, ModelConfig, ParallelConfig
from sduss_tpu.engine.engine import Engine
from sduss_tpu.ops import patching
from sduss_tpu.request import Request, SamplingParams, Stage


def _cfg(model="sd15", **cache):
    c = Config()
    c.model = ModelConfig(model=model, dtype="float32", test_tiny=True)
    c.parallel = ParallelConfig(dp=1)
    c.scheduler.policy = "fcfs_mixed"
    c.scheduler.use_mixed_resolution = True
    c.scheduler.patch_size = 128  # cells=16: res 128 -> 1x1, 256 -> 2x2
    c.scheduler.batch_buckets = (1, 2, 4)
    c.scheduler.max_batch_size = 4
    if cache:
        for k, v in cache.items():
            setattr(c.cache, k, v)
    return c


def _req(rid, res, steps=4):
    return Request(rid, SamplingParams(prompt=f"p {res}", resolution=res,
                                       num_inference_steps=steps, seed=res))


class TestEnumerate:
    PB = (4, 8, 12, 16, 20, 24, 32, 40, 48, 64)
    IB = (1, 2, 4, 8)

    @staticmethod
    def _pair_key(g, pb, ib):
        return (patching.build_meta(g, 0, pb, ib).compile_key
                + patching.double_meta(g, 0, pb, ib).compile_key)

    def test_covers_every_composition_key(self):
        grids = {512: 2, 1024: 4}
        comps = patching.enumerate_mixed_compositions(grids, 8, self.PB,
                                                      self.IB)
        keys = set()
        for c in comps:
            g = tuple(gg for r, n in sorted(c.items())
                      for gg in [grids[r]] * n)
            keys.add(self._pair_key(g, self.PB, self.IB))
        assert len(keys) == len(comps)  # one representative per key
        # exhaustive check: every admissible composition's key is covered
        for n_small in range(1, 8):
            for n_large in range(1, 9 - n_small):
                g = (2,) * n_small + (4,) * n_large
                assert self._pair_key(g, self.PB, self.IB) in keys, \
                    (n_small, n_large)

    def test_colliding_singles_get_separate_representatives(self):
        """(2,4,4) and (2,2,4,4) share build_meta.compile_key under image
        buckets (2,4,8) — the 2-class buckets 1 and 2 images both to 2 —
        but their CFG-DOUBLED metas bucket to ipc 2 vs 4.  The r2n mixed
        serving pass crashed on exactly this: the second composition
        retraced the first's closure (grouped-attention reshape error).
        Enumeration must emit BOTH."""
        ib = (2, 4, 8)
        a, b = (2, 4, 4), (2, 2, 4, 4)
        assert (patching.build_meta(a, 0, self.PB, ib).compile_key
                == patching.build_meta(b, 0, self.PB, ib).compile_key)
        assert (patching.double_meta(a, 0, self.PB, ib).compile_key
                != patching.double_meta(b, 0, self.PB, ib).compile_key)
        comps = patching.enumerate_mixed_compositions(
            {512: 2, 1024: 4}, 8, self.PB, ib)
        keys = set()
        for c in comps:
            g = tuple(gg for r, n in sorted(c.items())
                      for gg in [{512: 2, 1024: 4}[r]] * n)
            keys.add(self._pair_key(g, self.PB, ib))
        assert self._pair_key(a, self.PB, ib) in keys
        assert self._pair_key(b, self.PB, ib) in keys

    def test_sd15_space_is_large_and_cappable(self):
        """SD1.5's {256,512,768} space enumerates hundreds of keys — the
        measured r3c prewarm burn (309 keys x ~3 min relay compiles).
        EngineConfig.prewarm_mixed_limit slices the SMALLEST total batches
        first (rolling admission reaches them soonest); the engine logs
        the cap (no silent truncation) and warm-key routing serves the
        tail dense."""
        grids = {256: 1, 512: 2, 768: 3}
        comps = patching.enumerate_mixed_compositions(grids, 12, self.PB,
                                                      (1, 2, 4, 8, 12))
        assert len(comps) > 100  # the intractable-by-default space
        ordered = sorted(comps, key=lambda c: (sum(c.values()),
                                               sorted(c.items())))
        capped, dropped = ordered[:24], ordered[24:]
        assert len(capped) == 24 and dropped
        assert max(sum(c.values()) for c in capped) \
            <= min(sum(c.values()) for c in dropped)

    def test_single_resolution_yields_nothing(self):
        assert patching.enumerate_mixed_compositions(
            {512: 2}, 8, self.PB, self.IB) == []


class TestWorkerRouting:
    def _mixed_batch(self, pipe, rids=("a", "b"), steps=4):
        reqs = [_req(rids[0], 128, steps), _req(rids[1], 256, steps)]
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        return reqs, {128: [reqs[0]], 256: [reqs[1]]}

    def test_cold_mix_serves_dense_then_warms(self):
        eng = Engine(_cfg())
        pipe = eng.workers[0].pipeline
        reqs, by_res = self._mixed_batch(pipe)
        lat_before = [np.asarray(r.latents) for r in reqs]
        pipe.denoise_step_mixed(by_res, allow_cold=False)  # Worker's call
        # the step still ran (dense route) and the warm request was queued
        assert all(not np.allclose(np.asarray(r.latents), lb)
                   for r, lb in zip(reqs, lat_before))
        assert pipe._mixed_warm_pending == {((128, 1), (256, 1))}
        t = pipe._mixed_warm_thread
        if t is not None:
            t.join(timeout=300)
        # the daemon minted the patched-path program
        assert any(isinstance(k, tuple) and k and k[0] == "denoise_mixed"
                   for k in pipe._executed_keys)
        # the next step takes the patched path directly (no new warm queue)
        pending_before = set(pipe._mixed_warm_pending)
        pipe.denoise_step_mixed(by_res, allow_cold=False)
        assert pipe._mixed_warm_pending == pending_before

    def test_allow_cold_direct_call_compiles_inline(self):
        eng = Engine(_cfg())
        pipe = eng.workers[0].pipeline
        _, by_res = self._mixed_batch(pipe)
        pipe.denoise_step_mixed(by_res)  # default allow_cold=True
        assert any(isinstance(k, tuple) and k and k[0] == "denoise_mixed"
                   for k in pipe._executed_keys)
        assert not pipe._mixed_warm_pending

    def test_routing_is_exact(self):
        """A trajectory that starts dense-routed and flips to the patched
        path mid-flight must equal the always-patched trajectory (both
        paths are exact; the flip itself must not corrupt state)."""
        steps = 4
        cold = Engine(_cfg())
        cp = cold.workers[0].pipeline
        creqs, cby = self._mixed_batch(cp, steps=steps)
        pipe_warmed = False
        for s in range(steps):
            cp.denoise_step_mixed(cby, allow_cold=False)
            if not pipe_warmed and cp._mixed_warm_thread is not None:
                cp._mixed_warm_thread.join(timeout=300)  # flip next step
                pipe_warmed = True

        warm = Engine(_cfg())
        wp = warm.workers[0].pipeline
        wreqs, wby = self._mixed_batch(wp, steps=steps)
        for s in range(steps):
            wp.denoise_step_mixed(wby)  # always patched (inline compile)

        for cr, wr in zip(creqs, wreqs):
            np.testing.assert_allclose(
                np.asarray(cr.latents, np.float32),
                np.asarray(wr.latents, np.float32), atol=2e-4)


class TestCollidingCompositions:
    def test_colliding_compositions_both_serve(self):
        """Pipeline-level regression for the r2n mixed serving crash: serve
        composition {256:1, 512:2} then {256:2, 512:2} through ONE pipeline.
        Their single metas share a compile key under batch buckets (2,4,8);
        the doubled metas differ (ipc 2 vs 4 for the 256 class).  Before the
        jit key included meta2.compile_key, the second composition retraced
        the first's closure and died on a grouped-attention reshape."""
        c = _cfg()
        c.scheduler.batch_buckets = (2, 4, 8)
        c.scheduler.max_batch_size = 8
        eng = Engine(c)
        pipe = eng.workers[0].pipeline
        keys_seen = set()
        for comp in ({256: 1, 512: 2}, {256: 2, 512: 2}):
            reqs = [_req(f"{res}-{i}", res, 2)
                    for res, n in sorted(comp.items()) for i in range(n)]
            pipe.prepare(reqs)
            by_res = {}
            for r in reqs:
                r.stage = Stage.DENOISING
                by_res.setdefault(r.resolution, []).append(r)
            pipe.denoise_step_mixed(by_res)
            for r in reqs:
                assert np.isfinite(np.asarray(r.latents, np.float32)).all()
            keys_seen |= {k for k in pipe._executed_keys
                          if isinstance(k, tuple) and k
                          and k[0] == "denoise_mixed"}
        assert len(keys_seen) == 2  # distinct programs, no collision


class TestSD3TokenRouting:
    def test_uniform_cache_batch_routes_then_warms(self):
        c = _cfg(model="sd3", enabled=True, mode="compact",
                 compact_fraction=0.5, max_hits=4)
        eng = Engine(c)
        pipe = eng.workers[0].pipeline
        reqs = [_req("a", 128), _req("b", 128)]
        eng.add_requests(reqs)
        outs = []
        it = 0
        while eng.has_unfinished_requests():
            outs.extend(eng.step())
            it += 1
            assert it < 200
        assert len(outs) == 2
        t = pipe._mixed_warm_thread
        if t is not None:
            t.join(timeout=120)
        assert any(isinstance(k, tuple) and k and k[0] == "sd3_mixed"
                   for k in pipe._executed_keys)
