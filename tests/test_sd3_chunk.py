"""Fused multi-step dispatch (SchedulerConfig.steps_per_dispatch).

pipelines/sd3.py denoise_chunk runs k sampler steps in ONE jitted program
(in-graph fori_loop over the same trunk builders as the per-step path).
These tests pin: chunk == k per-step calls for every supported cache mode,
ineligible configurations fall back (return False), and the worker serves
correctly with chunking on.
"""

import numpy as np
import pytest

from sduss_tpu.config import CacheConfig, Config, ModelConfig, SchedulerConfig
from sduss_tpu.pipelines import build_pipeline
from sduss_tpu.request import Request, SamplingParams, Stage


def make_pipe(cache=None, span=None, interval=2, fine=0.0, predict=0.0,
              sampler=None):
    config = Config()
    config.model = ModelConfig(model="sd3", test_tiny=True, dtype="float32",
                               resolutions=(256, 512))
    config.scheduler = SchedulerConfig(use_mixed_resolution=True)
    if sampler is not None:
        config.model.sampler = sampler
    cc = CacheConfig(enabled=cache is not None or span is not None,
                     deep_interval=interval, deep_warmup=0,
                     sd3_deep_span=span, deep_predict=predict, max_hits=4)
    if cache == "compact":
        cc.mode = "compact"
        cc.compact_fraction = 0.5
        cc.patch_fraction = fine if fine > 0 else 1.0
    elif span is not None:
        cc.mode = "deep"
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


def _run_per_step(pipe, by_res, n):
    for _ in range(n):
        pipe.denoise_step(by_res)


class TestChunkExactness:
    def _compare(self, mk, k=6, pre_steps=0, atol=5e-4):
        """chunk(k) after ``pre_steps`` per-step calls == k+pre_steps
        per-step calls."""
        a_pipe = mk()
        a = make_reqs(steps=pre_steps + k)
        by_a = prep(a_pipe, a)
        _run_per_step(a_pipe, by_a, pre_steps)
        ok = a_pipe.denoise_chunk(by_a, k)
        assert ok, "chunk unexpectedly ineligible"

        b_pipe = mk()
        b = make_reqs(steps=pre_steps + k)
        by_b = prep(b_pipe, b)
        _run_per_step(b_pipe, by_b, pre_steps + k)

        for x, y in zip(a, b):
            assert x.remain_steps == y.remain_steps == 0
            np.testing.assert_allclose(np.asarray(x.latents, np.float32),
                                       np.asarray(y.latents, np.float32),
                                       atol=atol, rtol=5e-3)

    def test_dense_chunk_matches_per_step(self):
        self._compare(lambda: make_pipe(), k=4)

    def test_compact_chunk_matches_per_step(self):
        # one per-step call first: the anchoring sync program must run
        # before any chunk (denoise_chunk refuses un-anchored state)
        self._compare(lambda: make_pipe(cache="compact"), k=4, pre_steps=1)

    def test_span_chunk_matches_per_step(self):
        # fresh entry => phase itv-1 => step 0 is full
        self._compare(lambda: make_pipe(span=(1, 2), interval=2), k=4)

    def test_span_chunk_off_boundary_phase(self):
        """Chunks entering MID-interval carry the phase as a traced scalar
        (in-chunk full iff (phase+j) % itv == itv-1) — the old
        full-boundary gate left long-interval serving on per-step
        dispatch.  pre_steps=2 at interval 4 enters at age 1; the chunk
        spans the interior full."""
        self._compare(lambda: make_pipe(span=(1, 2), interval=4), k=4,
                      pre_steps=2)

    def test_span_chunk_no_full_inside(self):
        """A chunk wholly inside the shallow phase (interval 12 > k=3,
        entry age 1) runs all-shallow and ages the delta by k."""
        pipe = make_pipe(span=(1, 2), interval=12)
        reqs = make_reqs(steps=8)
        by_res = prep(pipe, reqs)
        _run_per_step(pipe, by_res, 2)  # full at step 0, age now 1
        (entry,) = pipe._sd3_state.values()
        assert entry["deep_age"] == 1
        assert pipe.denoise_chunk(by_res, 3) is True
        (entry,) = pipe._sd3_state.values()
        assert entry["deep_age"] == 4  # aged by k, no in-chunk full
        self._compare(lambda: make_pipe(span=(1, 2), interval=12), k=3,
                      pre_steps=2)

    def test_span_compact_chunk_matches_per_step(self):
        self._compare(lambda: make_pipe(cache="compact", span=(1, 2),
                                        interval=2), k=4, pre_steps=2)

    def test_fine_chunk_matches_per_step(self):
        self._compare(lambda: make_pipe(cache="compact", fine=0.5), k=4,
                      pre_steps=1)


class TestChunkEligibility:
    def test_unanchored_compact_refuses(self):
        pipe = make_pipe(cache="compact")
        reqs = make_reqs(steps=4)
        by_res = prep(pipe, reqs)
        assert pipe.denoise_chunk(by_res, 4) is False

    def test_span_off_boundary_now_eligible(self):
        """Round-3: the full-boundary gate is gone — a mid-interval chunk
        carries its phase and stays exact (TestChunkExactness covers the
        equality)."""
        pipe = make_pipe(span=(1, 2), interval=3)
        reqs = make_reqs(steps=8)
        by_res = prep(pipe, reqs)
        _run_per_step(pipe, by_res, 1)  # full ran; age 0 -> mid-interval
        assert pipe.denoise_chunk(by_res, 3) is True

    def test_mixed_resolutions_refuse(self):
        pipe = make_pipe()
        reqs = [Request("a", SamplingParams(prompt="a", resolution=256,
                                            num_inference_steps=4, seed=0)),
                Request("b", SamplingParams(prompt="b", resolution=512,
                                            num_inference_steps=4, seed=1))]
        by_res = prep(pipe, reqs)
        assert pipe.denoise_chunk(by_res, 4) is False

    def test_short_requests_refuse(self):
        pipe = make_pipe()
        reqs = make_reqs(steps=2)
        by_res = prep(pipe, reqs)
        assert pipe.denoise_chunk(by_res, 4) is False

    def test_span_predict_refuses(self):
        pipe = make_pipe(span=(1, 2), interval=2, predict=0.5)
        reqs = make_reqs(steps=6)
        by_res = prep(pipe, reqs)
        assert pipe.denoise_chunk(by_res, 4) is False

    def test_cold_key_refuses_when_allow_cold_false(self):
        pipe = make_pipe()
        reqs = make_reqs(steps=6)
        by_res = prep(pipe, reqs)
        assert pipe.denoise_chunk(by_res, 4, allow_cold=False) is False
        assert pipe.denoise_chunk(by_res, 4, allow_cold=True) is True
        reqs2 = make_reqs(steps=6)
        by_res2 = prep(pipe, reqs2)
        assert pipe.denoise_chunk(by_res2, 4, allow_cold=False) is True


@pytest.mark.slow
class TestChunkServing:
    def test_engine_serves_with_chunking(self):
        from sduss_tpu.engine.engine import Engine

        c = Config()
        c.model = ModelConfig(model="sd3", test_tiny=True, dtype="float32",
                              resolutions=(256,))
        c.scheduler.use_mixed_resolution = True
        c.scheduler.policy = "esymred"
        c.scheduler.steps_per_dispatch = 3
        # Slack math runs against the WALL clock: a loaded CPU host can
        # blow the real-chip-derived deadlines and shed the whole batch,
        # which is not what this test pins (chunked dispatch is).  A huge
        # scale keeps ESyMReD in the loop without SLO pressure.
        c.scheduler.slo_scale = 1000.0
        c.cache = CacheConfig(enabled=True, mode="deep",
                              sd3_deep_span=(1, 2), deep_interval=3,
                              deep_warmup=0)
        eng = Engine(c)
        eng.prewarm(resolutions=(256,))
        pipe = eng.workers[0].pipeline
        chunk_keys = [kk for kk in pipe._executed_keys
                      if isinstance(kk, tuple) and kk[0] == "sd3_chunk"]
        assert chunk_keys, "prewarm did not mint the chunk program"
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
