"""Composition-state lifecycle + decode capacity gating.

The serving stores (_comp_state / _sd3_state / _disp_state) key entries by
the exact request-id tuple, so an entry touching a finished request can
never be reused — it must be freed before the VAE decode (the pipeline's
HBM peak).  Root cause of the r2y SDXL hybrid serving OOM: a dead b8
1024^2 hybrid entry (~3.5 GB) stayed resident through its own batch's
postprocess.  (Reference analog: its cache tensors die with the request's
torch graph; the composition store is this rebuild's structure, so the
lifecycle is ours to manage.)
"""

import numpy as np

from sduss_tpu.config import Config, ModelConfig
from sduss_tpu.pipelines import build_pipeline
from sduss_tpu.request import Request, SamplingParams


def _cfg(family: str = "sd15") -> Config:
    c = Config()
    c.model = ModelConfig(model=family, dtype="float32", test_tiny=True)
    return c


def _reqs(n, steps=4, res=128):
    return [Request(f"ev{i}", SamplingParams(prompt="x", resolution=res,
                                             num_inference_steps=steps))
            for i in range(n)]


def _drive(pipe, reqs, steps):
    pipe.prepare(reqs)
    by_res = {reqs[0].resolution: reqs}
    for _ in range(steps):
        pipe.denoise_step(by_res)
    return by_res


class TestEvictFinishedState:
    def test_compact_state_dropped_at_postprocess(self):
        cfg = _cfg()
        cfg.cache.enabled = True
        cfg.cache.mode = "compact"
        cfg.cache.compact_fraction = 0.5
        pipe = build_pipeline(cfg)
        reqs = _reqs(2)
        by_res = _drive(pipe, reqs, 4)
        assert getattr(pipe, "_comp_state", None), \
            "compact serving should have minted composition state"
        pipe.postprocess(by_res)
        assert not pipe._comp_state, \
            "finished requests' composition entries must be evicted"
        for r in reqs:
            assert r.output is not None

    def test_hybrid_state_dropped_at_postprocess(self):
        cfg = _cfg()
        cfg.cache.enabled = True
        cfg.cache.mode = "deep"
        cfg.cache.deep_interval = 2
        cfg.cache.deep_warmup = 1
        cfg.cache.deep_compact_fraction = 0.5
        pipe = build_pipeline(cfg)
        reqs = _reqs(2)
        by_res = _drive(pipe, reqs, 4)
        assert getattr(pipe, "_comp_state", None)
        pipe.postprocess(by_res)
        assert not pipe._comp_state

    def test_eviction_keeps_unrelated_entries(self):
        cfg = _cfg()
        cfg.cache.enabled = True
        cfg.cache.mode = "compact"
        cfg.cache.compact_fraction = 0.5
        pipe = build_pipeline(cfg)
        a, b = _reqs(2, steps=6)
        pipe.prepare([a, b])
        pipe.denoise_step({128: [a]})
        pipe.denoise_step({128: [b]})
        assert len(pipe._comp_state) == 2
        pipe.evict_finished_state([a.request_id])
        keys = list(pipe._comp_state)
        assert len(keys) == 1
        assert (b.request_id,) in [part for part in keys[0]
                                   if isinstance(part, tuple)]

    def test_worker_abort_evicts(self):
        from sduss_tpu.engine.worker import Worker

        cfg = _cfg()
        cfg.cache.enabled = True
        cfg.cache.mode = "compact"
        cfg.cache.compact_fraction = 0.5
        w = Worker(0, build_pipeline(cfg), cfg)
        reqs = _reqs(2, steps=8)
        w.add_requests(reqs)
        for _ in range(6):
            w.step()
        assert getattr(w.pipeline, "_comp_state", None)
        w.abort_requests([r.request_id for r in reqs])
        assert not w.pipeline._comp_state


class TestDecodeCapacityChunk:
    def test_huge_per_image_forces_singleton_decode(self, monkeypatch):
        cfg = _cfg()
        cfg.scheduler.decode_batch = 4
        cfg.engine.decode_bytes_per_pixel = 1e12  # forces chunk 1
        pipe = build_pipeline(cfg)
        reqs = _reqs(3, steps=2)
        by_res = _drive(pipe, reqs, 2)
        calls = []
        orig = pipe._decode_group

        def spy(res, group):
            calls.append(len(group))
            return orig(res, group)

        monkeypatch.setattr(pipe, "_decode_group", spy)
        pipe.postprocess(by_res)
        assert calls == [1, 1, 1]
        assert all(r.output is not None for r in reqs)

    def test_ample_headroom_keeps_configured_chunk(self):
        cfg = _cfg()
        cfg.scheduler.decode_batch = 4
        pipe = build_pipeline(cfg)
        # tiny params + tiny state: chunk must not be reduced below config
        assert pipe._decode_capacity_chunk(128) >= 4

    def test_live_state_shrinks_chunk(self):
        cfg = _cfg()
        pipe = build_pipeline(cfg)
        lim = float(cfg.engine.hbm_bytes_fallback)
        per_img = float(cfg.engine.decode_bytes_per_pixel) * 1024 * 1024

        class FakeLeaf:
            nbytes = int(lim)  # live state alone fills the budget

        pipe._comp_state = {("k", 0, 0, ("x",), ()): {"state": FakeLeaf()}}
        assert pipe._decode_capacity_chunk(1024) == 1
        pipe._comp_state.clear()
        assert pipe._decode_capacity_chunk(1024) >= int(
            (lim - cfg.engine.decode_hbm_margin) // per_img) - 1
