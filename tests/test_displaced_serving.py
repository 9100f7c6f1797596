"""Displaced (stale-KV) sequence parallelism on the SERVING path.

The runner-level displaced path (parallel/displaced.py, tests/test_displaced
.py) drives whole offline trajectories; these tests cover its integration
into the engine's per-iteration denoise step (pipelines/base.py
_denoise_group_displaced): KV state carried across engine iterations,
sync re-warmup at batch-composition boundaries, and precedence rules.

Reference analog: DistriFuser's displaced patch parallelism
(distrifuser/utils.py:23-66) — which the reference only ever runs offline;
continuous-batching integration is beyond it.
"""

from __future__ import annotations

import numpy as np
import pytest

from sduss_tpu.config import Config, ModelConfig, ParallelConfig


def _cfg(family="sd15", sp=2, warmup=2, **par_kw):
    c = Config()
    c.model = ModelConfig(model=family, test_tiny=True, dtype="float32")
    c.parallel = ParallelConfig(dp=1, sp=sp, sp_mode="displaced",
                                displaced_warmup=warmup, **par_kw)
    return c


def test_sp_mode_validation():
    with pytest.raises(ValueError):
        ParallelConfig(sp_mode="nope")
    with pytest.raises(ValueError):
        ParallelConfig(sp=2, tp=2, sp_mode="displaced")
    with pytest.raises(ValueError):
        ParallelConfig(sp=2, sp_mode="displaced", displaced_warmup=0)


def test_displaced_all_sync_matches_dense():
    """warmup >= num_steps => every step gathers fresh KV (exact): images
    match the single-device dense engine."""
    from sduss_tpu.entrypoints.offline import DiffusionPipeline

    pipe = DiffusionPipeline(config=_cfg(warmup=99))
    outs = pipe.generate(["a cat"], resolution=256, num_inference_steps=3,
                         seed=11)

    dense_cfg = Config()
    dense_cfg.model = ModelConfig(model="sd15", test_tiny=True,
                                  dtype="float32")
    pipe2 = DiffusionPipeline(config=dense_cfg)
    outs2 = pipe2.generate(["a cat"], resolution=256, num_inference_steps=3,
                           seed=11)
    np.testing.assert_allclose(outs[0].image.astype(np.int32),
                               outs2[0].image.astype(np.int32), atol=2)


def test_displaced_stale_steps_and_state():
    """After displaced_warmup sync steps the stale program runs; output stays
    finite and close to dense (KV one step stale, DistriFuser's trade)."""
    from sduss_tpu.engine.engine import Engine
    from sduss_tpu.request import SamplingParams

    c = _cfg(warmup=1)
    eng = Engine(c)
    eng.add_request("r0", SamplingParams(prompt="p", resolution=256,
                                         num_inference_steps=4, seed=3))
    worker = eng.workers[0]
    snap = {}
    outs = []
    while eng.has_unfinished_requests():
        outs.extend(eng.step())
        # composition state lives only while its requests do (finish-time
        # eviction, session-11 OOM fix) — snapshot it while running
        for k, e in getattr(worker.pipeline, '_disp_state', {}).items():
            snap[k] = {"warm": e["warm"], "kv": bool(e["kv"])}
    [out] = outs
    assert np.isfinite(out.image.astype(np.float32)).all()

    assert len(snap) == 1
    (key, entry), = snap.items()
    assert entry["warm"] == 4  # all 4 denoise iterations threaded state
    assert entry["kv"]  # stale-KV pytree captured for the next step
    assert not worker.pipeline._disp_state  # evicted once finished
    # both step programs (sync + stale) were minted
    names = [k[0] for k in worker.pipeline._fns
             if isinstance(k, tuple) and k[0] == "denoise_displaced"]
    assert len(names) == 2


def test_displaced_composition_change_resets_state():
    """An admission mid-flight is a state boundary: the new batch
    composition gets a FRESH state entry (sync warmup re-runs), keyed by
    composition so interleaved same-bucket batches don't thrash."""
    from sduss_tpu.engine.engine import Engine
    from sduss_tpu.request import SamplingParams

    c = _cfg(warmup=1)
    c.scheduler.batch_buckets = (2,)
    c.scheduler.max_batch_size = 2
    eng = Engine(c)
    eng.add_request("ra", SamplingParams(prompt="a", resolution=256,
                                         num_inference_steps=6, seed=1))
    outs = []
    # prepare + 2 denoise iterations solo
    for _ in range(3):
        outs.extend(eng.step())
    worker = eng.workers[0]
    st = worker.pipeline._disp_state
    (key, entry), = st.items()
    assert entry["warm"] >= 1
    assert entry["comp"] == ("ra",)

    eng.add_request("rb", SamplingParams(prompt="b", resolution=256,
                                         num_inference_steps=6, seed=2))
    snap = {}
    while eng.has_unfinished_requests():
        outs.extend(eng.step())
        for e in getattr(worker.pipeline, '_disp_state', {}).values():
            snap[e["comp"]] = {"warm": e["warm"], "kv": bool(e["kv"])}
    assert len(outs) == 2
    for out in outs:
        assert np.isfinite(out.image.astype(np.float32)).all()
    # the mid-flight arrival ran as its own composition: a SECOND state
    # entry was minted and threaded, and — because state is keyed by
    # composition — interleaved batches did not thrash each other's KV
    # (each entry's warm counter kept advancing past its sync warmup);
    # finish-time eviction then freed every entry
    assert ("rb",) in snap
    assert snap[("rb",)]["warm"] >= 2 and snap[("rb",)]["kv"]
    assert snap[("ra",)]["warm"] == 6  # never reset by rb's batches
    assert not worker.pipeline._disp_state


def test_displaced_joint_batch_composition():
    """Requests admitted together share one composition entry."""
    from sduss_tpu.engine.engine import Engine
    from sduss_tpu.request import SamplingParams

    c = _cfg(warmup=1)
    c.scheduler.batch_buckets = (2,)
    c.scheduler.max_batch_size = 2
    eng = Engine(c)
    eng.add_request("ja", SamplingParams(prompt="a", resolution=256,
                                         num_inference_steps=3, seed=1))
    eng.add_request("jb", SamplingParams(prompt="b", resolution=256,
                                         num_inference_steps=3, seed=2))
    outs = []
    worker = eng.workers[0]
    snap = {}
    while eng.has_unfinished_requests():
        outs.extend(eng.step())
        for e in getattr(worker.pipeline, '_disp_state', {}).values():
            snap[e["comp"]] = e["warm"]
    assert len(outs) == 2
    assert snap.get(("ja", "jb")) == 3


def test_displaced_gated_cache_precedence_falls_back():
    """Gated cache modes (hybrid rows / adaptive refresh) keep GSPMD
    precedence: their batch-global row gathers don't shard over 'sp'."""
    from sduss_tpu.entrypoints.offline import DiffusionPipeline

    c = _cfg(warmup=1)
    c.cache.enabled = True
    c.cache.mode = "deep"
    c.cache.deep_interval = 2
    c.cache.deep_compact_fraction = 0.5  # hybrid => fallback
    pipe = DiffusionPipeline(config=c)
    outs = pipe.generate(["a"], resolution=256, num_inference_steps=4, seed=5)
    assert np.isfinite(outs[0].image.astype(np.float32)).all()
    worker = pipe.engine.workers[0]
    assert not getattr(worker.pipeline, "_disp_state", {})


def test_displaced_deep_composes_on_seam():
    """PLAIN deep interval rides the displaced serving seam (round-3
    composition): full/shallow programs alternate, each with its own
    per-program KV dict, and the deep feature lives as composition state."""
    from sduss_tpu.engine.engine import Engine
    from sduss_tpu.request import SamplingParams

    c = _cfg(warmup=1)
    c.cache.enabled = True
    c.cache.mode = "deep"
    c.cache.deep_interval = 3
    c.cache.deep_warmup = 1
    eng = Engine(c)
    eng.add_request("d0", SamplingParams(prompt="p", resolution=256,
                                         num_inference_steps=6, seed=9))
    outs = []
    pipe = eng.workers[0].pipeline
    snap = {}
    while eng.has_unfinished_requests():
        outs.extend(eng.step())
        for e in getattr(pipe, '_disp_state', {}).values():
            snap[e["comp"]] = {"warm": e["warm"], "deep": e["deep"] is not None,
                               "modes": {m for m, kv in e["kv"].items() if kv}}
    [out] = outs
    assert np.isfinite(out.image.astype(np.float32)).all()
    (entry,) = snap.values()
    assert entry["warm"] == 6
    assert entry["deep"]  # composition-keyed deep feature
    # both mode programs carried their own KV dicts
    assert entry["modes"] == {"full", "shallow"}
    assert not pipe._disp_state  # finish-time eviction


def test_displaced_deep_all_sync_matches_dense_deep():
    """displaced_warmup >= steps => every displaced step gathers fresh KV;
    with the deep cache on both sides, displaced x deep must EXACTLY match
    the single-device dense deep engine (same interval/warmup)."""
    from sduss_tpu.entrypoints.offline import DiffusionPipeline

    def cache_on(c):
        c.cache.enabled = True
        c.cache.mode = "deep"
        c.cache.deep_interval = 3
        c.cache.deep_warmup = 1
        return c

    pipe = DiffusionPipeline(config=cache_on(_cfg(warmup=99)))
    inner = pipe.engine.workers[0].pipeline
    seen = {"engaged": False}
    orig = inner.evict_finished_state

    def spy(ids):
        seen["engaged"] = seen["engaged"] or bool(inner._disp_state)
        orig(ids)

    inner.evict_finished_state = spy
    outs = pipe.generate(["a cat"], resolution=256, num_inference_steps=5,
                         seed=11)
    assert seen["engaged"]  # seam engaged (state live until finish-eviction)

    dense_cfg = Config()
    dense_cfg.model = ModelConfig(model="sd15", test_tiny=True,
                                  dtype="float32")
    cache_on(dense_cfg)
    pipe2 = DiffusionPipeline(config=dense_cfg)
    outs2 = pipe2.generate(["a cat"], resolution=256, num_inference_steps=5,
                          seed=11)
    np.testing.assert_allclose(outs[0].image.astype(np.int32),
                               outs2[0].image.astype(np.int32), atol=2)


def test_displaced_sd3_serving():
    """MMDiTShardContext rides the same serving seam for SD3."""
    from sduss_tpu.entrypoints.offline import DiffusionPipeline

    c = _cfg(family="sd3", warmup=1)
    pipe = DiffusionPipeline(config=c)
    inner = pipe.engine.workers[0].pipeline
    seen = {"engaged": False}
    orig = inner.evict_finished_state

    def spy(ids):
        seen["engaged"] = seen["engaged"] or bool(inner._disp_state)
        orig(ids)

    inner.evict_finished_state = spy
    outs = pipe.generate(["a"], resolution=256, num_inference_steps=3, seed=7)
    assert np.isfinite(outs[0].image.astype(np.float32)).all()
    assert seen["engaged"]  # displaced path actually engaged
