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
    outs = []
    while eng.has_unfinished_requests():
        outs.extend(eng.step())
    [out] = outs
    assert np.isfinite(out.image.astype(np.float32)).all()

    worker = eng.workers[0]
    st = worker.pipeline._disp_state
    assert len(st) == 1
    (key, entry), = st.items()
    assert entry["warm"] == 4  # all 4 denoise iterations threaded state
    assert entry["kv"]  # stale-KV pytree captured for the next step
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
    while eng.has_unfinished_requests():
        outs.extend(eng.step())
    assert len(outs) == 2
    for out in outs:
        assert np.isfinite(out.image.astype(np.float32)).all()
    # the mid-flight arrival ran as its own composition: a SECOND state
    # entry was minted and threaded, and — because state is keyed by
    # composition — interleaved batches did not thrash each other's KV
    # (each entry's warm counter kept advancing past its sync warmup)
    entries = {e["comp"]: e for e in worker.pipeline._disp_state.values()}
    assert ("rb",) in entries
    assert entries[("rb",)]["warm"] >= 2 and entries[("rb",)]["kv"]
    assert entries[("ra",)]["warm"] == 6  # never reset by rb's batches


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
    while eng.has_unfinished_requests():
        outs.extend(eng.step())
    assert len(outs) == 2
    worker = eng.workers[0]
    entries = {e["comp"]: e for e in worker.pipeline._disp_state.values()}
    assert ("ja", "jb") in entries
    assert entries[("ja", "jb")]["warm"] == 3


def test_displaced_cache_precedence_falls_back():
    """cache.enabled takes precedence: the displaced path must not engage
    (block caches don't thread through the serving shard_map seam yet)."""
    from sduss_tpu.entrypoints.offline import DiffusionPipeline

    c = _cfg(warmup=1)
    c.cache.enabled = True
    c.cache.mode = "deep"
    c.cache.deep_interval = 2
    pipe = DiffusionPipeline(config=c)
    outs = pipe.generate(["a"], resolution=256, num_inference_steps=4, seed=5)
    assert np.isfinite(outs[0].image.astype(np.float32)).all()
    worker = pipe.engine.workers[0]
    assert not getattr(worker.pipeline, "_disp_state", {})


def test_displaced_sd3_serving():
    """MMDiTShardContext rides the same serving seam for SD3."""
    from sduss_tpu.entrypoints.offline import DiffusionPipeline

    c = _cfg(family="sd3", warmup=1)
    pipe = DiffusionPipeline(config=c)
    outs = pipe.generate(["a"], resolution=256, num_inference_steps=3, seed=7)
    assert np.isfinite(outs[0].image.astype(np.float32)).all()
    worker = pipe.engine.workers[0]
    assert worker.pipeline._disp_state  # displaced path actually engaged
