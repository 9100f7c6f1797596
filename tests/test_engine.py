"""Engine/scheduler/dispatcher tests with tiny models on CPU."""

import time

import numpy as np
import pytest

from sduss_tpu.config import Config, ModelConfig, ParallelConfig, SchedulerConfig
from sduss_tpu.engine.engine import Engine
from sduss_tpu.entrypoints.offline import DiffusionPipeline
from sduss_tpu.request import Request, SamplingParams, Stage
from sduss_tpu.scheduler.policies import get_policy
from sduss_tpu.scheduler.request_pool import RequestPool


def _cfg(policy="fcfs_mixed", dp=1):
    c = Config()
    c.model = ModelConfig(model="sd15", dtype="float32", test_tiny=True)
    c.parallel = ParallelConfig(dp=dp)
    c.scheduler.policy = policy
    c.scheduler.use_mixed_resolution = False  # dense path for engine tests
    return c


def _req(rid, res=128, steps=2, arrival=None):
    r = Request(rid, SamplingParams(prompt=f"p {rid}", resolution=res,
                                    num_inference_steps=steps))
    if arrival is not None:
        r.arrival_time = arrival
    return r


class TestRequestPool:
    def test_stage_moves_and_counts(self):
        pool = RequestPool()
        a, b = _req("a"), _req("b", res=256)
        a.stage = b.stage = Stage.PREPARE
        pool.add(a)
        pool.add(b)
        assert pool.count(Stage.PREPARE) == 2
        pool.move(a, Stage.DENOISING)
        assert pool.count(Stage.PREPARE) == 1
        assert pool.in_stage(Stage.DENOISING) == [a]
        assert pool.pending_pixels() == 128 * 128 + 256 * 256
        pool.remove("a")
        assert pool.unfinished() == 1

    def test_duplicate_rejected(self):
        pool = RequestPool()
        pool.add(_req("a"))
        with pytest.raises(ValueError):
            pool.add(_req("a"))


class TestPolicies:
    def _pool(self):
        pool = RequestPool()
        t0 = time.time()
        for i, (res, stage) in enumerate([(128, Stage.DENOISING), (256, Stage.DENOISING),
                                          (128, Stage.PREPARE)]):
            r = _req(f"r{i}", res=res, arrival=t0 + i)
            r.stage = stage
            pool.add(r)
        return pool

    def test_fcfs_single_same_resolution_only(self):
        pool = self._pool()
        batch = get_policy("fcfs_single", SchedulerConfig()).schedule(pool)
        assert batch.stage is Stage.DENOISING
        assert all(r.resolution == 128 for r in batch.requests)

    def test_fcfs_mixed_batches_across_resolutions(self):
        pool = self._pool()
        cfg = SchedulerConfig(use_mixed_resolution=True)
        batch = get_policy("fcfs_mixed", cfg).schedule(pool)
        assert batch.stage is Stage.DENOISING
        assert {r.resolution for r in batch.requests} == {128, 256}
        assert batch.mixed

    def test_orca_res_by_res_drains_one_res(self):
        pool = self._pool()
        pol = get_policy("orca_resbyres", SchedulerConfig())
        b1 = pol.schedule(pool)
        assert len({r.resolution for r in b1.requests}) == 1

    def test_max_batch_size_respected(self):
        pool = RequestPool()
        for i in range(20):
            r = _req(f"r{i}")
            r.stage = Stage.DENOISING
            pool.add(r)
        cfg = SchedulerConfig(max_batch_size=4)
        batch = get_policy("fcfs_mixed", cfg).schedule(pool)
        assert len(batch.requests) == 4


class TestEngine:
    def test_offline_pipeline_end_to_end(self):
        pipe = DiffusionPipeline(config=_cfg())
        outs = pipe.generate(["a cat", "a dog"], resolution=128, num_inference_steps=2)
        assert len(outs) == 2
        assert all(o.finished for o in outs)
        assert all(o.image is not None for o in outs)

    def test_engine_dp2_splits_load(self):
        eng = Engine(_cfg(dp=2))
        reqs = [_req(f"r{i}", res=128, steps=2) for i in range(4)]
        eng.add_requests(reqs)
        outs = []
        while eng.has_unfinished_requests():
            outs.extend(eng.step())
        assert len(outs) == 4
        ranks = {r.dp_rank for r in reqs}
        assert ranks == {0, 1}

    def test_prewarm_covers_buckets_and_resets_stats(self):
        """Engine.prewarm runs throwaway requests through the production
        loop at every (resolution x bucket) and leaves stats clean."""
        c = _cfg(policy="esymred")
        c.scheduler.batch_buckets = (1, 2)
        c.scheduler.max_batch_size = 2
        c.cache.enabled = True
        c.cache.mode = "deep"
        c.cache.deep_interval = 2
        c.cache.deep_warmup = 1
        eng = Engine(c)
        dt = eng.prewarm(resolutions=(128,))
        assert dt >= 0
        assert not eng.has_unfinished_requests()
        assert eng.stats.summary()["finished"] == 0  # stats reset
        # Serving after prewarm works and reuses the warmed paths.
        reqs = [_req(f"post{i}", res=128, steps=4) for i in range(2)]
        eng.add_requests(reqs)
        outs = []
        while eng.has_unfinished_requests():
            outs.extend(eng.step())
        assert len(outs) == 2 and all(o.finished for o in outs)

    def test_prewarm_hybrid_mints_both_programs_and_serves(self):
        """With the deep x compact hybrid configured (fixed interval — the
        rolling-serving composition), prewarm must mint BOTH hybrid step
        programs and serving must then run on the store-backed path."""
        c = _cfg(policy="esymred")
        c.scheduler.batch_buckets = (2,)
        c.scheduler.max_batch_size = 2
        c.cache.enabled = True
        c.cache.mode = "deep"
        c.cache.deep_interval = 2
        c.cache.deep_warmup = 1
        c.cache.deep_compact_fraction = 0.5
        eng = Engine(c)
        eng.prewarm(resolutions=(128,))
        fns = eng.workers[0].pipeline._fns
        modes = {k[1] for k in fns if isinstance(k, tuple)
                 and k[0] == "denoise_deep_hybrid"}
        assert modes == {"full", "shallow"}
        reqs = [_req("h0", steps=4), _req("h1", steps=4)]
        eng.add_requests(reqs)
        outs = []
        saw_state = False
        while eng.has_unfinished_requests():
            outs.extend(eng.step())
            # store-backed rows live WHILE the batch denoises...
            saw_state = saw_state or bool(eng.workers[0].pipeline._comp_state)
        assert len(outs) == 2 and all(o.error is None for o in outs)
        assert saw_state
        # ...and are evicted once every touching request finishes
        # (Worker.step -> pipeline.evict_finished_state, session-11 OOM fix)
        assert not eng.workers[0].pipeline._comp_state

    def test_prewarm_row_warmup_mints_partial_programs(self):
        """With deep_row_warmup on, prewarm must mint the partial deep
        programs (one per power-of-two row bucket kb < bucket) — a cold
        partial key would otherwise stall the first rolling admission —
        and rolling-admission serving must then run on them."""
        c = _cfg(policy="esymred")
        c.scheduler.batch_buckets = (1, 2, 4)
        c.scheduler.max_batch_size = 4
        c.cache.enabled = True
        c.cache.mode = "deep"
        c.cache.deep_interval = 4
        c.cache.deep_warmup = 1
        c.cache.deep_row_warmup = True
        eng = Engine(c)
        eng.prewarm(resolutions=(128,))
        fns = eng.workers[0].pipeline._fns
        kbs = {k[-1] for k in fns if isinstance(k, tuple)
               and k[:2] == ("denoise_deep", "partial")}
        assert kbs == {1, 2}, sorted(k for k in fns if isinstance(k, tuple))
        # rolling admission: two requests in flight, a third arrives late
        reqs = [_req(f"p{i}", steps=6) for i in range(2)]
        eng.add_requests(reqs)
        outs = []
        for _ in range(4):
            outs.extend(eng.step())
        eng.add_requests([_req("late", steps=6)])
        while eng.has_unfinished_requests():
            outs.extend(eng.step())
        # not o.aborted: SLO aborts also carry error=None, so error alone
        # can't prove the requests actually denoised to completion
        assert len(outs) == 3 and not any(o.aborted for o in outs)
        assert all(o.error is None for o in outs)

    def test_prewarm_adaptive_mints_both_deep_programs(self):
        """Under adaptive refresh, prewarm must still compile BOTH the full
        and shallow deep programs (the drift trigger could otherwise force
        every prewarm step full, leaving a cold shallow key for serving),
        and must restore the configured threshold afterwards."""
        c = _cfg(policy="esymred")
        c.scheduler.batch_buckets = (2,)
        c.scheduler.max_batch_size = 2
        c.cache.enabled = True
        c.cache.mode = "deep"
        c.cache.deep_adaptive = True
        c.cache.deep_drift_threshold = 1e-9   # would force all-full
        c.cache.deep_max_interval = 3
        c.cache.deep_warmup = 1
        eng = Engine(c)
        eng.prewarm(resolutions=(128,))
        assert c.cache.deep_drift_threshold == 1e-9
        fns = eng.workers[0].pipeline._fns
        modes = {k[1] for k in fns if isinstance(k, tuple)
                 and k[0] == "denoise_deep"}
        assert modes == {"full", "shallow"}
        assert any(isinstance(k, tuple) and k[0] == "latent_drift"
                   for k in fns)

    def test_inflight_throttle_bounded(self):
        """Async-dispatch runahead stays within max_inflight_steps and the
        deque drains before postprocess (engine/worker.py docstring)."""
        c = _cfg()
        c.engine.max_inflight_steps = 1
        eng = Engine(c)
        reqs = [_req(f"t{i}", res=128, steps=3) for i in range(2)]
        eng.add_requests(reqs)
        outs = []
        while eng.has_unfinished_requests():
            outs.extend(eng.step())
            assert len(eng.workers[0]._inflight) <= 1
        assert len(outs) == 2 and all(o.finished for o in outs)
        assert not eng.workers[0]._inflight  # drained at postprocess

    def test_abort_waiting_and_running(self):
        eng = Engine(_cfg())
        reqs = [_req("a", steps=5), _req("b", steps=5)]
        eng.add_requests(reqs)
        aborted = eng.abort_requests(["a"])
        assert len(aborted) == 1 and aborted[0].aborted
        eng.step()  # dispatch + prepare b
        aborted = eng.abort_requests(["b"])
        assert len(aborted) == 1 and aborted[0].aborted
        assert not eng.has_unfinished_requests()

    def test_stats_summary(self):
        eng = Engine(_cfg())
        eng.add_requests([_req("a", steps=2)])
        while eng.has_unfinished_requests():
            eng.step()
        s = eng.stats.summary("sd15")
        assert s["finished"] == 1
        assert s["throughput_rps"] > 0


def test_collect_data_writes_csvs(tmp_path):
    """Reference SDUSS_COLLECT_DATA CSVs (engine/engine.py:327-373)."""
    from sduss_tpu.config import Config, ModelConfig
    from sduss_tpu.entrypoints.offline import DiffusionPipeline

    config = Config()
    config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
    config.engine.collect_data = True
    config.engine.collect_dir = str(tmp_path)
    pipe = DiffusionPipeline(config=config)
    outs = pipe.generate(["a"], resolution=256, num_inference_steps=2)
    assert len(outs) == 1
    req_csv = tmp_path / "request_data.csv"
    sched_csv = tmp_path / "schedule_rank0.csv"
    assert req_csv.exists() and sched_csv.exists()
    lines = sched_csv.read_text().strip().splitlines()
    assert len(lines) >= 4  # header + prepare + 2 denoise + post
    assert "stage" in lines[0]


def test_batch_ceiling_is_largest_bucket():
    """Round-2 serving crash regression: a policy batch above the largest
    bucket padded DOWN (negative dimensions).  max_batch_size clamps to
    buckets[-1] at construction; bucket_for raises if the invariant is
    somehow violated."""
    from sduss_tpu.config import bucket_for

    c = SchedulerConfig(max_batch_size=12, batch_buckets=(2, 4, 8))
    assert c.max_batch_size == 8
    assert bucket_for(3, (2, 4, 8)) == 4
    with pytest.raises(ValueError):
        bucket_for(9, (2, 4, 8))


def test_config_from_args_roundtrip():
    import argparse

    from sduss_tpu.engine.arg_utils import add_engine_args, config_from_args

    parser = argparse.ArgumentParser()
    add_engine_args(parser)
    args = parser.parse_args([
        "--model", "sdxl", "--dp", "2", "--policy", "esymred",
        "--slo", "3", "--use-cache", "--sampler", "euler",
        "--max-batchsize", "6"])
    cfg = config_from_args(args)
    assert cfg.model.family == "sdxl"
    assert cfg.parallel.dp == 2
    assert cfg.scheduler.policy == "esymred"
    assert cfg.scheduler.slo_scale == 3.0
    assert cfg.scheduler.max_batch_size == 6
    assert cfg.cache.enabled is True
    assert cfg.model.sampler == "euler"


def test_engine_submesh_replicas():
    """DP replicas owning (sp x tp) sub-meshes produce correct images.

    The reference raises NotImplementedError for tp>1/pp>1 (config.py:106-108);
    here GSPMD shards the denoiser inside each replica's jitted stages.
    """
    from sduss_tpu.config import Config, ModelConfig, ParallelConfig
    from sduss_tpu.entrypoints.offline import DiffusionPipeline

    config = Config()
    config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
    config.parallel = ParallelConfig(dp=1, sp=2, tp=2)
    pipe = DiffusionPipeline(config=config)
    outs = pipe.generate(["a cat"], resolution=256, num_inference_steps=2,
                         seed=7)
    img_mesh = outs[0].image

    config2 = Config()
    config2.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
    pipe2 = DiffusionPipeline(config=config2)
    outs2 = pipe2.generate(["a cat"], resolution=256, num_inference_steps=2,
                           seed=7)
    # atol 4: conv-channel TP (sharding.py _CONV_COLUMN/_CONV_ROW) adds an
    # all-reduce per resnet whose f32 partial-sum reassociation shifts a
    # handful of pixels by up to 3/255 after two steps + decode (measured
    # max diff 3 at 0.03% of pixels) — numerics, not a correctness gap.
    np.testing.assert_allclose(img_mesh.astype(np.int32),
                               outs2[0].image.astype(np.int32), atol=4)


def test_engine_dp2_tp2():
    from sduss_tpu.config import Config, ModelConfig, ParallelConfig
    from sduss_tpu.entrypoints.offline import DiffusionPipeline

    config = Config()
    config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
    config.parallel = ParallelConfig(dp=2, tp=2)
    pipe = DiffusionPipeline(config=config)
    outs = pipe.generate(["a", "b", "c"], resolution=256,
                         num_inference_steps=2)
    assert len(outs) == 3
    assert all(o.image is not None for o in outs)


class TestPrewarmCompositions:
    def test_prewarm_mixed_composition(self):
        """prewarm(compositions=...) drives the PATCHED path directly on each
        replica so the mixed jit key exists before a mixed trace hits it."""
        c = _cfg(policy="esymred")
        c.scheduler.use_mixed_resolution = True
        c.scheduler.patch_size = 128  # cells=16: res 128 -> 1x1, 256 -> 2x2
        c.scheduler.batch_buckets = (1, 2)
        c.scheduler.max_batch_size = 2
        eng = Engine(c)
        dt = eng.prewarm(resolutions=(128,), buckets=(1,), steps=2,
                         compositions=[{128: 1, 256: 1}])
        assert dt >= 0
        assert not eng.has_unfinished_requests()
        assert eng.stats.summary()["finished"] == 0
        # the mixed-step jit cache now holds a patched-path program
        pipe = eng.workers[0].pipeline
        assert any(isinstance(k, tuple) and k and k[0] == "denoise_mixed"
                   for k in pipe._fns), sorted(map(str, pipe._fns))


class TestDp8ScaleOut:
    def test_engine_dp8_uses_all_replicas(self):
        """Serving scale-out across the full 8-device virtual mesh: greedy
        dispatch spreads load over every replica (reference Fig-14 GPU
        scaling axis, scripts/paper/scalibility.sh)."""
        import jax

        if len(jax.devices()) < 8:
            import pytest

            pytest.skip("needs 8 virtual devices")
        eng = Engine(_cfg(dp=8))
        reqs = [_req(f"s{i}", res=128, steps=2) for i in range(16)]
        eng.add_requests(reqs)
        outs = []
        while eng.has_unfinished_requests():
            outs.extend(eng.step())
        assert len(outs) == 16 and all(o.finished for o in outs)
        assert {r.dp_rank for r in reqs} == set(range(8))


class TestPrewarmCapacityDiscovery:
    def test_resource_exhausted_bucket_shrinks_ceiling(self, monkeypatch):
        """A RESOURCE_EXHAUSTED bucket during prewarm is capacity truth,
        not a fatal error (r2w: default max_batch_size=12 walked prewarm
        into an un-serveable b12 1024^2 hybrid state): the ceiling shrinks
        to the largest bucket that fit and serving continues under it."""
        c = _cfg(policy="esymred")
        c.scheduler.batch_buckets = (1, 2, 4)
        c.scheduler.max_batch_size = 4
        eng = Engine(c)
        pipe = eng.workers[0].pipeline
        real = pipe.denoise_step

        def fake(by_res, **kw):
            if sum(len(v) for v in by_res.values()) >= 4:
                raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
            return real(by_res, **kw)

        monkeypatch.setattr(pipe, "denoise_step", fake)
        eng.prewarm(resolutions=(128,))
        assert c.scheduler.max_batch_size == 2
        # serving still works under the shrunk ceiling
        reqs = [_req(f"cap{i}", res=128, steps=2) for i in range(3)]
        eng.add_requests(reqs)
        outs = []
        while eng.has_unfinished_requests():
            outs.extend(eng.step())
        assert len(outs) == 3 and all(o.finished for o in outs)

    def test_other_errors_still_raise(self, monkeypatch):
        import pytest as _pytest

        c = _cfg(policy="esymred")
        c.scheduler.batch_buckets = (1, 2)
        c.scheduler.max_batch_size = 2
        eng = Engine(c)
        pipe = eng.workers[0].pipeline

        def boom(by_res, **kw):
            raise RuntimeError("something else entirely")

        monkeypatch.setattr(pipe, "denoise_step", boom)
        with _pytest.raises(RuntimeError, match="something else"):
            eng.prewarm(resolutions=(128,))


class TestPrewarmCapacityEstimate:
    """Proactive capacity gate (Engine._bucket_fits): params + eval_shape'd
    composition state + margin vs HBM budget — a bucket that cannot fit is
    never ATTEMPTED (on the axon relay an in-process RESOURCE_EXHAUSTED can
    poison later device ops; r2w hybrid serving postmortem)."""

    def _hybrid_cfg(self):
        c = _cfg(policy="esymred")
        c.scheduler.batch_buckets = (1, 2)
        c.scheduler.max_batch_size = 2
        c.cache.enabled = True
        c.cache.mode = "deep"
        c.cache.deep_interval = 2
        c.cache.deep_compact_fraction = 0.5
        return c

    def test_estimate_matches_minted_state_exactly(self):
        """The eval_shape estimate uses the step's own builders, so it must
        equal the bytes of the state a real step mints."""
        from sduss_tpu.pipelines.base import _state_nbytes

        c = self._hybrid_cfg()
        eng = Engine(c)
        pipe = eng.workers[0].pipeline
        reqs = [_req(f"e{i}", res=128, steps=4) for i in range(2)]
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        for _ in range(2):
            pipe.denoise_step({128: reqs})
        entry = next(iter(pipe._comp_state.values()))
        assert pipe.estimate_serving_state_bytes(128, 2) \
            == _state_nbytes(entry["state"])

    def test_sd3_estimate_matches_minted_state(self):
        from sduss_tpu.config import CacheConfig
        from sduss_tpu.pipelines import build_pipeline
        from sduss_tpu.pipelines.base import _state_nbytes

        c = Config()
        c.model = ModelConfig(model="sd3", test_tiny=True, dtype="float32",
                              resolutions=(256,))
        c.scheduler.use_mixed_resolution = True
        c.scheduler.batch_buckets = (1, 2)
        c.cache = CacheConfig(enabled=True, mode="compact",
                              compact_fraction=0.5,
                              sd3_deep_span=(1, 2), deep_interval=2)
        pipe = build_pipeline(c)
        reqs = [Request(f"s{i}", SamplingParams(prompt=f"p{i}",
                                                resolution=256,
                                                num_inference_steps=4,
                                                seed=i)) for i in range(2)]
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        for _ in range(2):
            pipe.denoise_step({256: reqs})
        entry = next(iter(pipe._sd3_state.values()))
        got = _state_nbytes(entry["state"]) + _state_nbytes(entry["deep"])
        est = pipe.estimate_serving_state_bytes(256, 2)
        # ctx_seq is approximated from tokenizer maxima; exact for the
        # production tokenizers, allow the tiny harness a small slack
        assert abs(est - got) <= 0.15 * got, (est, got)

    def test_oversized_bucket_skipped_without_attempt(self, monkeypatch):
        c = self._hybrid_cfg()
        eng = Engine(c)
        pipe = eng.workers[0].pipeline
        need1 = pipe.estimate_serving_state_bytes(128, 1)
        need2 = pipe.estimate_serving_state_bytes(128, 2)
        assert need2 > need1 > 0
        params_b = pipe.device_param_bytes()
        # budget admits bucket 1, rejects bucket 2
        c.engine.prewarm_hbm_margin = 0.0
        c.engine.hbm_bytes_fallback = params_b + (need1 + need2) / 2

        attempted = []
        real = pipe.denoise_step

        def spy(by_res, **kw):
            attempted.append(sum(len(v) for v in by_res.values()))
            return real(by_res, **kw)

        monkeypatch.setattr(pipe, "denoise_step", spy)
        eng.prewarm(resolutions=(128,))
        assert c.scheduler.max_batch_size == 1
        assert max(attempted) == 1  # bucket 2 never attempted
