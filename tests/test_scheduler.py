"""Scheduling-policy unit tests over a fabricated request pool.

Pins the decision behavior of every policy (reference worker/scheduler/
policy/: FCFS_Single :11-63, FCFS_Mixed :13-77, Orca_ResByRes :14-81,
Orca_Round_Robin :13-95, ESyMReD :69-456) — the reference tests none of them.
"""

import time

import pytest

from sduss_tpu.config import SchedulerConfig
from sduss_tpu.request import Request, SamplingParams, Stage
from sduss_tpu.scheduler.policies import get_policy
from sduss_tpu.scheduler.request_pool import RequestPool


def make_pool(entries):
    """entries: list of (id, resolution, stage, arrival_offset_s[, steps])."""
    pool = RequestPool()
    now = time.time()
    for e in entries:
        rid, res, stage, off = e[:4]
        steps = e[4] if len(e) > 4 else 10
        r = Request(rid, SamplingParams(prompt=rid, resolution=res,
                                        num_inference_steps=steps))
        r.arrival_time = now + off
        r.stage = Stage.PREPARE
        pool.add(r)
        if stage is not Stage.PREPARE:
            pool.move(r, stage)
        r.remain_steps = steps
    return pool


def cfg(**kw):
    return SchedulerConfig(max_batch_size=kw.pop("max_batch_size", 4), **kw)


class TestFCFSSingle:
    def test_single_resolution_batches(self):
        pool = make_pool([
            ("a", 512, Stage.DENOISING, 0),
            ("b", 768, Stage.DENOISING, 1),
            ("c", 512, Stage.DENOISING, 2),
        ])
        batch = get_policy("fcfs_single", cfg()).schedule(pool)
        assert batch.stage is Stage.DENOISING
        assert {r.request_id for r in batch.requests} == {"a", "c"}
        assert not batch.mixed

    def test_post_stage_priority_by_age(self):
        pool = make_pool([
            ("young_post", 512, Stage.POSTPROCESSING, 5),
            ("old_denoise", 512, Stage.DENOISING, 0),
        ])
        batch = get_policy("fcfs_single", cfg()).schedule(pool)
        # oldest request is the denoising one
        assert batch.stage is Stage.DENOISING


class TestFCFSMixed:
    def test_mixes_resolutions(self):
        pool = make_pool([
            ("a", 512, Stage.DENOISING, 0),
            ("b", 768, Stage.DENOISING, 1),
        ])
        batch = get_policy("fcfs_mixed", cfg()).schedule(pool)
        assert batch.mixed
        assert len(batch.requests) == 2

    def test_respects_max_batch(self):
        pool = make_pool([(f"r{i}", 512, Stage.DENOISING, i) for i in range(9)])
        batch = get_policy("fcfs_mixed", cfg(max_batch_size=3)).schedule(pool)
        assert len(batch.requests) == 3


class TestOrca:
    def test_resbyres_drains_one_resolution(self):
        pool = make_pool([
            ("a", 512, Stage.DENOISING, 0),
            ("b", 768, Stage.DENOISING, 1),
        ])
        pol = get_policy("orca_resbyres", cfg())
        b1 = pol.schedule(pool)
        assert {r.resolution for r in b1.requests} == {512}
        # while 512 requests remain, keep serving them
        b2 = pol.schedule(pool)
        assert {r.resolution for r in b2.requests} == {512}
        # drain 512 -> switches
        pool.move(b1.requests[0], Stage.FINISHED)
        pool.remove("a")
        b3 = pol.schedule(pool)
        assert {r.resolution for r in b3.requests} == {768}

    def test_round_robin_rotates(self):
        pool = make_pool([
            ("a", 512, Stage.DENOISING, 0),
            ("b", 768, Stage.DENOISING, 1),
        ])
        pol = get_policy("orca_round_robin", cfg())
        seen = [tuple(sorted({r.resolution for r in pol.schedule(pool).requests}))
                for _ in range(4)]
        assert seen[0] != seen[1]
        assert seen[0] == seen[2] and seen[1] == seen[3]


class TestESyMReD:
    def _pol(self):
        return get_policy("esymred", cfg(), family="sdxl")

    def test_post_scheduled_first(self):
        pool = make_pool([
            ("p", 512, Stage.POSTPROCESSING, 0),
            ("d", 512, Stage.DENOISING, 1),
        ])
        batch = self._pol().schedule(pool)
        assert batch.stage is Stage.POSTPROCESSING

    def test_prepare_before_denoise(self):
        pool = make_pool([
            ("n", 512, Stage.PREPARE, 0),
            ("d", 512, Stage.DENOISING, 1),
        ])
        batch = self._pol().schedule(pool)
        assert batch.stage is Stage.PREPARE

    def test_hopeless_request_aborted(self):
        pool = make_pool([("late", 1024, Stage.DENOISING, -10_000, 50)])
        batch = self._pol().schedule(pool)
        assert [r.request_id for r in batch.aborts] == ["late"]
        assert not batch.requests

    def test_admits_within_slack(self):
        pool = make_pool([
            ("x", 512, Stage.DENOISING, 0, 10),
            ("y", 768, Stage.DENOISING, 0, 10),
        ])
        batch = self._pol().schedule(pool)
        assert len(batch.requests) >= 1
        assert not batch.aborts

    def test_unknown_policy_raises(self):
        with pytest.raises(ValueError):
            get_policy("nope", cfg())


class TestDeepPhaseAdmission:
    """Deep-cache phase-aligned admission (esymred._deep_defer).

    The deep cache runs one full/shallow mode per jitted batch step
    (pipelines/base.py _denoise_group_deep), so admitting a new member
    mid-phase forces full passes for the whole batch; ESyMReD defers
    admissions to full-pass boundaries unless the candidate's slack cannot
    afford the wait."""

    def _pol(self, interval=3):
        from sduss_tpu.config import CacheConfig

        pol = get_policy("esymred", cfg(), family="sdxl")
        pol.cache_config = CacheConfig(enabled=True, mode="deep",
                                       deep_interval=interval, deep_warmup=0)
        return pol

    @staticmethod
    def _mark_running(pool, rid, deep_age):
        import types

        r = pool.get(rid)
        r.start_denoising_time = time.time()
        r.deep_age = deep_age
        r.deep_state = object()
        r.sampler_table = types.SimpleNamespace(step=5)
        return r

    def test_defers_admission_mid_phase(self):
        pool = make_pool([
            ("run", 512, Stage.DENOISING, 0, 10),
            ("new", 512, Stage.DENOISING, 0, 10),
        ])
        self._mark_running(pool, "run", deep_age=0)  # next step is shallow
        batch = self._pol().schedule(pool)
        assert [r.request_id for r in batch.requests] == ["run"]
        assert not batch.aborts

    def test_admits_at_full_boundary(self):
        pool = make_pool([
            ("run", 512, Stage.DENOISING, 0, 10),
            ("new", 512, Stage.DENOISING, 0, 10),
        ])
        self._mark_running(pool, "run", deep_age=2)  # interval 3: full next
        batch = self._pol().schedule(pool)
        assert {r.request_id for r in batch.requests} == {"run", "new"}

    def test_hopeless_candidate_still_aborts_mid_phase(self):
        pool = make_pool([
            ("run", 512, Stage.DENOISING, 0, 10),
            ("late", 1024, Stage.DENOISING, -10_000, 50),
        ])
        self._mark_running(pool, "run", deep_age=0)
        batch = self._pol().schedule(pool)
        assert [r.request_id for r in batch.aborts] == ["late"]

    def test_cache_off_admits_immediately(self):
        pool = make_pool([
            ("run", 512, Stage.DENOISING, 0, 10),
            ("new", 512, Stage.DENOISING, 0, 10),
        ])
        self._mark_running(pool, "run", deep_age=0)
        pol = get_policy("esymred", cfg(), family="sdxl")  # no cache_config
        batch = pol.schedule(pool)
        assert {r.request_id for r in batch.requests} == {"run", "new"}


class TestDisplacedAdmissionBatching:
    """Accumulate-then-admit under sp_mode='displaced'
    (esymred._displaced_defer): every admission resets the batch's stale-KV
    state and re-runs displaced_warmup sync steps, so ESyMReD defers a
    lone candidate with ample slack until enough accumulate to fill the
    next batch bucket — but admits under SLO pressure or a full cohort."""

    def _pol(self, warmup=4):
        class Par:
            sp_mode = "displaced"
            displaced_warmup = warmup

        pol = get_policy("esymred", cfg(batch_buckets=(1, 2, 4)), family="sdxl")
        pol.parallel_config = Par()
        return pol

    @staticmethod
    def _mark_running(pool, rid):
        import types

        r = pool.get(rid)
        r.start_denoising_time = time.time()
        r.sampler_table = types.SimpleNamespace(step=5)
        return r

    def test_lone_candidate_with_slack_deferred(self):
        pool = make_pool([
            ("run0", 512, Stage.DENOISING, 0, 10),
            ("run1", 512, Stage.DENOISING, 0, 10),
            ("new", 512, Stage.DENOISING, 0, 10),
        ])
        self._mark_running(pool, "run0")
        self._mark_running(pool, "run1")
        batch = self._pol().schedule(pool)
        # next bucket above 2 is 4: one candidate can't fill it — wait
        assert {r.request_id for r in batch.requests} == {"run0", "run1"}
        assert not batch.aborts

    def test_cohort_filling_next_bucket_admitted(self):
        pool = make_pool([
            ("run0", 512, Stage.DENOISING, 0, 10),
            ("run1", 512, Stage.DENOISING, 0, 10),
            ("newa", 512, Stage.DENOISING, 0, 10),
            ("newb", 512, Stage.DENOISING, 0, 10),
        ])
        self._mark_running(pool, "run0")
        self._mark_running(pool, "run1")
        batch = self._pol().schedule(pool)
        assert {r.request_id for r in batch.requests} \
            == {"run0", "run1", "newa", "newb"}

    def test_pressured_candidate_admitted_immediately(self):
        pool = make_pool([
            ("run0", 512, Stage.DENOISING, 0, 10),
            ("run1", 512, Stage.DENOISING, 0, 10),
            # 10 s elapsed: slack positive but thinner than the deferred
            # resync cost at a huge warmup
            ("urgent", 1024, Stage.DENOISING, -10, 30),
        ])
        self._mark_running(pool, "run0")
        self._mark_running(pool, "run1")
        # a huge warmup makes the deferred resync unaffordable for the
        # elapsed candidate — SLO beats batching
        batch = self._pol(warmup=100).schedule(pool)
        assert "urgent" in {r.request_id for r in batch.requests}

    def test_gspmd_mode_unaffected(self):
        class Par:
            sp_mode = "gspmd"
            displaced_warmup = 4

        pool = make_pool([
            ("run0", 512, Stage.DENOISING, 0, 10),
            ("run1", 512, Stage.DENOISING, 0, 10),
            ("new", 512, Stage.DENOISING, 0, 10),
        ])
        self._mark_running(pool, "run0")
        self._mark_running(pool, "run1")
        pol = get_policy("esymred", cfg(batch_buckets=(1, 2, 4)), family="sdxl")
        pol.parallel_config = Par()
        batch = pol.schedule(pool)
        assert {r.request_id for r in batch.requests} \
            == {"run0", "run1", "new"}


class TestESyMReDFittedPredictor:
    def test_fitted_predictor_survives_resolution_subset(self, tmp_path):
        """Regression: a predictor fitted over (512,768,1024) must keep its
        trained feature axes when the pool only contains one of them
        (previously _ensure_resolutions overwrote predictor.resolutions and
        predict() crashed on a dimension mismatch)."""
        import numpy as np

        from sduss_tpu.scheduler.predictor import LatencyPredictor
        from sduss_tpu.scheduler.profiles import get_profile

        pred = LatencyPredictor([512, 768, 1024], get_profile("sdxl"))
        rows = [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1], [2, 0, 2]]
        ys = [0.2, 0.4, 0.8, 1.3, 2.0]
        pred.fit(rows, ys)
        path = str(tmp_path / "pred.npz")
        pred.save(path)

        pool = make_pool([
            ("a", 1024, Stage.DENOISING, 0),
            ("b", 1024, Stage.DENOISING, 1),
        ])
        for r in pool.in_stage(Stage.DENOISING):
            r.start_denoising_time = time.time()
        pol = get_policy("esymred", cfg(predictor_path=path), "sdxl")
        batch = pol.schedule(pool)
        assert batch is not None and len(batch.requests) == 2

    def test_fitted_predictor_maps_unseen_resolution_to_nearest(self, tmp_path):
        from sduss_tpu.scheduler.predictor import LatencyPredictor
        from sduss_tpu.scheduler.profiles import get_profile

        pred = LatencyPredictor([512, 1024], get_profile("sdxl"))
        pred.fit([[1, 0], [0, 1], [1, 1], [2, 1]], [0.2, 0.8, 1.0, 1.3])
        path = str(tmp_path / "pred.npz")
        pred.save(path)
        pool = make_pool([("a", 768, Stage.DENOISING, 0)])
        pol = get_policy("esymred", cfg(predictor_path=path), "sdxl")
        batch = pol.schedule(pool)
        assert batch is not None and len(batch.requests) == 1


class TestStepTimeEMAOutlierGuard:
    """observe_step_time drops a single cold-load outlier but believes two
    consecutive ones (r3c SD1.5 pass 1: one ~2.8 s executable load at a
    111 ms prediction pushed the correction 5x and shed 25% of the pass)."""

    def _pol(self):
        pol = get_policy("esymred", cfg(step_time_ema=0.2), family="sdxl")
        pol._correction_primed = True  # isolate the EMA from the prior
        return pol

    @staticmethod
    def _req(pred_ms):
        r = Request("o", SamplingParams(prompt="o", resolution=512,
                                        num_inference_steps=10))
        r.predicted_step_ms = pred_ms
        return r

    def test_single_outlier_ignored(self):
        pol = self._pol()
        pol.observe_step_time([self._req(100.0)], 2800.0)  # cold load
        assert pol._step_correction == 1.0
        pol.observe_step_time([self._req(100.0)], 110.0)   # normal again
        assert abs(pol._step_correction - 1.02) < 0.01

    def test_two_consecutive_outliers_believed(self):
        pol = self._pol()
        pol.observe_step_time([self._req(100.0)], 900.0)
        assert pol._step_correction == 1.0  # first: dropped
        pol.observe_step_time([self._req(100.0)], 900.0)
        assert pol._step_correction > 1.5   # second: regime shift

    def test_normal_updates_unaffected(self):
        pol = self._pol()
        pol.observe_step_time([self._req(100.0)], 60.0)
        assert abs(pol._step_correction - 0.92) < 0.01
