"""Asynchronous prepare (EngineConfig.async_prepare) + step-time EMA.

The r2t SD3 serving run exposed two engine-layer defects:
- a HOST-side prepare (T5-XXL encode, ~20 s/batch) blocked the worker loop,
  so denoising started 171 s after the first arrival and 75% of requests
  aborted on SLO;
- the latency predictor is fitted on CACHE-OFF profiler steps while serving
  runs cache-on (972.5 ms predicted vs 321.7 ms realized), so the slack math
  aborted healthy requests.

These tests pin both fixes at the worker/policy layer with a stub pipeline
(no models; the engine machinery under test is pure host code).
"""

import threading
import time

import numpy as np

from sduss_tpu.config import Config, ModelConfig, SchedulerConfig
from sduss_tpu.engine.worker import Worker
from sduss_tpu.request import Request, SamplingParams, Stage
from sduss_tpu.scheduler.policies import get_policy
from sduss_tpu.scheduler.request_pool import RequestPool


class _Bundle:
    family = "sd15"


class _StubPipeline:
    """Minimal BasePipeline stand-in: slow host prepare, instant denoise."""

    def __init__(self, prepare_delay_s=0.0):
        self.bundle = _Bundle()
        self.prepare_delay_s = prepare_delay_s
        self.prepare_calls = 0
        self.denoise_calls = 0
        self.prepare_thread_ids = []

    def prepare(self, requests):
        self.prepare_thread_ids.append(threading.get_ident())
        self.prepare_calls += 1
        if self.prepare_delay_s:
            time.sleep(self.prepare_delay_s)
        for r in requests:
            r.remain_steps = r.params.num_inference_steps
            r.latents = np.zeros((1, 4, 4, 4), np.float32)

    def denoise_step(self, by_res, allow_cold=True):
        self.denoise_calls += 1
        for reqs in by_res.values():
            for r in reqs:
                r.remain_steps -= 1

    def postprocess(self, by_res):
        for reqs in by_res.values():
            for r in reqs:
                r.output_images = [np.zeros((4, 4, 3), np.uint8)]

    def evict_finished_state(self, request_ids):
        # BasePipeline contract: free composition-keyed cache state touching
        # finished requests (sduss_tpu/pipelines/base.py). Stub holds none.
        pass


def _worker(prepare_delay_s=0.0, async_prepare=True):
    c = Config()
    c.model = ModelConfig(model="sd15", test_tiny=True)
    c.engine.async_prepare = async_prepare
    c.engine.max_inflight_steps = 0  # numpy latents: nothing to probe
    c.scheduler.use_mixed_resolution = False
    pipe = _StubPipeline(prepare_delay_s)
    return Worker(0, pipe, c), pipe


def _add(worker, rid, steps=4):
    r = Request(rid, SamplingParams(prompt=rid, resolution=128,
                                    num_inference_steps=steps))
    worker.add_requests([r])
    return r


class TestAsyncPrepare:
    def test_denoise_continues_while_preparing(self):
        """A slow background prepare must not stall running denoise work."""
        worker, pipe = _worker(prepare_delay_s=0.25)
        a = _add(worker, "a", steps=50)
        # drive a's prepare through (submit, then wait for the future)
        worker.step()
        deadline = time.time() + 2.0
        while a.stage is not Stage.DENOISING and time.time() < deadline:
            worker.step()
        assert a.stage is Stage.DENOISING

        b = _add(worker, "b", steps=4)
        denoise_before = pipe.denoise_calls
        t0 = time.time()
        # While b's 0.25 s prepare runs in the background, a keeps stepping.
        steps_during_prepare = 0
        finished = []
        while b.stage in (Stage.PREPARE, Stage.PREPARING) \
                and time.time() - t0 < 2.0:
            finished += worker.step()
            if b.stage is Stage.PREPARING:
                steps_during_prepare = pipe.denoise_calls - denoise_before
        assert steps_during_prepare >= 3, \
            "denoising stalled behind the background prepare"
        # and both finish end-to-end
        deadline = time.time() + 3.0
        while len(finished) < 2 and time.time() < deadline:
            finished += worker.step()
        assert {r.request_id for r in finished} >= {"a", "b"}

    def test_prepare_runs_off_thread(self):
        worker, pipe = _worker(prepare_delay_s=0.01)
        _add(worker, "a", steps=1)
        deadline = time.time() + 2.0
        while worker.has_unfinished() and time.time() < deadline:
            worker.step()
        assert pipe.prepare_calls == 1
        assert pipe.prepare_thread_ids[0] != threading.get_ident()

    def test_sync_mode_unchanged(self):
        worker, pipe = _worker(prepare_delay_s=0.0, async_prepare=False)
        _add(worker, "a", steps=2)
        deadline = time.time() + 2.0
        finished = []
        while not finished and time.time() < deadline:
            finished += worker.step()
        assert finished[0].request_id == "a"
        assert pipe.prepare_thread_ids[0] == threading.get_ident()

    def test_abort_mid_prepare_is_safe(self):
        worker, _ = _worker(prepare_delay_s=0.2)
        a = _add(worker, "a", steps=4)
        worker.step()  # submits the background prepare
        assert a.stage in (Stage.PREPARE, Stage.PREPARING)
        worker.abort_requests(["a"])
        assert a.stage is Stage.ABORTED
        # The completed future must NOT resurrect the aborted request.
        time.sleep(0.3)
        worker.step()
        assert a.stage is Stage.ABORTED
        assert not worker.has_unfinished()

    def test_idle_step_blocks_briefly_on_inflight_prepare(self):
        """With only a PREPARING request, step() waits (bounded) instead of
        spinning, and releases the request once the future lands."""
        worker, _ = _worker(prepare_delay_s=0.1)
        a = _add(worker, "a", steps=1)
        worker.step()  # submit
        deadline = time.time() + 2.0
        while a.stage is Stage.PREPARING and time.time() < deadline:
            worker.step()
        assert a.stage in (Stage.DENOISING, Stage.POSTPROCESSING,
                           Stage.FINISHED)


class TestStepTimeCorrection:
    def _running_pool(self, n=1, steps=10):
        pool = RequestPool()
        now = time.time()
        for i in range(n):
            r = Request(f"r{i}", SamplingParams(
                prompt="p", resolution=1024, num_inference_steps=steps))
            r.arrival_time = now
            r.stage = Stage.PREPARE
            pool.add(r)
            pool.move(r, Stage.DENOISING)
            r.remain_steps = steps
            r.start_denoising_time = now
        return pool

    def test_overestimate_corrected_down(self):
        """Observed steps 3x faster than predicted pull the correction (and
        the next prediction) down — the r2t SD3 failure shape."""
        pol = get_policy("esymred", SchedulerConfig(max_batch_size=4),
                         family="sd3")
        pool = self._running_pool()
        batch = pol.schedule(pool)
        pred0 = batch.requests[0].predicted_step_ms
        assert pred0 > 0
        for _ in range(30):
            pol.observe_step_time(batch.requests, pred0 / 3.0)
            batch = pol.schedule(pool)
        assert pol._step_correction < 0.6
        assert batch.requests[0].predicted_step_ms < 0.7 * pred0

    def test_correction_bounded_and_optional(self):
        pol = get_policy("esymred",
                         SchedulerConfig(max_batch_size=4, step_time_ema=0.0),
                         family="sdxl")
        pool = self._running_pool()
        batch = pol.schedule(pool)
        pred0 = batch.requests[0].predicted_step_ms
        pol.observe_step_time(batch.requests, pred0 / 10.0)
        assert pol._step_correction == 1.0  # disabled

        pol2 = get_policy("esymred", SchedulerConfig(max_batch_size=4),
                          family="sdxl")
        batch2 = pol2.schedule(pool)
        for _ in range(500):
            pol2.observe_step_time(batch2.requests, 1e9)
            batch2 = pol2.schedule(pool) or batch2
        assert pol2._step_correction <= 20.0
