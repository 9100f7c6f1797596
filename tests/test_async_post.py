"""Asynchronous postprocess (EngineConfig.async_postprocess).

The round-5 SDXL chunk6 serving pass decomposed its makespan: 25-39% was
postprocess blocking the worker loop (serial b8 VAE decode ~2.7 s device +
image fetch) between denoise windows
(exp/serving_sdxl_preset_chunk6_v5e_r4g.json).  The fix mirrors async
prepare on the OUTPUT side: decode + fetch run on one background host
thread while the loop keeps denoising; requests park in Stage.DECODING
(invisible to every policy, still unfinished) until the future lands.

Pinned here at the worker layer with a stub pipeline (pure host code), plus
one engine-level end-to-end on the real tiny model.
"""

import threading
import time

import numpy as np

from sduss_tpu.config import Config, ModelConfig
from sduss_tpu.engine.worker import Worker
from sduss_tpu.request import Request, SamplingParams, Stage


class _Bundle:
    family = "sd15"


class _StubPipeline:
    """Minimal BasePipeline stand-in: instant prepare/denoise, slow decode."""

    def __init__(self, post_delay_s=0.0):
        self.bundle = _Bundle()
        self.post_delay_s = post_delay_s
        self.denoise_calls = 0
        self.post_calls = 0
        self.post_thread_ids = []

    def prepare(self, requests):
        for r in requests:
            r.remain_steps = r.params.num_inference_steps
            r.latents = np.zeros((1, 4, 4, 4), np.float32)

    def denoise_step(self, by_res, allow_cold=True):
        self.denoise_calls += 1
        for reqs in by_res.values():
            for r in reqs:
                r.remain_steps -= 1

    def postprocess(self, by_res):
        self.post_thread_ids.append(threading.get_ident())
        self.post_calls += 1
        if self.post_delay_s:
            time.sleep(self.post_delay_s)
        for reqs in by_res.values():
            for r in reqs:
                r.output = np.zeros((4, 4, 3), np.uint8)

    def evict_finished_state(self, request_ids):
        pass


def _worker(post_delay_s=0.0, async_post=True):
    c = Config()
    c.model = ModelConfig(model="sd15", test_tiny=True)
    c.engine.async_prepare = False
    c.engine.async_postprocess = async_post
    c.engine.max_inflight_steps = 0  # numpy latents: nothing to probe
    c.scheduler.use_mixed_resolution = False
    pipe = _StubPipeline(post_delay_s)
    return Worker(0, pipe, c), pipe


def _add(worker, rid, steps=4):
    r = Request(rid, SamplingParams(prompt=rid, resolution=128,
                                    num_inference_steps=steps))
    worker.add_requests([r])
    return r


class TestAsyncPostprocess:
    def test_denoise_continues_while_decoding(self):
        """A slow background decode must not stall running denoise work."""
        worker, pipe = _worker(post_delay_s=0.25)
        a = _add(worker, "a", steps=1)
        b = _add(worker, "b", steps=200)
        # drive a to its decode submission; b keeps denoising meanwhile
        t0 = time.time()
        finished = []
        steps_during_decode = 0
        denoise_mark = None
        while "a" not in {r.request_id for r in finished} \
                and time.time() - t0 < 4.0:
            finished += worker.step()
            if a.stage is Stage.DECODING:
                if denoise_mark is None:
                    denoise_mark = pipe.denoise_calls
                steps_during_decode = pipe.denoise_calls - denoise_mark
        done_a = [r for r in finished if r.request_id == "a"]
        assert done_a and done_a[0].finish_time > 0
        assert steps_during_decode >= 3, \
            "denoising stalled behind the background decode"

    def test_post_runs_off_thread_and_finishes(self):
        worker, pipe = _worker(post_delay_s=0.01)
        _add(worker, "a", steps=1)
        deadline = time.time() + 2.0
        finished = []
        while worker.has_unfinished() and time.time() < deadline:
            finished += worker.step()
        assert [r.request_id for r in finished] == ["a"]
        assert pipe.post_calls == 1
        assert pipe.post_thread_ids[0] != threading.get_ident()
        assert finished[0].output is not None

    def test_sync_mode_unchanged(self):
        worker, pipe = _worker(post_delay_s=0.0, async_post=False)
        _add(worker, "a", steps=2)
        deadline = time.time() + 2.0
        finished = []
        while not finished and time.time() < deadline:
            finished += worker.step()
        assert finished[0].request_id == "a"
        assert pipe.post_thread_ids[0] == threading.get_ident()

    def test_abort_mid_decode_is_safe(self):
        worker, _ = _worker(post_delay_s=0.2)
        a = _add(worker, "a", steps=1)
        t0 = time.time()
        while a.stage is not Stage.DECODING and time.time() - t0 < 2.0:
            worker.step()
        assert a.stage is Stage.DECODING
        worker.abort_requests(["a"])
        assert a.stage is Stage.ABORTED
        # The completed future must NOT resurrect the aborted request.
        time.sleep(0.3)
        assert worker.step() == []
        assert not worker.has_unfinished()

    def test_idle_step_blocks_briefly_on_inflight_decode(self):
        """With only a DECODING request left, step() waits (bounded) instead
        of spinning, and finishes the request once the future lands."""
        worker, _ = _worker(post_delay_s=0.1)
        a = _add(worker, "a", steps=1)
        deadline = time.time() + 2.0
        finished = []
        while not finished and time.time() < deadline:
            finished += worker.step()
        assert finished and finished[0].request_id == "a"

    def test_second_group_decodes_sync_while_one_in_flight(self):
        """Overlap is bounded to ONE background decode group (HBM: the
        r5b scale-128 OOM); a second finishing batch decodes SYNC on the
        main thread as natural backpressure."""
        worker, pipe = _worker(post_delay_s=0.3)
        _add(worker, "a", steps=1)
        _add(worker, "b", steps=3)
        deadline = time.time() + 4.0
        finished = []
        while len(finished) < 2 and time.time() < deadline:
            finished += worker.step()
        assert {r.request_id for r in finished} == {"a", "b"}
        assert pipe.post_thread_ids[0] != threading.get_ident()
        assert threading.get_ident() in pipe.post_thread_ids, \
            "second decode group did not fall back to sync"

    def test_headroom_gate_forces_sync(self):
        """post_overlap_ok=False (decode transient would not fit next to a
        live denoise step) must route every decode synchronously."""
        worker, pipe = _worker(post_delay_s=0.01)
        pipe.post_overlap_ok = lambda by_res: False
        _add(worker, "a", steps=1)
        deadline = time.time() + 2.0
        finished = []
        while not finished and time.time() < deadline:
            finished += worker.step()
        assert finished[0].request_id == "a"
        assert pipe.post_thread_ids == [threading.get_ident()]


def test_engine_end_to_end_async_post():
    """Real tiny pipeline through the Engine with async postprocess on
    (the default): outputs arrive complete and finite."""
    from sduss_tpu.engine.engine import Engine

    c = Config()
    c.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
    c.scheduler.use_mixed_resolution = False
    eng = Engine(c)
    assert eng.workers[0]._post_pool is not None  # "auto" resolves on
    reqs = [Request(f"e{i}", SamplingParams(prompt=f"p{i}", resolution=64,
                                            num_inference_steps=3, seed=i))
            for i in range(3)]
    eng.add_requests(reqs)
    outs = []
    deadline = time.time() + 120
    while eng.has_unfinished_requests() and time.time() < deadline:
        outs.extend(eng.step())
    assert len(outs) == 3 and all(o.finished for o in outs)
    for o in outs:
        assert o.image is not None
        assert np.isfinite(np.asarray(o.image, np.float32)).all()
