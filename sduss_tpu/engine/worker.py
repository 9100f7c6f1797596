"""Per-replica worker: one engine iteration = one scheduled stage execution.

Collapses the reference's Worker + ExecutorMainLoop + ModelRunner process trio
(sduss/worker/worker.py:19-208, executor/utils.py:33-114,
worker/runner/_model_runner.py:21-358) into one host-side object driving
jitted stage functions on its replica device.  The reference's software
pipelining (issue this round's GPU work, then collect LAST round's result,
worker.py:107-115) comes free from JAX async dispatch: stage calls return
futures (device arrays), and the host only blocks when the postprocess stage
materializes images.

Async dispatch must be DEPTH-BOUNDED, though: unthrottled, the host loop
races the device by dozens of steps — a request "finishes" in host time,
enters postprocess, and the image fetch blocks the loop for the whole
queued backlog, freezing admissions for every later arrival (measured on
chip: sparse qps 0.25 arrivals serialized completely, p50 131 s while the
steady step was 518 ms; clustered arrivals were admitted before the first
freeze and behaved).  It also makes the scheduler's slack math blind: wall
clock runs at device speed while scheduling state advances at host speed.
After each denoise iteration the worker enqueues a 4-byte probe of the
batch output and, beyond ``engine.max_inflight_steps``, materializes the
oldest — keeping the host a bounded number of steps ahead (the CUDA
analog would be a stream-depth watermark; the reference syncs implicitly
when it collects each round's outputs, worker.py:107-115).
"""

from __future__ import annotations

import collections
import concurrent.futures
import time
from typing import Dict, List

import numpy as np

from sduss_tpu.config import Config
from sduss_tpu.logger import init_logger
from sduss_tpu.pipelines.base import BasePipeline
from sduss_tpu.request import Request, Stage
from sduss_tpu.scheduler import WorkerScheduler
from sduss_tpu.scheduler.policies import ScheduledBatch

logger = init_logger(__name__)


class Worker:
    def __init__(self, rank: int, pipeline: BasePipeline, config: Config):
        self.rank = rank
        self.pipeline = pipeline
        self.config = config
        self.scheduler = WorkerScheduler(config.scheduler, pipeline.bundle.family,
                                         cache_config=config.cache,
                                         parallel_config=config.parallel)
        self.iteration = 0
        # Per-step schedule log (reference schedule.csv, engine/engine.py:
        # 327-373), populated when engine.collect_data is on.
        self.schedule_log: List[Dict] = []
        # Bounded async-dispatch runahead (module docstring): 4-byte probes
        # of in-flight denoise outputs, oldest forced past the watermark.
        self._inflight: collections.deque = collections.deque()
        # Asynchronous prepare (EngineConfig.async_prepare): with HOST-side
        # encoders (SD3's T5-XXL, ~20 s/encode) a blocking prepare starves
        # denoising — measured r2t: first denoise 171 s after first arrival,
        # 75% aborts.  One background thread serializes prepares among
        # themselves while denoise iterations continue; the only device work
        # in a host-encoder prepare is the tiny latent device_put.
        ap = config.engine.async_prepare
        # encoders_on_host is resolved from "auto" to a bool when the
        # pipeline is built (pipelines/__init__.py:64), which always
        # precedes Worker construction; guard against the unresolved
        # truthy STRING anyway.
        eoh = config.model.encoders_on_host
        eoh = eoh if isinstance(eoh, bool) else False
        self._async_prepare = (eoh if ap == "auto" else bool(ap))
        self._prepare_pool = (
            concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix=f"prepare-{rank}")
            if self._async_prepare else None)
        self._preparing: collections.deque = collections.deque()
        # Asynchronous postprocess (EngineConfig.async_postprocess): the
        # OUTPUT mirror of async prepare.  A blocking VAE decode + image
        # fetch stalls the denoise loop (~2.7 s device at b8 1024^2 plus
        # the download; 25-39% of serving makespan measured at the SDXL
        # chunk6 preset).  One background worker serializes decode groups
        # (bounds decodes in flight at 1); device execution still
        # serializes with denoise on the compute stream, so the HBM
        # workspace peak is unchanged (max, not sum).
        app = config.engine.async_postprocess
        self._async_post = (True if app == "auto" else bool(app))
        self._post_pool = (
            concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix=f"post-{rank}")
            if self._async_post else None)
        self._posting: collections.deque = collections.deque()
        self._posted_async = False  # set per POSTPROCESSING _execute

    # -- request management --------------------------------------------------

    def add_requests(self, reqs: List[Request]) -> None:
        for req in reqs:
            req.dp_rank = self.rank
            self.scheduler.add_request(req)

    def abort_requests(self, request_ids: List[str]) -> List[Request]:
        out = []
        for rid in request_ids:
            req = self.scheduler.abort_request(rid)
            if req is not None:
                req.finish_time = time.time()
                out.append(req)
        if out:
            self.pipeline.evict_finished_state([r.request_id for r in out])
        return out

    def has_unfinished(self) -> bool:
        return self.scheduler.has_unfinished()

    def pending_pixels(self) -> int:
        return self.scheduler.pool.pending_pixels()

    # -- iteration -----------------------------------------------------------

    def step(self) -> List[Request]:
        """Run one scheduled iteration; return requests finished this step."""
        self._poll_prepared(block=False)
        done_async = self._poll_posted(block=False)
        batch = self.scheduler.schedule()
        if batch is None or batch.empty:
            # Nothing schedulable but prepares/decodes in flight: block
            # briefly on the oldest so the engine loop doesn't spin —
            # progress appears the moment it completes.
            if self._preparing:
                self._poll_prepared(block=True)
            elif self._posting:
                done_async += self._poll_posted(block=True)
            return done_async
        self.iteration += 1
        now = time.time()
        for req in batch.requests:
            if req.first_scheduled_time is None:
                req.first_scheduled_time = now

        if batch.requests:
            self._execute(batch)
        if self.config.engine.collect_data:
            res_counts: Dict[int, int] = {}
            for r in batch.requests:
                res_counts[r.resolution] = res_counts.get(r.resolution, 0) + 1
            self.schedule_log.append({
                "time": now, "iteration": self.iteration,
                "stage": batch.stage.value, "batch_size": len(batch.requests),
                "resolutions": ";".join(f"{k}x{v}" for k, v in sorted(res_counts.items())),
                "predicted_step_ms": batch.requests[0].predicted_step_ms
                if batch.requests else 0.0,
            })
        if (batch.stage is Stage.PREPARE and self._prepare_pool is not None) \
                or (batch.stage is Stage.POSTPROCESSING
                    and getattr(self, "_posted_async", False)):
            # _execute submitted the encode / decode to a background thread;
            # park the requests (PREPARING / DECODING) until the future
            # completes.  Policy aborts attached to this batch still finish
            # NOW — advance() is skipped, so handle them here (they were
            # moved to ABORTED by schedule() but not yet removed/returned).
            if batch.stage is Stage.PREPARE:
                self.scheduler.begin_prepare(batch)
            else:
                self.scheduler.begin_postprocess(batch)
            aborted = list(batch.aborts)
            if aborted:
                now2 = time.time()
                for req in aborted:
                    req.finish_time = now2
                    self.scheduler.pool.remove(req.request_id)
                self.pipeline.evict_finished_state(
                    [r.request_id for r in aborted])
            return done_async + aborted
        finished = self.scheduler.advance(batch)
        for req in finished:
            req.finish_time = time.time()
        if finished:
            # composition-state keys embed request ids — entries touching a
            # finished/aborted request are unreachable; free the HBM now
            self.pipeline.evict_finished_state(
                [r.request_id for r in finished])
        return done_async + finished

    def _poll_posted(self, block: bool) -> List[Request]:
        """Finish requests whose background decode completed; optionally
        block briefly on the oldest in-flight one."""
        finished: List[Request] = []
        while self._posting:
            fut, reqs = self._posting[0]
            if not fut.done():
                if not block:
                    break
                concurrent.futures.wait([fut], timeout=0.05)
                if not fut.done():
                    break
            self._posting.popleft()
            fut.result()  # propagate decode exceptions to the engine loop
            done = self.scheduler.finish_postprocess(reqs)
            now = time.time()
            for req in done:
                req.finish_time = now
            finished.extend(done)
            block = False  # drain further completed futures without waiting
        return finished

    def _poll_prepared(self, block: bool) -> None:
        """Release requests whose background prepare completed; optionally
        block briefly on the oldest in-flight one."""
        while self._preparing:
            fut, reqs = self._preparing[0]
            if not fut.done():
                if not block:
                    return
                concurrent.futures.wait([fut], timeout=0.05)
                if not fut.done():
                    return
            self._preparing.popleft()
            fut.result()  # propagate prepare exceptions to the engine loop
            self.scheduler.finish_prepare(reqs)
            block = False  # drain further completed futures without waiting

    def _execute(self, batch: ScheduledBatch) -> None:
        pipe = self.pipeline
        if batch.stage is Stage.PREPARE:
            if self._prepare_pool is not None:
                fut = self._prepare_pool.submit(pipe.prepare,
                                                list(batch.requests))
                self._preparing.append((fut, list(batch.requests)))
            else:
                pipe.prepare(batch.requests)
        elif batch.stage is Stage.DENOISING:
            by_res: Dict[int, List[Request]] = {}
            for r in batch.requests:
                by_res.setdefault(r.resolution, []).append(r)
            t0 = time.perf_counter()
            steps_run = 1
            k = min(self.config.scheduler.steps_per_dispatch,
                    min(r.remain_steps for r in batch.requests))
            if (k > 1 and not batch.mixed
                    and pipe.denoise_chunk(by_res, k, allow_cold=False)):
                # FUSED multi-step dispatch: k sampler steps ran inside one
                # jitted program (SchedulerConfig.steps_per_dispatch) —
                # tables/latents already advanced by k.  Scheduling acts at
                # chunk boundaries; ineligible configs returned False and
                # fall through to per-step dispatch below.
                steps_run = k
            elif (k > 1 and batch.mixed
                    and self.config.scheduler.use_mixed_resolution
                    and hasattr(pipe, "denoise_chunk_mixed")
                    and pipe.denoise_chunk_mixed(by_res, k,
                                                 allow_cold=False)):
                # mixed-composition fused dispatch: the composition is
                # pinned for k steps inside one program (cold keys fall
                # back to per-step below while the warm daemon mints them)
                steps_run = k
            elif batch.mixed and self.config.scheduler.use_mixed_resolution \
                    and hasattr(pipe, "denoise_step_mixed"):
                # allow_cold=False: a cold mixed compile key serves dense
                # this step and warms in the background (never stalls the
                # serving loop; see denoise_step_mixed docstring)
                pipe.denoise_step_mixed(by_res, allow_cold=False)
            else:
                pipe.denoise_step(by_res, allow_cold=False)
            for r in batch.requests:
                if r.start_denoising_time is None:
                    r.start_denoising_time = time.time()
            saturated = self._throttle(batch.requests[0].latents)
            if saturated:
                # Steady state (the throttle materialized a probe, so wall
                # time per iteration tracks device step time): feed the
                # realized step time back to the policy.  Cache-on steps run
                # far below the dense profile the predictor was fitted on
                # (SD3 span: 322 ms realized vs 972 ms predicted, r2t), and
                # a 3x overestimate turns the SLO slack math into aborts.
                self.scheduler.policy.observe_step_time(
                    batch.requests,
                    (time.perf_counter() - t0) * 1e3 / steps_run)
        elif batch.stage is Stage.POSTPROCESSING:
            self._drain_inflight()
            by_res = {}
            for r in batch.requests:
                by_res.setdefault(r.resolution, []).append(r)
            # Background the decode only when (a) no other decode group is
            # already in flight (bound the overlapped live set to ONE) and
            # (b) the pipeline's headroom estimate says the decode
            # transient fits NEXT TO a running denoise step (measured
            # failure without the gate: r5b scale-128 b8 1024^2 died
            # RESOURCE_EXHAUSTED in a denoise step during an async
            # decode).  Otherwise decode synchronously.
            overlap = (self._post_pool is not None
                       and not self._posting
                       and getattr(pipe, "post_overlap_ok",
                                   lambda b: True)(by_res))
            self._posted_async = overlap
            if overlap:
                fut = self._post_pool.submit(pipe.postprocess, by_res)
                self._posting.append((fut, list(batch.requests)))
            else:
                pipe.postprocess(by_res)
        else:  # pragma: no cover
            raise ValueError(batch.stage)

    def _throttle(self, latents) -> bool:
        """Bound async-dispatch runahead to engine.max_inflight_steps.

        ``latents`` is a per-request view of this iteration's batched step
        output; a (1,) slice keeps only a 4-byte fetch per sync while still
        waiting on the whole step (the slice depends on it).  Returns True
        when a probe was materialized this call — i.e. the pipeline is
        saturated and host wall time per iteration tracks device time.
        """
        depth = self.config.engine.max_inflight_steps
        if depth <= 0:
            return False
        self._inflight.append(latents[0, 0, 0, 0:1])
        saturated = False
        while len(self._inflight) > depth:
            np.asarray(self._inflight.popleft())
            saturated = True
        return saturated

    def _drain_inflight(self) -> None:
        while self._inflight:
            np.asarray(self._inflight.popleft())
