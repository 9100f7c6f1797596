"""Per-replica worker: one engine iteration = one scheduled stage execution.

Collapses the reference's Worker + ExecutorMainLoop + ModelRunner process trio
(sduss/worker/worker.py:19-208, executor/utils.py:33-114,
worker/runner/_model_runner.py:21-358) into one host-side object driving
jitted stage functions on its replica device.  The reference's software
pipelining (issue this round's GPU work, then collect LAST round's result,
worker.py:107-115) comes free from JAX async dispatch: stage calls return
futures (device arrays), and the host only blocks when the postprocess stage
materializes images.
"""

from __future__ import annotations

import time
from typing import Dict, List

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
                                         cache_config=config.cache)
        self.iteration = 0
        # Per-step schedule log (reference schedule.csv, engine/engine.py:
        # 327-373), populated when engine.collect_data is on.
        self.schedule_log: List[Dict] = []

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
        return out

    def has_unfinished(self) -> bool:
        return self.scheduler.has_unfinished()

    def pending_pixels(self) -> int:
        return self.scheduler.pool.pending_pixels()

    # -- iteration -----------------------------------------------------------

    def step(self) -> List[Request]:
        """Run one scheduled iteration; return requests finished this step."""
        batch = self.scheduler.schedule()
        if batch is None or batch.empty:
            return []
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
        finished = self.scheduler.advance(batch)
        for req in finished:
            req.finish_time = time.time()
        return finished

    def _execute(self, batch: ScheduledBatch) -> None:
        pipe = self.pipeline
        if batch.stage is Stage.PREPARE:
            pipe.prepare(batch.requests)
        elif batch.stage is Stage.DENOISING:
            by_res: Dict[int, List[Request]] = {}
            for r in batch.requests:
                by_res.setdefault(r.resolution, []).append(r)
            if batch.mixed and self.config.scheduler.use_mixed_resolution \
                    and hasattr(pipe, "denoise_step_mixed"):
                pipe.denoise_step_mixed(by_res)
            else:
                pipe.denoise_step(by_res)
            for r in batch.requests:
                if r.start_denoising_time is None:
                    r.start_denoising_time = time.time()
        elif batch.stage is Stage.POSTPROCESSING:
            by_res = {}
            for r in batch.requests:
                by_res.setdefault(r.resolution, []).append(r)
            pipe.postprocess(by_res)
        else:  # pragma: no cover
            raise ValueError(batch.stage)
