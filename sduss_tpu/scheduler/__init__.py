"""Worker-side iteration scheduler.

Stage bookkeeping equivalent of the reference Scheduler
(sduss/worker/scheduler/scheduler.py:23-206): owns the per-replica pool,
delegates batch choice to a policy, and advances request stages after each
executed iteration.
"""

from __future__ import annotations

from typing import List, Optional

from sduss_tpu.config import SchedulerConfig
from sduss_tpu.request import Request, Stage
from sduss_tpu.scheduler.policies import ScheduledBatch, get_policy
from sduss_tpu.scheduler.request_pool import RequestPool


class WorkerScheduler:
    def __init__(self, config: SchedulerConfig, family: str,
                 cache_config=None):
        self.config = config
        self.pool = RequestPool()
        self.policy = get_policy(config.policy, config, family)
        # Cache settings inform admission timing (deep-phase alignment);
        # None (tests / cache-off) disables the gate.
        self.policy.cache_config = cache_config

    def add_request(self, req: Request) -> None:
        req.stage = Stage.PREPARE
        self.pool.add(req)

    def abort_request(self, request_id: str) -> Optional[Request]:
        req = self.pool.get(request_id)
        if req is None:
            return None
        self.pool.move(req, Stage.ABORTED)
        self.pool.remove(request_id)
        return req

    def has_unfinished(self) -> bool:
        return self.pool.unfinished() > 0

    def schedule(self) -> Optional[ScheduledBatch]:
        batch = self.policy.schedule(self.pool)
        if batch is not None:
            for req in batch.aborts:
                self.pool.move(req, Stage.ABORTED)
        return batch

    def advance(self, batch: ScheduledBatch) -> List[Request]:
        """Update stages after the batch executed; return finished requests."""
        finished: List[Request] = []
        if batch.stage is Stage.PREPARE:
            for req in batch.requests:
                self.pool.move(req, Stage.DENOISING)
        elif batch.stage is Stage.DENOISING:
            for req in batch.requests:
                if req.remain_steps <= 0:
                    self.pool.move(req, Stage.POSTPROCESSING)
        elif batch.stage is Stage.POSTPROCESSING:
            for req in batch.requests:
                self.pool.move(req, Stage.FINISHED)
                self.pool.remove(req.request_id)
                finished.append(req)
        finished.extend(batch.aborts)
        for req in batch.aborts:
            self.pool.remove(req.request_id)
        return finished
