"""Core serving engine: single-controller loop over DP replica workers.

Replaces the reference's Engine + MpExecutor + queue-RPC machinery
(sduss/engine/engine.py:42-372, executor/mp_executor.py:21-164) with direct
method calls: each DP replica is a device owned by a Worker in THIS process;
``step()`` dispatches newly waiting requests and runs one iteration on every
replica.  No serialization, no process tree — XLA async dispatch provides the
only concurrency that matters (host scheduling overlapped with device work).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Union

from sduss_tpu.config import Config
from sduss_tpu.dispatcher import get_dispatch_policy
from sduss_tpu.engine.worker import Worker
from sduss_tpu.logger import init_logger
from sduss_tpu.metrics import EngineStats
from sduss_tpu.pipelines import build_pipeline
from sduss_tpu.request import Request, RequestOutput, SamplingParams, Stage

logger = init_logger(__name__)


class Engine:
    def __init__(self, config: Config, devices: Optional[list] = None):
        import os

        import jax

        self.config = config
        if config.engine.compilation_cache_dir:
            try:
                jax.config.update(
                    "jax_compilation_cache_dir",
                    os.path.expanduser(config.engine.compilation_cache_dir))
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
            except Exception:  # already-initialized or unsupported backend
                pass
        from sduss_tpu.parallel.replica import build_placements

        if devices is None:
            # Local (addressable) devices, not the global list: in a
            # multi-host world (jax.distributed initialized; one engine
            # process per host) jax.devices() spans the pod, but a replica
            # can only place data on THIS process's devices — DP replicas
            # never span hosts (parallel/multihost.py).  Single-process,
            # local_devices() == devices().
            devices = jax.local_devices()
            sel = config.parallel.devices
            if sel is not None:
                devices = [devices[i] for i in sel]
        par = config.parallel
        placements = build_placements(par.dp, par.sp, par.tp, devices)

        # One bundle (host weights) shared; per-replica pipelines place params
        # on their own device/sub-mesh lazily.
        first = build_pipeline(config, device=placements[0])
        self.workers: List[Worker] = [Worker(0, first, config)]
        for rank in range(1, par.dp):
            pipe = build_pipeline(config, device=placements[rank], bundle=first.bundle)
            self.workers.append(Worker(rank, pipe, config))

        self.dispatch_policy = get_dispatch_policy(config.engine.dispatcher_policy)
        self._waiting: List[Request] = []
        self._known: Dict[str, int] = {}  # request_id -> dp_rank (or -1 waiting)
        self.stats = EngineStats()

    # -- request API ---------------------------------------------------------

    def add_requests(self, reqs: Sequence[Request]) -> None:
        for req in reqs:
            if req.request_id in self._known:
                raise ValueError(f"duplicate request id {req.request_id}")
            self._known[req.request_id] = -1
            self._waiting.append(req)
            self.stats.on_arrival(req)

    def add_request(self, request_id: str, params: SamplingParams,
                    deadline: Optional[float] = None) -> Request:
        req = Request(request_id, params, deadline=deadline)
        self.add_requests([req])
        return req

    def abort_requests(self, request_ids: Sequence[str]) -> List[RequestOutput]:
        outs: List[RequestOutput] = []
        ids = set(request_ids)
        still_waiting = []
        for req in self._waiting:
            if req.request_id in ids:
                req.stage = Stage.ABORTED
                req.finish_time = time.time()
                self._known.pop(req.request_id, None)
                outs.append(RequestOutput.from_request(req))
                ids.discard(req.request_id)
            else:
                still_waiting.append(req)
        self._waiting = still_waiting
        for worker in self.workers:
            for req in worker.abort_requests(list(ids)):
                self._known.pop(req.request_id, None)
                outs.append(RequestOutput.from_request(req))
                ids.discard(req.request_id)
        # user/API aborts count in the same stats stream as scheduler
        # aborts (which flow through step()); otherwise summary() shows
        # arrived > finished + aborted forever
        for out in outs:
            self.stats.on_finish(out)
        return outs

    def has_unfinished_requests(self) -> bool:
        return bool(self._waiting) or any(w.has_unfinished() for w in self.workers)

    # -- main loop -----------------------------------------------------------

    def step(self) -> List[RequestOutput]:
        """Dispatch waiting requests, run one iteration per replica, collect
        finished outputs (reference Engine.step, engine/engine.py:170-225)."""
        if self._waiting:
            loads = [w.pending_pixels() for w in self.workers]
            ranks = self.dispatch_policy.assign(self._waiting, loads)
            per_rank: Dict[int, List[Request]] = {}
            for req, rank in zip(self._waiting, ranks):
                per_rank.setdefault(rank, []).append(req)
                self._known[req.request_id] = rank
            for rank, reqs in per_rank.items():
                self.workers[rank].add_requests(reqs)
            self._waiting = []

        outputs: List[RequestOutput] = []
        for worker in self.workers:
            for req in worker.step():
                self._known.pop(req.request_id, None)
                out = RequestOutput.from_request(req)
                self.stats.on_finish(out)
                outputs.append(out)
        return outputs

    def prewarm(self, resolutions: Optional[Sequence[int]] = None,
                buckets: Optional[Sequence[int]] = None,
                steps: Optional[int] = None,
                compositions: Union[str, Sequence[Dict[int, int]], None]
                = None) -> float:
        """Compile-warm every (resolution x batch-bucket x cache-mode) step
        program by running throwaway requests through the production loop.

        XLA serving needs this where the reference's eager CUDA engine does
        not: each distinct (bucket, mode, res) combination is a separately
        compiled program, and a cold key hit mid-serving stalls the whole
        batch for the compile (pipelines/base.py:16 bucket rationale).  With
        the deep cache on, ``steps`` defaults to deep_warmup + interval + 1
        so both the full and shallow step programs compile.  Returns elapsed
        seconds; engine stats are reset afterwards so the throwaway requests
        don't pollute serving metrics.

        ``compositions``: mixed-resolution batch shapes ({res: count}, e.g.
        {512: 2, 1024: 2}) to warm through the PATCHED path.  These are
        driven directly on each replica's pipeline (denoise_step_mixed) —
        not through the scheduler, whose policy may serve the resolutions
        as separate uniform batches and never mint the mixed jit key.
        Pass the string "auto" to enumerate EVERY mixed compile key
        reachable under max_batch_size (ops/patching.py
        enumerate_mixed_compositions) — hand-listing under-covers: a cold
        composition key minted mid-serving stalled the r2l mixed pass
        ~150 s twice and aborted 10/12 requests.
        """
        t0 = time.time()
        sc = self.config.scheduler
        cc = self.config.cache
        res_list = list(resolutions or self.config.model.resolutions)
        interval = max(cc.deep_max_interval if cc.deep_adaptive
                       else cc.deep_interval, 1)
        if steps is None:
            steps = 2
            if cc.enabled and (cc.mode == "deep"
                               or getattr(cc, "sd3_deep_span", None)):
                # enough steps past warmup that BOTH the full and the
                # shallow programs mint (span-skip: the shallow key only
                # compiles once a full step's delta exists)
                steps = cc.deep_warmup + interval + 1
        if self.config.parallel.sp_mode == "displaced":
            # mint BOTH the sync (warmup) and the stale step program
            steps = max(steps, self.config.parallel.displaced_warmup + 1)
        # Under adaptive refresh the drift trigger could force every prewarm
        # step full and never mint the shallow program (a cold key would
        # then stall serving); pin the threshold high so the max-interval
        # cap drives the schedule and BOTH programs (plus the drift jit)
        # compile.
        saved_threshold = cc.deep_drift_threshold
        if cc.enabled and cc.mode == "deep" and cc.deep_adaptive:
            cc.deep_drift_threshold = float("inf")
        try:
            return self._prewarm_inner(t0, sc, cc, res_list, steps, buckets,
                                       compositions)
        finally:
            cc.deep_drift_threshold = saved_threshold

    def _hbm_note(self) -> str:
        """Short HBM-usage suffix for prewarm progress lines.  Prewarm is
        the pipeline's HBM-peak walk (every res x bucket x mode key plus
        its threaded cache state), and the r2t/r2v OOM postmortems each
        cost a chip day — make headroom visible as the walk proceeds."""
        try:
            import jax

            ms = jax.local_devices()[0].memory_stats() or {}
            used, lim = ms.get("bytes_in_use"), ms.get("bytes_limit")
            if used is not None and lim:
                return f" (HBM {used / 1e9:.1f}/{lim / 1e9:.1f} GB)"
        except Exception:
            pass
        return ""

    def _hbm_limit(self) -> float:
        """Device HBM budget: runtime memory_stats when exposed, else the
        configured fallback (the axon relay exposes none; v5e = 16 GB)."""
        try:
            import jax

            ms = jax.local_devices()[0].memory_stats() or {}
            if ms.get("bytes_limit"):
                return float(ms["bytes_limit"])
        except Exception:
            pass
        return float(self.config.engine.hbm_bytes_fallback)

    def _bucket_fits(self, pipe, res: int, bucket: int) -> bool:
        """Proactive prewarm capacity estimate: resident params + the
        bucket's composition-state bytes (pipe.estimate_serving_state_bytes,
        eval_shape over the real builders) + the configured workspace
        margin must fit the HBM budget.  Estimation failures default to
        True — the in-loop RESOURCE_EXHAUSTED catch remains the backstop."""
        try:
            need = pipe.estimate_serving_state_bytes(res, bucket)
            if not need:
                return True
            if self.config.scheduler.steps_per_dispatch > 1:
                # Fused k-step chunk programs hold extra live copies of the
                # threaded state across the in-graph loop (r2z: bucket 4
                # passed the plain estimate, then the chunk-config prewarm
                # OOMed and the caught failure poisoned the relay device
                # for the rest of the process) — budget the state twice.
                need *= 2
            total = pipe.device_param_bytes() + need \
                + float(self.config.engine.prewarm_hbm_margin)
            fits = total <= self._hbm_limit()
            if not fits:
                logger.info(
                    "prewarm capacity estimate: res %d bucket %d needs "
                    "%.1f GB params + %.1f GB state + %.1f GB margin > "
                    "%.1f GB HBM", res, bucket,
                    pipe.device_param_bytes() / 1e9, need / 1e9,
                    self.config.engine.prewarm_hbm_margin / 1e9,
                    self._hbm_limit() / 1e9)
            return fits
        except Exception:  # noqa: BLE001
            return True

    def _prewarm_chunk(self, pipe, res: int, b: int, steps: int) -> None:
        """Mint the fused multi-step program for (res, bucket)
        (SchedulerConfig.steps_per_dispatch; pipelines denoise_chunk).
        SD3 span chunks are eligible at ANY interval phase (the phase is a
        traced scalar, round 3); compact token state still needs its
        anchoring sync step and the UNet chunk its boundary, so per-step
        throwaway steps run until the chunk becomes eligible — exactly how
        the worker reaches it in production (usually 0-1 iterations now)."""
        sc = self.config.scheduler
        cc = self.config.cache
        itv = max(getattr(cc, "deep_interval", 1), 1)
        k = min(sc.steps_per_dispatch, steps)
        n_steps = k + itv + max(getattr(cc, "deep_warmup", 0), 0) + 2
        reqs = [Request(f"prewarm-chunk-{res}-{b}-{i}", SamplingParams(
                    prompt="", resolution=res,
                    num_inference_steps=n_steps, seed=0))
                for i in range(b)]
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        by_res = {res: reqs}
        minted = False
        for _ in range(n_steps - k):
            if pipe.denoise_chunk(by_res, k):
                minted = True
                break
            pipe.denoise_step(by_res)
        if not minted:
            logger.info("prewarm: chunk program (res %d bucket %d k %d) "
                        "ineligible under this configuration", res, b, k)
        pipe.release_serving_state()

    def _prewarm_partial(self, pipe, res: int, b: int) -> None:
        """Mint the row-granular "partial" deep programs for (res, bucket)
        (CacheConfig.deep_row_warmup; pipelines/base.py _denoise_group_deep
        mode "partial").  One compile key per power-of-two row bucket kb < b:
        drive throwaway requests past trajectory warmup, then drop exactly
        kb rows' deep state before each extra step (what a fresh admission
        looks like) so the production mode choice selects the partial
        program."""
        cc = self.config.cache
        itv = max(cc.deep_max_interval if cc.deep_adaptive
                  else cc.deep_interval, 1)
        kbs = []
        kb = 1
        while kb < b:
            kbs.append(kb)
            kb *= 2
        if not kbs or itv <= 1:
            return  # partial unreachable: b == 1 or every step is full
        warm = max(cc.deep_warmup, 0)
        n_steps = warm + 2 + len(kbs)
        reqs = [Request(f"prewarm-partial-{res}-{b}-{i}", SamplingParams(
                    prompt="", resolution=res,
                    num_inference_steps=n_steps, seed=0))
                for i in range(b)]
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        by_res = {res: reqs}
        for _ in range(warm + 1):  # past warmup: every row fresh + aligned
            pipe.denoise_step(by_res)
        for kb in kbs:
            for j, r in enumerate(reqs):
                if j < kb:
                    r.deep_state = None
                r.deep_age = 0
            pipe.denoise_step(by_res)
        pipe.release_serving_state()
        logger.info("prewarm: partial deep programs (res %d bucket %d "
                    "kb %s) done%s", res, b, kbs, self._hbm_note())

    def _settle_after_oom(self) -> None:
        """Best-effort recovery after an in-process RESOURCE_EXHAUSTED:
        drop python garbage so dead device buffers release, then verify the
        device accepts a small allocation again (bounded wait).  On the
        axon relay a failed allocation can poison subsequent ops — if the
        probe never succeeds, serving is about to fail loudly anyway."""
        import gc
        import time as _time

        import jax
        import jax.numpy as jnp

        gc.collect()
        for _ in range(30):
            try:
                import numpy as _np

                _np.asarray(jnp.zeros((256,), jnp.float32) + 1.0)
                return
            except Exception:  # noqa: BLE001
                gc.collect()
                _time.sleep(2.0)
        # Fail FAST and loud: on the axon relay a poisoned device never
        # recovers in-process, and limping on just moves the crash to an
        # arbitrary later op (r2z: the probe's text-encode device_put died
        # 20 minutes after this point with a bare RESOURCE_EXHAUSTED).
        raise RuntimeError(
            "device still refusing small allocations after an in-process "
            "RESOURCE_EXHAUSTED — the process is poisoned; restart with "
            "smaller buckets (scheduler.max_batch_size) or a larger "
            "prewarm_hbm_margin")

    def _prewarm_inner(self, t0, sc, cc, res_list, steps, buckets,
                       compositions) -> float:
        bks = [b for b in (buckets or sc.batch_buckets)
               if b <= sc.max_batch_size]
        if compositions == "auto":
            from sduss_tpu.ops import patching

            pipe0 = self.workers[0].pipeline
            cells = sc.patch_size // pipe0.vae_scale
            res_to_grid = {}
            for res in res_list:
                hw = res // pipe0.vae_scale
                if hw % cells == 0:  # patchable (denoise_step_mixed gate)
                    res_to_grid[res] = hw // cells
            compositions = patching.enumerate_mixed_compositions(
                res_to_grid, sc.max_batch_size, sc.patch_buckets,
                sc.batch_buckets)
            limit = self.config.engine.prewarm_mixed_limit
            total_keys = len(compositions)
            if limit and total_keys > limit:
                # Smallest total batches first: rolling admission reaches
                # them soonest; the dropped tail serves DENSE via warm-key
                # routing while a daemon thread warms it on throwaways.
                # Never cap silently — SD1.5's space is 309 keys (~15 h of
                # relay compiles at ~3 min each, measured r3c).
                compositions = sorted(
                    compositions, key=lambda c: (sum(c.values()),
                                                 sorted(c.items())))[:limit]
                logger.warning(
                    "prewarm: mixed composition space capped at %d of %d "
                    "keys (EngineConfig.prewarm_mixed_limit; the rest "
                    "serve dense until background-warmed)", limit,
                    total_keys)
            logger.info("prewarm: auto-enumerated %d mixed compile keys "
                        "for resolutions %s", len(compositions),
                        sorted(res_to_grid))
        n = 0
        # Drive each REPLICA's pipeline directly (like the mixed block
        # below) rather than dispatching through the engine: with dp > 1
        # the dispatcher splits a bucket-sized batch across idle replicas,
        # so no worker would ever mint the larger bucket keys — the exact
        # cold-key stall prewarm exists to prevent.
        for worker in self.workers:
            pipe = worker.pipeline
            for res in res_list:
                for b in bks:
                    if b > sc.max_batch_size:
                        break  # shrunk by a capacity hit at a smaller res
                    if not self._bucket_fits(pipe, res, b):
                        # PROACTIVE capacity gate: params + estimated
                        # composition state + workspace margin exceed HBM.
                        # Never attempt the bucket — on the axon relay an
                        # in-process RESOURCE_EXHAUSTED can poison later
                        # device ops (r2w: the caught b12 OOM left the
                        # probe's next tiny device_put failing), the same
                        # failure mode that forced the profiler's
                        # subprocess isolation.
                        prev = max((x for x in bks if x < b), default=1)
                        logger.warning(
                            "prewarm: res %d bucket %d skipped by capacity "
                            "estimate — capping max_batch_size at %d%s",
                            res, b, prev, self._hbm_note())
                        sc.max_batch_size = min(sc.max_batch_size, prev)
                        break
                    reqs = [Request(f"prewarm-{res}-{b}-{i}", SamplingParams(
                                prompt="", resolution=res,
                                num_inference_steps=steps, seed=0))
                            for i in range(b)]
                    try:
                        pipe.prepare(reqs)
                        for r in reqs:
                            r.stage = Stage.DENOISING
                        by_res = {res: reqs}
                        for _ in range(steps):
                            pipe.denoise_step(by_res)
                        for r in reqs:
                            r.stage = Stage.POSTPROCESSING
                        # Throwaway composition state must not stack across
                        # prewarm iterations (r2r: retained big-bucket hybrid
                        # entries OOMed the 1024^2 b8 step) — and must be gone
                        # BEFORE the decode: full-res decode activations are
                        # the pipeline HBM peak, and with hybrid state still
                        # live the b8 1024^2 prewarm decode hit
                        # RESOURCE_EXHAUSTED (r2t).  Decode only needs the
                        # request latents.
                        pipe.release_serving_state()
                        pipe.postprocess(by_res)
                        if sc.steps_per_dispatch > 1:
                            self._prewarm_chunk(pipe, res, b, steps)
                        if (cc.enabled and cc.mode == "deep"
                                and getattr(cc, "deep_row_warmup", False)
                                and hasattr(pipe.bundle.denoiser,
                                            "_deep_tail")):
                            self._prewarm_partial(pipe, res, b)
                    except Exception as e:  # noqa: BLE001
                        if "RESOURCE_EXHAUSTED" not in str(e):
                            raise
                        # CAPACITY DISCOVERY, not a fatal error: this bucket
                        # genuinely exceeds device HBM at this resolution
                        # (r2w: the default max_batch_size=12 walked prewarm
                        # into a b12 1024^2 hybrid state ~6 GB next to
                        # 6.7 GB of params).  Shrink the admission ceiling
                        # to the largest bucket that fit and keep serving —
                        # the scheduler reads max_batch_size live, so no
                        # production batch will ever mint this key.
                        prev = max((x for x in bks if x < b), default=1)
                        logger.warning(
                            "prewarm: res %d bucket %d RESOURCE_EXHAUSTED — "
                            "capping max_batch_size at %d%s", res, b, prev,
                            self._hbm_note())
                        sc.max_batch_size = min(sc.max_batch_size, prev)
                        pipe.release_serving_state()
                        self._settle_after_oom()
                        break
                    n += b
                    logger.info("prewarm: res %d bucket %d done%s",
                                res, b, self._hbm_note())
                if hasattr(pipe, "prewarm_carry_seeds"):
                    # row-warm x hybrid: mint every carry-seed / shrink
                    # program the bucket ladder reaches (cold composition-
                    # change compiles mid-serving caused the r4d sd15
                    # pass-1 aborts)
                    pipe.prewarm_carry_seeds(
                        res, [x for x in bks if x <= sc.max_batch_size])
                logger.info("prewarm: rank %d res %d done (%.1fs elapsed)",
                            worker.rank, res, time.time() - t0)
        chunk_k = sc.steps_per_dispatch
        mix_itv = max(cc.deep_interval, 1) if (cc.enabled
                                               and cc.mode == "deep") else 1
        for comp in compositions or ():
            for worker in self.workers:
                pipe = worker.pipeline
                reqs_by_res: Dict[int, List[Request]] = {}
                flat: List[Request] = []
                for res, count in sorted(comp.items()):
                    rs = [Request(f"prewarm-mix-{res}-{i}", SamplingParams(
                        prompt="", resolution=res,
                        num_inference_steps=steps + mix_itv + chunk_k + 2,
                        seed=0))
                        for i in range(count)]
                    reqs_by_res[res] = rs
                    flat.extend(rs)
                pipe.prepare(flat)
                for r in flat:
                    r.stage = Stage.DENOISING
                for _ in range(steps):
                    pipe.denoise_step_mixed(reqs_by_res)
                if chunk_k > 1 and hasattr(pipe, "denoise_chunk_mixed"):
                    # mint the composition's fused-chunk program too (deep
                    # chunks need a full-boundary start — walk per-step up
                    # to one interval to reach one)
                    for _ in range(mix_itv + 1):
                        if pipe.denoise_chunk_mixed(reqs_by_res, chunk_k):
                            break
                        pipe.denoise_step_mixed(reqs_by_res)
                n += len(flat)
                pipe.release_serving_state()
            logger.info("prewarm: mixed composition %s done (%.1fs elapsed)%s",
                        dict(sorted(comp.items())), time.time() - t0,
                        self._hbm_note())
        self.stats = EngineStats()
        dt = time.time() - t0
        logger.info("prewarm: %d resolutions x %d buckets (%d requests) "
                    "in %.1fs", len(res_list), len(bks), n, dt)
        return dt

    # -- data collection (reference SDUSS_COLLECT_DATA CSVs,
    #    engine/engine.py:327-373) ---------------------------------------------

    def dump_data(self, out_dir: Optional[str] = None) -> None:
        """Write request_data.csv + per-rank schedule CSVs to collect_dir."""
        import csv
        import os

        out_dir = out_dir or self.config.engine.collect_dir
        os.makedirs(out_dir, exist_ok=True)
        self.stats.dump_csv(os.path.join(out_dir, "request_data.csv"))
        for worker in self.workers:
            if not worker.schedule_log:
                continue
            path = os.path.join(out_dir, f"schedule_rank{worker.rank}.csv")
            with open(path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(worker.schedule_log[0]))
                w.writeheader()
                w.writerows(worker.schedule_log)
        logger.info("collected data written to %s", out_dir)

    # -- convenience ---------------------------------------------------------

    @classmethod
    def from_config(cls, config: Config) -> "Engine":
        return cls(config)
