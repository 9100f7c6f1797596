"""Policy-comparison matrix on the host-only simulator.

The reference's entire evaluation is the esymred vs fcfs_mixed vs
orca_resbyres QPS sweep (reference scripts/paper/e2e.sh:10-13, metrics at
scripts/draw/get_metric.py:62-120).  This driver runs the REAL policy
objects (sduss_tpu.scheduler) against a virtual clock whose costs are
chip-true:

- denoise step  = the fitted on-chip latency predictor
  (exp/predictor_{family}_v5e.npz, ridge over resolution-count features,
  fitted from v5e profiler samples) x a cache full/shallow factor from the
  measured bench splits (SDXL full 830 ms / shallow 360 ms at b8 deep-3;
  SD3 span 1:24 full 230 ms / shallow 12.2 ms).
- postprocess   = the on-chip decode tables (exp/profile_{family}_v5e.json
  post_batch_latency), summed per resolution group.
- prepare       = a family constant (host text-encode, bucket-amortized).

All three policies share the SAME cost model and the SAME cache schedule
mirror (full iff any batch member needs a full pass) — the cache is a
pipeline property, not a policy property, matching the reference's e2e
runs which export ESYMRED_USE_CACHE=TRUE for its headline rows
(reference scripts/paper/e2e.sh:32-37).  Only ESyMReD aborts; the FCFS /
Orca baselines run every request to completion, so at overload their SLO
attainment collapses while ESyMReD sheds.

Caveat (documented, shared by any simulator): ESyMReD *predicts* with the
same fitted predictor the clock charges, so its predictions are exact up
to the cache factor — which its realized-step-time EMA learns, as on
chip.  The comparison is therefore a best-case for the predictor, not for
the policy logic; the chip spot-checks (scripts/serving_probe.py
--policy) keep it honest.

Usage::

    python scripts/sim_policy_matrix.py --model sdxl --num 500 \
        --qps 0.8,0.9,1.0,1.1,1.2 --policies esymred,fcfs_mixed,orca_resbyres
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sduss_tpu.benchmark.metrics import RequestRecord, compute_metrics
from sduss_tpu.benchmark.traces import TraceRow, generate_trace, load_trace
from sduss_tpu.config import CacheConfig, SchedulerConfig
from sduss_tpu.request import Request, SamplingParams, Stage
from sduss_tpu.scheduler.policies import get_policy
from sduss_tpu.scheduler.predictor import LatencyPredictor
from sduss_tpu.scheduler.profiles import get_profile
from sduss_tpu.scheduler.request_pool import RequestPool

# Measured cache shallow/full step-cost ratios: ONE source of truth in
# sduss_tpu/scheduler/profiles.py (shallow_step_ratio, boundary-aware —
# the production presets set deep_boundary=1, whose conv-only shallow
# steps cost 0.06x not 0.434x) — the scheduler's EMA prior and this
# simulator's clock must never diverge silently.
from sduss_tpu.scheduler.profiles import shallow_step_ratio
# Host text-encode + latent init per PREPARE batch, seconds
# (bucket-amortized; sd3 = batched dual-CLIP+T5 after the r2t fixes).
PREPARE_S = {"sdxl": 0.35, "sd15": 0.2, "sd3": 0.9}
DEPLOYED_RES = {"sdxl": (512, 768, 1024), "sd15": (256, 512, 768),
                "sd3": (512, 768, 1024)}


class CostModel:
    """Chip-true virtual-clock costs, shared by every policy."""

    def __init__(self, family: str, predictor: LatencyPredictor,
                 profile, cache: CacheConfig):
        self.family = family
        self.predictor = predictor
        self.profile = profile
        self.cache = cache

    def denoise_s(self, requests, full: bool) -> float:
        counts = {r: 0 for r in self.predictor.resolutions}
        for req in requests:
            key = min(counts, key=lambda r: abs(r - req.resolution)) \
                if counts and req.resolution not in counts else req.resolution
            counts[key] = counts.get(key, 0) + 1
        step = self.predictor.predict(
            [counts[r] for r in self.predictor.resolutions])
        if self.cache.enabled and not full:
            step *= shallow_step_ratio(self.family, self.cache)
        return step

    def post_s(self, requests) -> float:
        by_res = {}
        for r in requests:
            by_res.setdefault(r.resolution, 0)
            by_res[r.resolution] += 1
        return sum(self.profile.post_latency_s(res, n)
                   for res, n in by_res.items())


def needs_full(requests, cache: CacheConfig) -> bool:
    """Mirror of pipelines/base.py _denoise_group_deep's mode choice."""
    if not cache.enabled:
        return True
    interval = max(cache.deep_interval, 1)
    return any(
        r.deep_state is None or r.deep_age >= interval - 1
        or r.sampler_table.step < cache.deep_warmup
        for r in requests)


class _DisplacedPar:
    """Stand-in ParallelConfig for the displaced admission gate."""

    def __init__(self, warmup: int):
        self.sp_mode = "displaced"
        self.displaced_warmup = warmup


# Displaced-SP step-cost factors (host-model estimates, not chip-measured:
# the stale-KV step skips the all-gather critical path — DistriFuser
# reports ~1.2-1.6x step speedups at 2-4 GPUs, reference
# distrifuser/utils.py:23-66; the sim only needs sync > stale for the
# admission-batching comparison to be meaningful).
DISP_SYNC_FACTOR = 1.0
DISP_STALE_FACTOR = 0.72


# Reference DistriFuser serving baseline — the curve the paper's figures
# beat (parsed as its own policy in reference scripts/draw/get_metric.py:
# 20-27,62-120; driven by distrifuser/{distribution,scalibility}.sh).
# Per-resolution dynamic-batch caps from reference distrifuser/utils.py:
# 21-66 (setup["max_bs"], identical across world sizes), with the serving
# loop's own cap of 12 (utils.py:205-206).  sd15 has no reference arm; the
# sdxl table shape is reused for comparability.
DISTRIFUSER_MAX_BS = {
    "sdxl": {512: 40, 768: 20, 1024: 12},
    "sd3": {512: 40, 768: 16, 1024: 8},
    "sd15": {256: 40, 512: 40, 768: 20},
}
DISTRIFUSER_WARMUP = 4  # DistriConfig(warmup_steps=4), utils.py:66-73


def simulate_distrifusion(family: str, rows, slo: int, predictor_path: str,
                          profile_path: str):
    """Run-to-completion dynamic batching on displaced-parallel pipelines
    (reference distrifuser/utils.py:126-211 RequestPool): one FIFO per
    resolution; each round serves the resolution whose OLDEST request
    arrived first, up to min(max_bs[res], 12) requests, and runs that batch
    prepare -> every step -> decode before re-reading arrivals.  No slack
    math, no aborts, no learned cache — DistriFuser's only step saving is
    displaced staleness (warmup_steps sync steps, then stale steps), which
    the same sync/stale factors as the displaced arm model."""
    cfg_overrides = None
    if profile_path and os.path.exists(profile_path):
        with open(profile_path) as f:
            cfg_overrides = json.load(f)
    profile = get_profile(family, slo_scale=float(slo),
                          overrides=cfg_overrides)
    truth_pred = (LatencyPredictor.load(predictor_path, profile)
                  if predictor_path and os.path.exists(predictor_path)
                  else LatencyPredictor(list(DEPLOYED_RES[family]), profile))
    cost = CostModel(family, truth_pred, profile, CacheConfig(enabled=False))
    max_bs = DISTRIFUSER_MAX_BS[family]

    order = sorted(range(len(rows)), key=lambda i: rows[i].arrival_ms)
    pending = [(rows[i].arrival_ms / 1000.0, rows[i]) for i in order]
    queues = {res: [] for res in DEPLOYED_RES[family]}
    t = 0.0
    records = []

    def deliver():
        while pending and pending[0][0] <= t:
            arr, row = pending.pop(0)
            queues.setdefault(row.resolution, []).append((arr, row))

    while True:
        deliver()
        live = {res: q for res, q in queues.items() if q}
        if not live:
            if not pending:
                break
            t = max(t, pending[0][0])
            continue
        res = min(live, key=lambda r: live[r][0][0])  # oldest head wins
        cap = min(max_bs.get(res, 12), 12)
        batch = queues[res][:cap]
        queues[res] = queues[res][cap:]
        reqs = [types.SimpleNamespace(resolution=res) for _ in batch]
        c = PREPARE_S[family]
        step_c = cost.denoise_s(reqs, full=True)
        for j in range(max(row.steps for _, row in batch)):
            c += step_c * (DISP_SYNC_FACTOR if j < DISTRIFUSER_WARMUP
                           else DISP_STALE_FACTOR)
        c += cost.post_s(reqs)
        t += c
        for k, (arr, row) in enumerate(batch):
            records.append(RequestRecord(f"df-{arr}-{k}", res, arr, t))

    m = compute_metrics(records, family, slo=slo)
    machine = compute_metrics(
        records, family, slo=slo,
        deadline_overrides={
            r: profile.e2e_ddl_s(r) / profile.slo_scale * 5.0
            for r in DEPLOYED_RES[family]})
    m["slo_attainment_machine"] = machine["slo_attainment"]
    m["goodput_machine_rps"] = machine["goodput_rps"]
    m["makespan_s"] = round(t, 1)
    return m, []


def simulate(family: str, policy_name: str, rows, slo: int,
             predictor_path: str, profile_path: str,
             max_batch: int = 8, cache_on: bool = True, seed: int = 0,
             collect_timeline: bool = False, displaced: bool = False,
             displaced_warmup: int = 4, displaced_defer: bool = True,
             cache_override=None, dp: int = 1):
    """Discrete-event serving sim; ``dp`` > 1 adds replica workers behind
    the REAL GreedyDispatch load balancer (Fig-14 scaling analog): each
    worker owns a pool + policy instance + busy-until time; arrivals are
    assigned by least pending pixels at delivery, and the earliest-free
    worker with work executes next."""
    from sduss_tpu.dispatcher import GreedyDispatch

    cfg = SchedulerConfig(policy=policy_name, max_batch_size=max_batch,
                          batch_buckets=(1, 2, 4, 8),
                          slo_scale=float(slo))  # policy targets the swept SLO
    if profile_path and os.path.exists(profile_path):
        with open(profile_path) as f:
            cfg.stage_latency_overrides = json.load(f)
    if predictor_path and os.path.exists(predictor_path):
        cfg.predictor_path = predictor_path

    cache = cache_override if cache_override is not None else (
        CacheConfig.production(family, serving=True) if cache_on
        else CacheConfig(enabled=False))

    profile = get_profile(family, slo_scale=float(slo),
                          overrides=cfg.stage_latency_overrides or None)
    truth_pred = (LatencyPredictor.load(predictor_path, profile)
                  if predictor_path and os.path.exists(predictor_path)
                  else LatencyPredictor(list(DEPLOYED_RES[family]), profile))
    cost = CostModel(family, truth_pred, profile, cache)

    # Virtual clock: the only wall-clock reader is the esymred module.
    clock = {"t": 0.0}
    import sduss_tpu.scheduler.esymred as es
    es.time = types.SimpleNamespace(time=lambda: clock["t"])

    workers = []
    for _ in range(dp):
        pol = get_policy(policy_name, cfg, family=family)
        pol.cache_config = cache
        if displaced and displaced_defer:
            pol.parallel_config = _DisplacedPar(displaced_warmup)
        workers.append({"pool": RequestPool(), "pol": pol, "free_at": 0.0,
                        "idle": 0, "disp_comp": None, "disp_steps": 0})
    dispatcher = GreedyDispatch()

    pending = sorted(range(len(rows)), key=lambda i: rows[i].arrival_ms)
    records, timeline = [], []
    disp_changes = 0

    def deliver_due():
        due = []
        while pending and rows[pending[0]].arrival_ms / 1000.0 <= clock["t"]:
            i = pending.pop(0)
            row = rows[i]
            r = Request(f"sim-{i}", SamplingParams(
                prompt=row.prompt, resolution=row.resolution,
                num_inference_steps=row.steps))
            r.arrival_time = row.arrival_ms / 1000.0
            r.stage = Stage.PREPARE
            due.append(r)
        if due:
            ranks = dispatcher.assign(
                due, [w["pool"].pending_pixels() for w in workers])
            for r, rank in zip(due, ranks):
                workers[rank]["pool"].add(r)

    while True:
        deliver_due()
        busy = [w for w in workers if w["pool"].unfinished() > 0]
        if not busy:
            if not pending:
                break
            clock["t"] = max(clock["t"],
                             rows[pending[0]].arrival_ms / 1000.0)
            continue
        w = min(busy, key=lambda w: w["free_at"])
        clock["t"] = max(clock["t"], w["free_at"])
        deliver_due()  # arrivals up to the worker's start time
        pool, pol = w["pool"], w["pol"]
        batch = pol.schedule(pool)
        if batch is None or batch.empty:
            w["idle"] += 1
            if w["idle"] > 10:
                if pending:
                    # quiesce until the next arrival
                    w["free_at"] = rows[pending[0]].arrival_ms / 1000.0
                    w["idle"] = 0
                    continue
                raise RuntimeError(
                    f"{policy_name}: pool stuck with {pool.unfinished()} "
                    f"unfinished requests and no schedulable batch")
            w["free_at"] = clock["t"] + 0.05
            continue
        w["idle"] = 0
        for r in batch.aborts:
            pool.remove(r.request_id)  # remove() indexes by current stage
            r.stage = Stage.ABORTED
            records.append(RequestRecord(r.request_id, r.resolution,
                                         r.arrival_time, clock["t"],
                                         aborted=True))
        if not batch.requests:
            continue
        bs = len(batch.requests)
        full = False
        if batch.stage is Stage.PREPARE:
            c = PREPARE_S[family]
            for r in batch.requests:
                pool.move(r, Stage.DENOISING)
                r.sampler_table = types.SimpleNamespace(step=0)
                r.remain_steps = r.params.num_inference_steps
                r.deep_state, r.deep_age = None, 0
        elif batch.stage is Stage.DENOISING:
            full = needs_full(batch.requests, cache)
            c = cost.denoise_s(batch.requests, full)
            if displaced:
                comp = tuple(sorted(r.request_id for r in batch.requests))
                if comp != w["disp_comp"]:
                    w["disp_comp"], w["disp_steps"] = comp, 0
                    disp_changes += 1
                c *= (DISP_SYNC_FACTOR if w["disp_steps"] < displaced_warmup
                      else DISP_STALE_FACTOR)
                w["disp_steps"] += 1
            pol.observe_step_time(batch.requests, c * 1000.0)
            for r in batch.requests:
                if r.start_denoising_time is None:
                    r.start_denoising_time = clock["t"]
                r.sampler_table.step += 1
                r.remain_steps -= 1
                if full:
                    r.deep_state, r.deep_age = object(), 0
                else:
                    r.deep_age += 1
                if r.remain_steps <= 0:
                    pool.move(r, Stage.POSTPROCESSING)
        else:
            c = cost.post_s(batch.requests)
            for r in batch.requests:
                pool.remove(r.request_id)  # before the stage flip
                r.stage = Stage.FINISHED
                records.append(RequestRecord(r.request_id, r.resolution,
                                             r.arrival_time, clock["t"] + c))
        if collect_timeline:
            timeline.append((round(clock["t"], 3), batch.stage.value, bs,
                             "full" if full else ""))
        w["free_at"] = clock["t"] + c
    clock["t"] = max([clock["t"]] + [w["free_at"] for w in workers])

    m = compute_metrics(records, family, slo=slo)
    # Machine-true SLO view (mirrors scripts/serving_probe.py:211-222): the
    # default table is the reference's H100 e2e deadlines; ALSO score
    # against this machine's profiled standalone latencies x scale — the
    # reference's own deadline construction (esymred_utils.py) and the
    # deadline the policy actually schedules toward, so it is the fair
    # axis for the POLICY comparison.
    machine = compute_metrics(
        records, family, slo=slo,
        deadline_overrides={
            r: profile.e2e_ddl_s(r) / profile.slo_scale * 5.0
            for r in DEPLOYED_RES[family]})
    m["slo_attainment_machine"] = machine["slo_attainment"]
    m["goodput_machine_rps"] = machine["goodput_rps"]
    m["makespan_s"] = round(clock["t"], 1)
    if displaced:
        m["displaced_composition_changes"] = disp_changes
        m["displaced_defer"] = displaced_defer
    return m, timeline


def main():
    ap = argparse.ArgumentParser("policy comparison matrix (host simulator)")
    ap.add_argument("--model", default="sdxl", choices=("sdxl", "sd3", "sd15"))
    ap.add_argument("--policies",
                    default="esymred,fcfs_mixed,orca_resbyres,distrifusion")
    ap.add_argument("--qps", default="")
    ap.add_argument("--num", type=int, default=500)
    ap.add_argument("--steps", type=int, default=0,
                    help="0 = family default (sdxl 50, sd3 40, sd15 50)")
    ap.add_argument("--slo", type=int, default=5)
    ap.add_argument("--distribution", default="uniform",
                    choices=("uniform", "small", "medium", "large"))
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--cache-off", action="store_true")
    ap.add_argument("--use-traces", action="store_true",
                    help="replay exp/{model}/qps_*.csv instead of "
                         "generating (reference trace files)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dp", type=int, default=1,
                    help="replica workers behind GreedyDispatch "
                         "(Fig-14 scaling analog)")
    ap.add_argument("--displaced", action="store_true",
                    help="displaced-SP cost model (sync/stale factors) + "
                         "the accumulate-then-admit gate")
    ap.add_argument("--out-dir", default="outputs/e2e")
    args = ap.parse_args()

    fam = args.model
    default_qps = {"sdxl": "0.8,0.9,1.0,1.1,1.2",
                   "sd3": "0.1,0.2,0.3,0.4,0.5",
                   "sd15": "1.0,2.0,3.0"}[fam]
    qps_list = [float(q) for q in (args.qps or default_qps).split(",")]
    policies = args.policies.split(",")
    steps = args.steps or {"sdxl": 50, "sd3": 40, "sd15": 50}[fam]
    os.makedirs(args.out_dir, exist_ok=True)

    predictor = f"exp/predictor_{fam}_v5e.npz"
    profile = f"exp/profile_{fam}_v5e.json"
    summary = []
    for qps in qps_list:
        trace_csv = f"exp/{fam}/qps_{qps}.csv"
        if args.use_traces and os.path.exists(trace_csv):
            rows = load_trace(trace_csv)[: args.num]
        else:
            rows = generate_trace(qps, args.num, DEPLOYED_RES[fam],
                                  distribution=args.distribution,
                                  steps=steps, seed=args.seed)
        for polname in policies:
            if polname == "distrifusion":
                m, _ = simulate_distrifusion(fam, rows, args.slo, predictor,
                                             profile)
            else:
                m, _ = simulate(fam, polname, rows, args.slo, predictor,
                                profile, max_batch=args.max_batch,
                                cache_on=not args.cache_off, seed=args.seed,
                                dp=args.dp, displaced=args.displaced)
            m.update(model=fam, policy=polname, qps=qps, num=args.num,
                     steps=steps, slo=args.slo,
                     distribution=args.distribution,
                     cache_on=not args.cache_off)
            tag = ""
            if args.distribution != "uniform":
                tag += f"_{args.distribution}"
            if args.slo != 5:
                tag += f"_slo{args.slo}"
            out = os.path.join(args.out_dir,
                               f"sim_{fam}_{polname}_{qps}{tag}.json")
            with open(out, "w") as f:
                json.dump(m, f, indent=1)
            summary.append(m)
            print(json.dumps({k: round(m[k], 4) if isinstance(m[k], float)
                              else m[k] for k in
                              ("model", "policy", "qps", "slo_attainment",
                               "slo_attainment_machine", "goodput_rps",
                               "goodput_machine_rps", "throughput_rps",
                               "abort_rate", "p99_latency_s")}), flush=True)
    tag = ("" if args.distribution == "uniform" else f"_{args.distribution}") \
        + ("" if args.slo == 5 else f"_slo{args.slo}")
    # MERGE into any existing summary keyed by (policy, qps, num): a
    # partial rerun must not clobber the full-sweep records (a 30-request
    # smoke run once overwrote the committed 500-request sdxl summary —
    # review r3 finding).
    spath = os.path.join(args.out_dir, f"sim_{fam}_summary{tag}.json")
    merged = {}
    if os.path.exists(spath):
        with open(spath) as f:
            for r in json.load(f):
                merged[(r["policy"], r["qps"], r.get("num"))] = r
    for r in summary:
        merged[(r["policy"], r["qps"], r.get("num"))] = r
    with open(spath, "w") as f:
        json.dump(sorted(merged.values(),
                         key=lambda r: (r["qps"], r["policy"])), f, indent=1)


if __name__ == "__main__":
    main()
