"""Host-only serving simulation: the REAL policy against chip-true timings.

Separates scheduling pathology from relay measurement overhead: drives
ESyMReDPolicy (with the fitted on-chip predictor + profile) through a
virtual clock where each denoise step costs what the chip measured
(deep-cache full/shallow modes modeled like pipelines/base.py
_denoise_group_deep), and reports per-request latencies + the schedule
timeline.  No jax, no devices — pure host, runs in milliseconds, so
admission policies can be studied at any load.

    python scripts/sim_serving.py --qps 0.25 --num 14 --deep-interval 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sduss_tpu.config import CacheConfig, SchedulerConfig
from sduss_tpu.request import Request, SamplingParams, Stage
from sduss_tpu.scheduler.policies import get_policy
from sduss_tpu.scheduler.request_pool import RequestPool

# Measured v5e step costs (exp/serving_sdxl_v5e_r2.json warm probe + bench):
# dense full pass at b8 ~ 830 ms; deep-3 steady (1 full + 2 shallow) avg
# 518 ms => shallow ~ 360 ms.  Per-batch-size scaling from the fitted
# profile's marginal-cost shape.
FULL_B8_S = 0.83
SHALLOW_B8_S = 0.36
PREPARE_S = 0.35      # text encode + latent init, bucket-amortized
POST_PER_IMG_S = 0.40  # VAE decode 1024 + fetch


def step_cost(bs: int, full: bool) -> float:
    # marginal cost ~ linear in batch rows with a fixed overhead floor
    base = FULL_B8_S if full else SHALLOW_B8_S
    return base * (0.25 + 0.75 * bs / 8.0)


def main():
    ap = argparse.ArgumentParser("serving simulation")
    ap.add_argument("--qps", type=float, default=0.25)
    ap.add_argument("--num", type=int, default=14)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--deep-interval", type=int, default=3)
    ap.add_argument("--deep-warmup", type=int, default=3)
    ap.add_argument("--mirror-horizon", type=int, default=6,
                    help="deep_max_interval the ESyMReD admission mirror "
                         "assumes under adaptive replay (a big horizon "
                         "over-defers admissions)")
    ap.add_argument("--adaptive-pattern", default="",
                    help="path:threshold into a cache_quality artifact "
                         "(e.g. exp/cache_quality_sdxl_adaptive_tiny.json:"
                         "0.1) — replay that measured adaptive refresh "
                         "pattern per request instead of the fixed "
                         "interval (serving-level projection of "
                         "CacheConfig.deep_adaptive)")
    ap.add_argument("--phase-admission", type=int, default=1)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--predictor", default="exp/predictor_sdxl_v5e.npz")
    ap.add_argument("--profile", default="exp/profile_sdxl_v5e.json")
    ap.add_argument("--seed", type=int, default=25)
    ap.add_argument("--trace", action="store_true",
                    help="print the schedule timeline")
    args = ap.parse_args()

    cfg = SchedulerConfig(policy="esymred", max_batch_size=args.max_batch,
                          batch_buckets=(2, 4, 8))
    if os.path.exists(args.profile):
        with open(args.profile) as f:
            cfg.stage_latency_overrides = json.load(f)
    if os.path.exists(args.predictor):
        cfg.predictor_path = args.predictor
    pattern = None
    if args.adaptive_pattern:
        path, thr = args.adaptive_pattern.rsplit(":", 1)
        with open(path) as f:
            art = json.load(f)
        rows = [c for c in art["configs"] if c["kind"] == "deep_adaptive"
                and abs(c["param"] - float(thr)) < 1e-9]
        if not rows or "full_pattern" not in rows[0]:
            raise SystemExit(f"no full_pattern for threshold {thr} in {path}")
        pattern = rows[0]["full_pattern"]
        if len(pattern) < args.steps:
            raise SystemExit("pattern shorter than --steps")

    pol = get_policy("esymred", cfg, family="sdxl")
    pol.cache_config = CacheConfig(
        enabled=args.deep_interval > 1 or pattern is not None, mode="deep",
        deep_interval=args.deep_interval, deep_warmup=args.deep_warmup,
        deep_adaptive=pattern is not None,
        deep_max_interval=args.mirror_horizon,
        phase_admission=bool(args.phase_admission))

    import numpy as np

    rng = np.random.default_rng(args.seed)
    gaps = rng.exponential(1.0 / args.qps, args.num)
    arrivals = np.cumsum(gaps)

    # Virtual clock: monkeypatch time.time used by the policy module.
    clock = {"t": 0.0}
    import sduss_tpu.scheduler.esymred as es

    es.time = types.SimpleNamespace(time=lambda: clock["t"])

    pool = RequestPool()
    pending = list(range(args.num))
    done, timeline = [], []

    while pending or pool.pending_pixels() > 0 or any(
            pool.in_stage(s) for s in
            (Stage.PREPARE, Stage.DENOISING, Stage.POSTPROCESSING)):
        # deliver arrivals up to now
        while pending and arrivals[pending[0]] <= clock["t"]:
            i = pending.pop(0)
            r = Request(f"sim-{i}", SamplingParams(
                prompt="x", resolution=1024,
                num_inference_steps=args.steps))
            r.arrival_time = arrivals[i]
            r.stage = Stage.PREPARE
            pool.add(r)
        batch = pol.schedule(pool)
        if batch is None or (not batch.requests and not batch.aborts):
            # idle: jump to next arrival
            if pending:
                clock["t"] = max(clock["t"], arrivals[pending[0]])
                continue
            break
        for r in batch.aborts:
            r.stage = Stage.ABORTED
            pool.remove(r.request_id)
            done.append((r, clock["t"] - r.arrival_time, True))
        if not batch.requests:
            continue
        bs = len(batch.requests)
        if batch.stage is Stage.PREPARE:
            cost = PREPARE_S
            for r in batch.requests:
                pool.move(r, Stage.DENOISING)
                # mimic prepare(): sampler bookkeeping the policy reads
                r.sampler_table = types.SimpleNamespace(step=0)
                r.remain_steps = args.steps
                r.deep_state = None
                r.deep_age = 0
        elif batch.stage is Stage.DENOISING:
            # mode like _denoise_group_deep: full iff any member needs it
            if pattern is not None:
                # replay the measured adaptive refresh pattern per request
                # (drift depends on trajectory step, so each request indexes
                # the pattern at its own step; batch full = any member)
                full = any(
                    r.deep_state is None
                    or bool(pattern[min(r.sampler_table.step,
                                        len(pattern) - 1)])
                    for r in batch.requests)
            else:
                interval = max(args.deep_interval, 1)
                full = any(
                    r.deep_state is None or r.deep_age >= interval - 1
                    or r.sampler_table.step < args.deep_warmup
                    for r in batch.requests)
            cost = step_cost(bs, full)
            for r in batch.requests:
                if r.start_denoising_time is None:
                    r.start_denoising_time = clock["t"]
                r.sampler_table.step += 1
                r.remain_steps -= 1
                if full:
                    r.deep_state = object()
                    r.deep_age = 0
                else:
                    r.deep_age += 1
                if r.remain_steps <= 0:
                    pool.move(r, Stage.POSTPROCESSING)
        else:  # POSTPROCESSING
            cost = POST_PER_IMG_S * bs
            for r in batch.requests:
                pool.remove(r.request_id)
                r.stage = Stage.FINISHED
                done.append((r, clock["t"] + cost - r.arrival_time, False))
        timeline.append((clock["t"], batch.stage.value, bs,
                         "full" if batch.stage is Stage.DENOISING and full
                         else ""))
        clock["t"] += cost

    lats = sorted(lat for _, lat, ab in done if not ab)
    aborted = sum(1 for _, _, ab in done if ab)
    if args.trace:
        for t, stage, bs, mode in timeline:
            print(f"  t={t:8.2f} {stage:<14s} bs={bs} {mode}")
    den = [(t, m) for t, stage, _, m in timeline if stage == "denoising"]
    out = {
        "qps": args.qps, "num": args.num, "aborted": aborted,
        "p50_latency_s": round(lats[len(lats) // 2], 2) if lats else None,
        "max_latency_s": round(lats[-1], 2) if lats else None,
        "makespan_s": round(clock["t"] - arrivals[0], 1),
        "img_per_s": round(len(lats) / max(clock["t"] - arrivals[0], 1e-9), 4),
        "full_step_share": (round(sum(1 for _, m in den if m == "full")
                                  / len(den), 3) if den else None),
        "phase_admission": bool(args.phase_admission),
        "adaptive_pattern": args.adaptive_pattern or None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
