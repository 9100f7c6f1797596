"""Serving-level measurement on the real chip (round-1 verdict item 3).

One warm AsyncEngine serves a warmup pass (absorbs the relay's one-time
costs: param placement, per-jit-key compiles/loads) and then measured QPS
passes, all in ONE process so the in-process jit caches stay hot.  Reports
p50/p99 latency, goodput, throughput, abort rate per QPS point, plus a
direct warm-step probe (the denoise-step latency the engine adds ~nothing
to, per round-1's measurement), and sustained img/s/chip under load — the
north-star comparison against the reference's serving numbers
(BASELINE.md: beat 0.45 img/s/chip at equal p99).

Caveats documented in the output: arrival times can be time-scaled
(--time-scale) and step counts reduced (--steps) to bound chip time; both
scalings are recorded.

    python scripts/serving_probe.py --qps 0.2,0.3,0.4 --num 16 --steps 30 \
        --deep-interval 3 --out exp/serving_sdxl_v5e_r2.json
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


async def _run(args):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from sduss_tpu.benchmark.metrics import compute_metrics
    from sduss_tpu.benchmark.replay import replay
    from sduss_tpu.benchmark.traces import generate_trace
    from sduss_tpu.config import Config, ModelConfig
    from sduss_tpu.engine.async_engine import AsyncEngine

    config = Config()
    config.model = ModelConfig(model=args.model, dtype="bfloat16",
                               test_tiny=args.tiny)
    if args.tiny:
        config.model.dtype = "float32"
    config.scheduler.policy = args.policy
    if args.predictor and os.path.exists(args.predictor):
        config.scheduler.predictor_path = args.predictor
    if args.profile and os.path.exists(args.profile):
        with open(args.profile) as f:
            config.scheduler.stage_latency_overrides = json.load(f)
    if args.deep_interval:
        config.cache.enabled = True
        config.cache.mode = "deep"
        config.cache.deep_interval = args.deep_interval

    resolutions = tuple(int(r) for r in args.resolutions.split(","))
    engine = AsyncEngine(config)
    out: dict = {
        "config": (f"{args.model} {resolutions} x{args.num} reqs/pass, "
                   f"{args.steps} steps, policy {args.policy}, "
                   f"deep_interval {args.deep_interval}, one v5e chip via "
                   "axon relay"),
        "scaling": {"time_scale": args.time_scale, "steps": args.steps,
                    "note": "arrivals time-scaled / steps reduced to bound "
                            "chip time; img/s normalized to 30 steps"},
        "passes": {},
    }
    try:
        # -- warmup pass: absorb placement + compiles/loads ------------------
        t0 = time.time()
        rows = generate_trace(2.0, args.warmup, resolutions, "uniform",
                              steps=args.steps, seed=123)
        await replay(engine, rows, config.model.family, slo=100,
                     time_scale=args.time_scale)
        out["warmup_s"] = round(time.time() - t0, 1)
        print(f"# warmup {args.warmup} reqs done in {out['warmup_s']}s",
              flush=True)

        # -- direct warm step probe -----------------------------------------
        pipe = engine.engine.workers[0].pipeline
        from sduss_tpu.request import Request, SamplingParams, Stage

        probe_reqs = [
            Request(f"probe-{i}", SamplingParams(
                prompt="probe", resolution=max(resolutions),
                num_inference_steps=8, seed=i))
            for i in range(args.probe_batch)]
        pipe.prepare(probe_reqs)
        for r in probe_reqs:
            r.stage = Stage.DENOISING
        by_res = {max(resolutions): probe_reqs}
        step = (pipe.denoise_step_mixed
                if config.scheduler.use_mixed_resolution else pipe.denoise_step)
        step(by_res)
        np.asarray(probe_reqs[0].latents)  # force
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            step(by_res)
            np.asarray(probe_reqs[0].latents)
            times.append(time.perf_counter() - t0)
        out["warm_step_ms"] = round(float(np.median(times)) * 1e3, 1)
        print(f"# warm {args.probe_batch}x{max(resolutions)} step: "
              f"{out['warm_step_ms']} ms", flush=True)

        # -- measured passes -------------------------------------------------
        for qps in [float(q) for q in args.qps.split(",")]:
            rows = generate_trace(qps, args.num, resolutions, "uniform",
                                  steps=args.steps, seed=int(qps * 100))
            t0 = time.time()
            records = await replay(engine, rows, config.model.family,
                                   slo=args.slo, time_scale=args.time_scale)
            span = time.time() - t0
            m = compute_metrics(records, config.model.family, slo=args.slo)
            done = sum(1 for r in records if not r.aborted)
            m["img_s_chip_30step"] = round(done / span * args.steps / 30.0, 4)
            m["makespan_s"] = round(span, 1)
            out["passes"][f"qps_{qps}"] = m
            print(f"# qps {qps}: {json.dumps(m)}", flush=True)
    finally:
        await engine.stop()
    return out


def main():
    ap = argparse.ArgumentParser("serving probe")
    ap.add_argument("--model", default="sdxl")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CPU validation run (no real numbers)")
    ap.add_argument("--resolutions", default="1024")
    ap.add_argument("--policy", default="esymred")
    ap.add_argument("--qps", default="0.2,0.3,0.4")
    ap.add_argument("--num", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--slo", type=int, default=5)
    ap.add_argument("--probe-batch", type=int, default=8)
    ap.add_argument("--time-scale", type=float, default=1.0)
    ap.add_argument("--deep-interval", type=int, default=3)
    ap.add_argument("--predictor", default="exp/predictor_sdxl_v5e.npz")
    ap.add_argument("--profile", default="exp/profile_sdxl_v5e.json")
    ap.add_argument("--out", default="exp/serving_sdxl_v5e_r2.json")
    args = ap.parse_args()

    out = asyncio.run(_run(args))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
