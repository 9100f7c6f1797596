"""Per-mode serving-step microbench: times the dense deep-path programs
(full / shallow / partial kb=1) back-to-back on ONE warmed composition,
isolating each mode by forcing its trigger before every step.

Why: pass-level serving numbers mix modes, admissions, and engine effects;
attributing a regression (e.g. the r4d leg-1 hybrid partial at ~790 ms
effective vs the ~340 expected from shallow+tail) needs the per-program
dispatched cost measured directly.

    python scripts/bench_step_modes.py --model sdxl --res 1024 --batch 8 \
        --deep-interval 24 --deep-boundary 1 [--deep-hybrid 0.3] \
        --out exp/bench_step_modes_sdxl_v5e.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser("per-mode serving step microbench")
    ap.add_argument("--model", default="sdxl")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=16,
                    help="timed steps per mode")
    ap.add_argument("--deep-interval", type=int, default=24)
    ap.add_argument("--deep-boundary", type=int, default=1)
    ap.add_argument("--deep-hybrid", type=float, default=0.0)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from sduss_tpu.config import CacheConfig, Config, ModelConfig, \
        SchedulerConfig
    from sduss_tpu.pipelines import build_pipeline
    from sduss_tpu.request import Request, SamplingParams, Stage

    config = Config()
    config.model = ModelConfig(model=args.model, dtype="bfloat16",
                               test_tiny=args.tiny)
    if args.tiny:
        config.model.dtype = "float32"
    config.scheduler = SchedulerConfig(use_mixed_resolution=False)
    cc = CacheConfig(enabled=True, mode="deep",
                     deep_interval=args.deep_interval, deep_warmup=1,
                     deep_boundary=args.deep_boundary or None,
                     deep_row_warmup=True)
    if args.deep_hybrid > 0:
        cc.deep_compact_fraction = args.deep_hybrid
    config.cache = cc
    pipe = build_pipeline(config)

    n_total = 4 + 3 * (args.steps + 4)
    reqs = [Request(f"m{i}", SamplingParams(
                prompt="x", resolution=args.res,
                num_inference_steps=n_total, seed=i))
            for i in range(args.batch)]
    pipe.prepare(reqs)
    for r in reqs:
        r.stage = Stage.DENOISING
    by_res = {args.res: reqs}

    def force(mode, j):
        if mode == "full":
            for r in reqs:
                r.deep_age = 10 ** 6
        elif mode == "shallow":
            for r in reqs:
                r.deep_age = 0
        elif mode == "partial":
            for r in reqs:
                r.deep_age = 0
            reqs[j % len(reqs)].deep_state = None

    report = {"config": vars(args).copy()}
    # mint every key: warmup fulls + one of each forced mode
    for _ in range(2):
        pipe.denoise_step(by_res)
    for mode in ("shallow", "partial", "full"):
        force(mode, 0)
        pipe.denoise_step(by_res)
    np.asarray(reqs[0].latents)

    for mode in ("shallow", "partial", "full"):
        force(mode, 0)
        pipe.denoise_step(by_res)  # settle into the mode
        np.asarray(reqs[0].latents)
        t0 = time.perf_counter()
        for j in range(args.steps):
            force(mode, j)
            pipe.denoise_step(by_res)
        np.asarray(reqs[0].latents)
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        report[f"{mode}_ms"] = round(ms, 1)
        print(f"# {mode}: {ms:.1f} ms/step", flush=True)

    out = args.out or f"exp/bench_step_modes_{args.model}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "config"}))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
