"""Trace replay driver: the primary serving benchmark.

Rebuild of the reference's direct-test harness
(tests/server/direct_test.py:56-100): replays a Poisson trace against an
in-process AsyncEngine as asyncio coroutines, records per-request results
and reports the paper's SLO metrics (scripts/draw/get_metric.py).

CLI::

    python -m sduss_tpu.benchmark.replay --model sdxl --qps 1.0 \
        --num-requests 100 --policy esymred --slo 5 --out client.csv
"""

from __future__ import annotations

import argparse
import asyncio
import time
from typing import List, Optional, Sequence

from sduss_tpu.benchmark.metrics import (RequestRecord, compute_metrics,
                                         records_to_csv, slo_deadline_s)
from sduss_tpu.benchmark.traces import TraceRow, generate_trace
from sduss_tpu.config import Config
from sduss_tpu.logger import init_logger
from sduss_tpu.request import SamplingParams

logger = init_logger(__name__)


async def replay(engine, rows: Sequence[TraceRow], family: str, slo: int = 5,
                 time_scale: float = 1.0) -> List[RequestRecord]:
    """Replay a trace; returns one record per request (incl. aborted)."""
    start = time.time()
    records: List[RequestRecord] = []

    async def one(i: int, row: TraceRow):
        target = start + row.arrival_ms / 1000.0 * time_scale
        delay = target - time.time()
        if delay > 0:
            await asyncio.sleep(delay)
        arrival = time.time()
        deadline = arrival + slo_deadline_s(family, row.resolution, slo)
        params = SamplingParams(prompt=row.prompt, resolution=row.resolution,
                                num_inference_steps=row.steps, seed=i)
        out = await engine.generate(params, request_id=f"replay-{i}",
                                    deadline=deadline)
        records.append(RequestRecord(
            out.request_id, row.resolution, arrival, time.time(),
            aborted=out.aborted))

    await asyncio.gather(*(one(i, r) for i, r in enumerate(rows)))
    return records


def run_replay(config: Config, rows: Sequence[TraceRow], slo: int = 5,
               time_scale: float = 1.0, prewarm: bool = True) -> List[RequestRecord]:
    from sduss_tpu.engine.async_engine import AsyncEngine

    async def main():
        engine = AsyncEngine(config)
        try:
            if prewarm:
                # compile-warm every (res x bucket x mode) key the trace can
                # hit BEFORE timing starts — a cold XLA key mid-replay stalls
                # the batch for the compile and poisons the latency metrics
                # (the round-1 serving pathology; Engine.prewarm docstring)
                res = sorted({r.resolution for r in rows})
                engine.engine.prewarm(resolutions=res)
            return await replay(engine, rows, config.model.family, slo,
                                time_scale)
        finally:
            await engine.stop()

    return asyncio.run(main())


def main(argv: Optional[List[str]] = None) -> dict:  # pragma: no cover
    ap = argparse.ArgumentParser("sduss_tpu trace replay")
    ap.add_argument("--model", default="sdxl")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--resolutions", default="",
                    help="comma list overriding the family's deployed "
                         "resolutions (tiny CPU runs of the driver)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--qps", type=float, default=1.0)
    ap.add_argument("--num-requests", type=int, default=100)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--distribution", default="uniform")
    ap.add_argument("--policy", default="esymred")
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--slo", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trace", default=None,
                    help="replay a saved trace CSV (exp/*/qps_*.csv) instead "
                         "of generating one")
    ap.add_argument("--out", default=None)
    # learned artifacts (the reference wires these via env vars in
    # scripts/paper/e2e.sh:50-55; here they are explicit flags)
    ap.add_argument("--predictor", default=None,
                    help="LatencyPredictor npz (scheduler/profiler.py)")
    ap.add_argument("--profile", default=None,
                    help="StageProfile JSON (scheduler/profiler.py)")
    ap.add_argument("--classifiers", default=None,
                    help="cache classifier npz (cache/train.py); enables "
                         "the block cache")
    ap.add_argument("--cache-mode", default="compact",
                    choices=("block", "compact", "deep"))
    ap.add_argument("--compact-fraction", type=float, default=0.5)
    ap.add_argument("--deep-interval", type=int, default=0,
                    help="enable temporal deep-block reuse at this interval "
                         "(the headline bench's cache; no classifiers needed)")
    ap.add_argument("--no-prewarm", dest="prewarm", action="store_false",
                    default=True,
                    help="skip compile-warming the step programs before the "
                         "timed replay (cold keys poison latency metrics)")
    args = ap.parse_args(argv)

    from sduss_tpu.config import ModelConfig

    config = Config()
    config.model = ModelConfig(
        model=args.model, test_tiny=args.tiny, dtype=args.dtype,
        resolutions=tuple(int(r) for r in args.resolutions.split(","))
        if args.resolutions else ())
    config.scheduler.policy = args.policy
    config.scheduler.slo_scale = float(args.slo)
    config.parallel.dp = args.dp
    if args.predictor:
        config.scheduler.predictor_path = args.predictor
    if args.profile:
        import json as _json

        with open(args.profile) as f:
            config.scheduler.stage_latency_overrides = _json.load(f)
    if args.classifiers:
        config.cache.enabled = True
        config.cache.mode = args.cache_mode
        config.cache.compact_fraction = args.compact_fraction
        config.cache.classifier_path = args.classifiers
    if args.deep_interval:
        config.cache.enabled = True
        config.cache.mode = "deep"
        config.cache.deep_interval = args.deep_interval

    if args.trace:
        from sduss_tpu.benchmark.traces import load_trace

        rows = load_trace(args.trace)[: args.num_requests]
    else:
        rows = generate_trace(args.qps, args.num_requests,
                              config.model.resolutions, args.distribution,
                              steps=args.steps, seed=args.seed)
    records = run_replay(config, rows, slo=args.slo, prewarm=args.prewarm)
    metrics = compute_metrics(records, config.model.family, slo=args.slo)
    if args.out:
        records_to_csv(records, args.out)
    import json

    print(json.dumps(metrics, indent=2))
    return metrics


if __name__ == "__main__":  # pragma: no cover
    main()
