"""On-device profiler: regenerate stage latencies + the latency predictor.

The reference ships H100-only profiles (exp/profile/*.csv, esymred.json) and
an H100-trained joblib SVR (exp/schedule_predictor_*.pkl) that the ESyMReD
policy loads at startup (reference ESyMReD.py:20-66, 105-119).  None of that
transfers to TPU, so this module measures machine-true numbers natively:

* per-step denoiser latency across resolution-count mixtures (the predictor's
  training set);
* standalone 50-step denoise + VAE decode latencies per resolution (the SLO
  deadline anchors);
* batched VAE decode latency per batch size (post-stage admission table).

Run on the serving chip::

    python -m sduss_tpu.scheduler.profiler --family sdxl --tiny \
        --out-profile profile.json --out-predictor predictor.npz

Writes a StageProfile JSON (SchedulerConfig.stage_latency_overrides) and a
fitted LatencyPredictor npz (SchedulerConfig.predictor_path).
"""

from __future__ import annotations

import argparse

import json
import time
from typing import Dict, List, Sequence, Tuple

import numpy as np


def _sync(x) -> None:
    """Wait for device completion by fetching FOUR BYTES, not the tensor.

    Through the axon relay a full fetch moves ~50 MB/s — syncing on a whole
    latents array added ~2-10 ms of tunnel time INSIDE every timed step and
    biased the profile (CLAUDE.md measurement rule; same pattern as
    engine/worker.py _throttle).  TPU programs complete whole-array, so any
    one element observes the producing step's completion.
    """
    leaf = jax_leaves(x)[0]
    idx = (0,) * max(leaf.ndim - 1, 0) + (slice(0, 1),) if leaf.ndim else ()
    np.asarray(leaf[idx] if leaf.ndim else leaf)


def jax_leaves(x):
    import jax

    return [l for l in jax.tree.leaves(x) if hasattr(l, "shape")]


class Profiler:
    def __init__(self, family: str, tiny: bool = False, dtype: str = "bfloat16",
                 resolutions: Sequence[int] = (), encoders_on_host: bool = False,
                 isolate: str = "none"):
        from sduss_tpu.config import Config, ModelConfig

        config = Config()
        config.model = ModelConfig(model=family, test_tiny=tiny, dtype=dtype,
                                   encoders_on_host=encoders_on_host)
        self.config = config
        self.family = family
        self.tiny = tiny
        self.dtype = dtype
        self.encoders_on_host = encoders_on_host
        # "none" | "post" | "all": which measurements run in a one-shot
        # subprocess.  A ResourceExhausted during a measurement through the
        # dev relay poisons the device for every subsequent fetch in the
        # same process (round-1 SD3 failure mode); isolation contains the
        # blast radius to the failing point at the cost of re-placing
        # params per subprocess.  NOTE on the single-slot axon dev relay,
        # use "all" (the parent then never initializes jax and each child
        # owns the chip alone); "post" keeps the parent on-device while
        # children dial in, which only works on real locally-attached TPUs.
        self.isolate = isolate
        self._pipe = None
        self.resolutions = list(resolutions) or list(config.model.resolutions)

    @property
    def pipe(self):
        if self._pipe is None:
            from sduss_tpu.pipelines import build_pipeline

            self._pipe = build_pipeline(self.config)
        return self._pipe

    def _measure_sub(self, spec: dict) -> float:
        """Run one measurement in a fresh subprocess; returns the value."""
        import subprocess
        import sys

        spec = dict(spec, family=self.family, tiny=self.tiny, dtype=self.dtype,
                    encoders_on_host=self.encoders_on_host)
        r = subprocess.run(
            [sys.executable, "-m", "sduss_tpu.scheduler.profiler",
             "--measure-one", json.dumps(spec)],
            capture_output=True, text=True)
        for line in reversed(r.stdout.splitlines()):
            if line.startswith("{"):
                out = json.loads(line)
                if out.get("ok"):
                    return float(out["value"])
                raise RuntimeError(f"measurement failed: {out.get('error')}")
        raise RuntimeError(
            f"measurement subprocess rc={r.returncode}: {r.stderr[-2000:]}")

    def _measure_group(self, specs: List[dict]) -> List:
        """Run a LIST of measurements in ONE subprocess (param placement and
        the CPU-hosted text encode are paid once per group, not per point).
        Returns one value or None per spec; a mid-group failure (e.g. OOM)
        yields None for that and typically the remaining points of the
        group, without poisoning other groups."""
        import subprocess
        import sys

        payload = [dict(s, family=self.family, tiny=self.tiny,
                        dtype=self.dtype,
                        encoders_on_host=self.encoders_on_host)
                   for s in specs]
        r = subprocess.run(
            [sys.executable, "-u", "-m", "sduss_tpu.scheduler.profiler",
             "--measure-many", json.dumps(payload)],
            capture_output=True, text=True)
        vals: List = [None] * len(specs)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                try:
                    out = json.loads(line)
                except ValueError:
                    continue
                if "i" in out:
                    vals[out["i"]] = out["value"] if out.get("ok") else None
                    if not out.get("ok"):
                        print(f"  group point {out['i']}: "
                              f"{out.get('error', '?')[:200]}", flush=True)
        if all(v is None for v in vals):
            print(f"group subprocess produced no values "
                  f"(rc={r.returncode}): {r.stderr[-1500:]}", flush=True)
        return vals

    def profile_grouped(self, max_post_batch: int = 8):
        """Grouped-isolation flow: ONE subprocess for every denoise-step mix
        (predictor training set + profile singles), one subprocess per
        resolution's VAE-decode table (the OOM-prone part stays contained).
        Returns (profile_dict, mix_rows, mix_seconds)."""
        res = sorted(self.resolutions)
        mixes: List[Dict[int, int]] = [{r: 1} for r in res]
        mixes += [{r: 2} for r in res]
        if len(res) >= 2:
            mixes.append({res[0]: 1, res[-1]: 1})
            mixes.append({res[0]: 2, res[-1]: 2})
        if len(res) >= 3:
            mixes.append({r: 1 for r in res})
        maxb = self.config.scheduler.max_batch_size
        mixes = [m for m in mixes if sum(m.values()) <= maxb]
        specs = [{"kind": "step", "counts": {str(k): v for k, v in m.items()},
                  "iters": 3} for m in mixes]
        print(f"step group: {len(specs)} mixes", flush=True)
        step_vals = self._measure_group(specs)

        pts = [b for b in (1, 2, 4, 8) if b <= max_post_batch]
        post_meas: Dict[int, Dict[int, float]] = {}
        for r in res:
            print(f"post group: res {r}", flush=True)
            vals = self._measure_group(
                [{"kind": "post", "res": r, "batch": b, "iters": 3}
                 for b in pts])
            post_meas[r] = {b: v for b, v in zip(pts, vals) if v is not None}

        # assemble the StageProfile
        standalone_d, standalone_p, step_lat, post_tbl = {}, {}, {}, {}
        for r in res:
            v = step_vals[mixes.index({r: 1})]
            if v is None:
                raise RuntimeError(f"step mix {{{r}:1}} failed; no profile")
            step_lat[str(r)] = v
            standalone_d[str(r)] = v * 50.0
            meas = post_meas[r]
            if not meas:
                raise RuntimeError(f"all post points failed at res {r}")
            ok = sorted(meas)
            per_img = meas[ok[-1]] / ok[-1]
            tbl = list(np.interp(np.arange(1, max_post_batch + 1), ok,
                                 [meas[b] for b in ok]))
            for i in range(ok[-1], max_post_batch):
                tbl[i] = tbl[ok[-1] - 1] + per_img * (i + 1 - ok[-1])
            post_tbl[str(r)] = [float(x) for x in tbl]
            standalone_p[str(r)] = tbl[0]
        profile = {
            "family": self.family,
            "standalone": {"denoising": standalone_d,
                           "postprocessing": standalone_p},
            "step_latency": step_lat,
            "post_batch_latency": post_tbl,
        }
        rows = [[m.get(r, 0) for r in res]
                for m, v in zip(mixes, step_vals) if v is not None]
        ys = [v for v in step_vals if v is not None]
        return profile, rows, ys

    # -- measurement ----------------------------------------------------------

    def _make_reqs(self, counts: Dict[int, int], steps: int = 8):
        from sduss_tpu.request import Request, SamplingParams, Stage

        reqs = []
        i = 0
        for res, c in counts.items():
            for _ in range(c):
                r = Request(f"prof-{res}-{i}", SamplingParams(
                    prompt="profile", resolution=res,
                    num_inference_steps=steps, seed=i))
                reqs.append(r)
                i += 1
        self.pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        return reqs

    def step_latency(self, counts: Dict[int, int], iters: int = 5) -> float:
        """Median per-step seconds for one denoiser step at this mix."""
        if self.isolate == "all":
            return self._measure_sub(
                {"kind": "step", "counts": {str(k): v for k, v in counts.items()},
                 "iters": iters})
        return self._step_latency_local(counts, iters)

    def _step_latency_local(self, counts: Dict[int, int], iters: int = 5) -> float:
        reqs = self._make_reqs(counts, steps=iters + 3)
        by_res: Dict[int, list] = {}
        for r in reqs:
            by_res.setdefault(r.resolution, []).append(r)
        # Route like the worker (engine/worker.py:101-105): the patched path
        # only for ACTUAL mixes — uniform compositions run dense in
        # production, and profiling them through the patch path overstated
        # singleton steps ~1.8x (the round-1 "768-singleton ~= 1024" anomaly
        # was this: a 768 singleton pays 12-patch padding + grouped-attention
        # masking the dense path never sees).
        run = (self.pipe.denoise_step_mixed
               if len(by_res) > 1 and self.config.scheduler.use_mixed_resolution
               else self.pipe.denoise_step)
        run(by_res)  # compile
        run(by_res)  # warm
        _sync([r.latents for r in reqs])
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run(by_res)
            _sync([r.latents for r in reqs])
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    def post_latency(self, res: int, batch: int, iters: int = 3) -> float:
        if self.isolate in ("post", "all"):
            return self._measure_sub(
                {"kind": "post", "res": res, "batch": batch, "iters": iters})
        return self._post_latency_local(res, batch, iters)

    def _post_latency_local(self, res: int, batch: int, iters: int = 3) -> float:
        reqs = self._make_reqs({res: batch}, steps=2)
        by_res = {res: reqs}
        self.pipe.postprocess(by_res)  # compile (+ sync: postprocess is host-blocking)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            self.pipe.postprocess(by_res)
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    # -- products ---------------------------------------------------------------

    def build_profile(self, max_post_batch: int = 8) -> dict:
        standalone_d, standalone_p, step_lat = {}, {}, {}
        post_tbl = {}
        for res in self.resolutions:
            s = self.step_latency({res: 1})
            step_lat[str(res)] = s
            standalone_d[str(res)] = s * 50.0
            # measure power-of-two batch points, interpolate between (each
            # decode batch shape is its own compile through the dev relay).
            # Full-res decode activations are the pipeline's HBM peak
            # (SD3 1024^2 at batch 8 ResourceExhausts a v5e); batch points
            # that do not fit are extrapolated from those that do — the
            # serving path chunks decodes anyway (SchedulerConfig
            # decode_batch).
            pts = sorted({b for b in (1, 2, 4, 8) if b <= max_post_batch})
            meas = {}
            for b in pts:
                try:
                    meas[b] = self.post_latency(res, b)
                except Exception as e:  # ResourceExhausted at HBM peak
                    print(f"post {res} b{b}: skipped ({type(e).__name__})")
                    break
            ok = sorted(meas)
            if not ok:
                # even the b=1 decode failed (HBM peak): don't lose the whole
                # multi-hour profiling run — same guard as profile_grouped
                raise RuntimeError(
                    f"all post points failed at res {res}; rerun with "
                    f"--isolate post (per-measurement subprocess) or tiled "
                    f"decode enabled")
            per_img = meas[ok[-1]] / ok[-1]  # linear extrapolation slope
            tbl = list(np.interp(np.arange(1, max_post_batch + 1), ok,
                                 [meas[b] for b in ok]))
            for i in range(ok[-1], max_post_batch):
                tbl[i] = tbl[ok[-1] - 1] + per_img * (i + 1 - ok[-1])
            post_tbl[str(res)] = [float(v) for v in tbl]
            standalone_p[str(res)] = tbl[0]
        return {
            "family": self.family,
            "standalone": {"denoising": standalone_d,
                           "postprocessing": standalone_p},
            "step_latency": step_lat,
            "post_batch_latency": post_tbl,
        }

    def predictor_samples(self) -> Tuple[List[List[int]], List[float]]:
        """Measure step latency over a curated set of resolution mixtures.

        A full count grid (4^R mixtures) is a compile storm through the dev
        relay (each new bucket composition recompiles the full mixed step,
        ~15-25 min); the predictor is a 3-feature ridge fit
        (scheduler/predictor.py), so ~10 well-spread mixtures determine it.
        Singles and doubles per resolution, pairwise mixes of the extreme
        resolutions, and one all-resolution mix.
        """
        res = sorted(self.resolutions)
        mixes: List[Dict[int, int]] = []
        for r in res:
            mixes.append({r: 1})
            mixes.append({r: 2})
        if len(res) >= 2:
            lo, hi = res[0], res[-1]
            mixes.append({lo: 1, hi: 1})
            mixes.append({lo: 2, hi: 2})
        if len(res) >= 3:
            mixes.append({r: 1 for r in res})
        maxb = self.config.scheduler.max_batch_size
        rows, ys = [], []
        for mix in mixes:
            if sum(mix.values()) > maxb:
                continue
            y = self.step_latency(mix, iters=3)
            rows.append([mix.get(r, 0) for r in res])
            ys.append(y)
        return rows, ys

    def fit_predictor(self, out_path: str) -> None:
        from sduss_tpu.scheduler.predictor import LatencyPredictor
        from sduss_tpu.scheduler.profiles import get_profile

        rows, ys = self.predictor_samples()
        pred = LatencyPredictor(sorted(self.resolutions),
                                get_profile(self.family))
        pred.fit(rows, ys)
        pred.save(out_path)


def _measure_many(specs_json: str) -> None:
    """Subprocess entry: run a LIST of measurements sequentially, printing
    one JSON line per point ({"i": n, "ok": ..., "value"/"error": ...}).
    A failing point (e.g. ResourceExhausted) reports and continues — later
    points in the same process may fail fast if the device is poisoned, but
    every successful value still reaches the parent."""
    specs = json.loads(specs_json)
    prof = None
    for i, spec in enumerate(specs):
        if prof is None:
            prof = Profiler(spec["family"], tiny=spec.get("tiny", False),
                            dtype=spec.get("dtype", "bfloat16"),
                            encoders_on_host=spec.get("encoders_on_host",
                                                      False))
        try:
            if spec["kind"] == "step":
                counts = {int(k): v for k, v in spec["counts"].items()}
                v = prof._step_latency_local(counts,
                                             iters=spec.get("iters", 3))
            else:
                v = prof._post_latency_local(spec["res"], spec["batch"],
                                             iters=spec.get("iters", 3))
            print(json.dumps({"i": i, "ok": True, "value": v}), flush=True)
        except Exception as e:
            print(json.dumps({"i": i, "ok": False,
                              "error": f"{type(e).__name__}: {e}"[:400]}),
                  flush=True)


def _measure_one(spec_json: str) -> None:
    """Subprocess entry: run one measurement, print one JSON line."""
    spec = json.loads(spec_json)
    prof = Profiler(spec["family"], tiny=spec.get("tiny", False),
                    dtype=spec.get("dtype", "bfloat16"),
                    encoders_on_host=spec.get("encoders_on_host", False))
    try:
        if spec["kind"] == "step":
            counts = {int(k): v for k, v in spec["counts"].items()}
            v = prof._step_latency_local(counts, iters=spec.get("iters", 5))
        else:
            v = prof._post_latency_local(spec["res"], spec["batch"],
                                         iters=spec.get("iters", 3))
        print(json.dumps({"ok": True, "value": v}))
    except Exception as e:
        print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"[:500]}))
        raise SystemExit(1)


def main() -> None:  # pragma: no cover
    ap = argparse.ArgumentParser("sduss_tpu profiler")
    ap.add_argument("--family", default="sdxl")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out-profile", default="profile.json")
    ap.add_argument("--out-predictor", default="predictor.npz")
    ap.add_argument("--skip-predictor", action="store_true")
    ap.add_argument("--encoders-on-host", action="store_true",
                    help="keep text encoders in host memory (HBM-limited "
                         "chips; required for full-size SD3 on one v5e)")
    ap.add_argument("--isolate", choices=["none", "post", "all", "group"],
                    default="none",
                    help="run measurements in subprocesses so an OOM cannot "
                         "poison the device for later points; 'group' = one "
                         "subprocess for all step mixes + one per post table "
                         "(placement/encode paid per group, not per point)")
    ap.add_argument("--measure-one", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--measure-many", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.measure_one:
        _measure_one(args.measure_one)
        return
    if args.measure_many:
        _measure_many(args.measure_many)
        return

    prof = Profiler(args.family, tiny=args.tiny, dtype=args.dtype,
                    encoders_on_host=args.encoders_on_host,
                    isolate=args.isolate)

    if args.isolate == "group":
        profile, rows, ys = prof.profile_grouped()
        with open(args.out_profile, "w") as f:
            json.dump(profile, f, indent=2)
        print(f"wrote {args.out_profile}")
        if not args.skip_predictor:
            from sduss_tpu.scheduler.predictor import LatencyPredictor
            from sduss_tpu.scheduler.profiles import get_profile

            pred = LatencyPredictor(sorted(prof.resolutions),
                                    get_profile(args.family))
            pred.fit(rows, ys)
            pred.save(args.out_predictor)
            print(f"wrote {args.out_predictor}")
        return
    profile = prof.build_profile()
    with open(args.out_profile, "w") as f:
        json.dump(profile, f, indent=2)
    print(f"wrote {args.out_profile}")
    if not args.skip_predictor:
        prof.fit_predictor(args.out_predictor)
        print(f"wrote {args.out_predictor}")


if __name__ == "__main__":  # pragma: no cover
    main()
