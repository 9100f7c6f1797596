"""Train the per-block cache classifiers from TPU traces.

The reference ships joblib-pickled sklearn classifiers trained offline on
H100 traces (reference cache_manager.py:38-45, exp/*-threshold0.01.pkl).
Those do not transfer to TPU — different hardware, different numerics — so
this module regenerates them natively:

1. ``TraceCache`` instruments the gated denoiser: every step records, per
   gated block per patch, the input drift (rel_mse vs previous step) and the
   TRUE output drift (would reusing last step's output have been fine?).
2. ``collect_traces`` runs a short denoising trajectory and accumulates the
   (rel_in, t_norm) -> fresh/reuse dataset per block.
3. ``fit_classifiers`` fits one tiny logistic per block (numpy gradient
   descent — no sklearn/joblib) and saves all of them to a single npz that
   ``CacheConfig.classifier_path`` points at.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from sduss_tpu.cache.manager import BlockCache


class TraceCache(BlockCache):
    """Always-recompute cache that also emits decision features per block.

    Rank-agnostic: traces UNet patch rows (P,s,s,C), dense image rows
    (B,h,w,C) and MMDiT token rows (B,S,D) alike (features reduce over all
    non-leading axes, matching BlockCache._recompute_mask/_scores).
    """

    def init_rows(self, key, n_patches, s, c_in, c_out, dtype=jnp.bfloat16):
        rows = super().init_rows(key, n_patches, s, c_in, c_out, dtype)
        rows["rel_in"] = jnp.zeros((n_patches,), jnp.float32)
        rows["rel_out"] = jnp.zeros((n_patches,), jnp.float32)
        rows["t"] = jnp.zeros((n_patches,), jnp.float32)
        return rows

    def init_token_rows(self, key, n_rows, seq, dim, dtype=jnp.bfloat16,
                        ctx_seq=None):
        rows = super().init_token_rows(key, n_rows, seq, dim, dtype)
        rows["rel_in"] = jnp.zeros((n_rows,), jnp.float32)
        rows["rel_out"] = jnp.zeros((n_rows,), jnp.float32)
        rows["t"] = jnp.zeros((n_rows,), jnp.float32)
        return rows

    def gate(self, key, x, t_norm, state_k, compute_fn):
        y_new = compute_fn(x)
        if state_k is None:
            return y_new, None, None
        ax_x = tuple(range(1, x.ndim))
        xf = x.astype(jnp.float32)
        cf = state_k["inp"].astype(jnp.float32)
        rel_in = jnp.mean((xf - cf) ** 2, axis=ax_x) / (
            jnp.mean(xf * xf, axis=ax_x) + 1e-8)
        yf = y_new.astype(jnp.float32)
        of = state_k["out"].astype(jnp.float32)
        ax_y = tuple(range(1, y_new.ndim))
        rel_out = jnp.mean((yf - of) ** 2, axis=ax_y) / (
            jnp.mean(yf * yf, axis=ax_y) + 1e-8)
        new_state = {
            "inp": x,
            "out": y_new,
            "hits": jnp.zeros_like(state_k["hits"]),
            "rel_in": rel_in,
            "rel_out": rel_out,
            "t": (t_norm.astype(jnp.float32) if t_norm is not None
                  else jnp.zeros_like(rel_in)),
        }
        return y_new, new_state, None


def collect_traces(pipeline, requests, steps: Optional[int] = None
                   ) -> Dict[str, List[Tuple[float, float, float]]]:
    """Drive the mixed patch path with a TraceCache; return per-block rows
    of (rel_in, t_norm, rel_out)."""
    from sduss_tpu.request import Stage

    pipeline.prepare(requests)
    for r in requests:
        r.stage = Stage.DENOISING

    cfg = pipeline.config.cache
    trace = TraceCache(cfg)
    # inject on both cache seams: _block_cache() (UNet patch path) and
    # _sd3_cache() (MMDiT token path) return the traced object
    pipeline._cache_obj = trace
    pipeline._sd3_cache_obj = trace
    pipeline.config.cache.enabled = True
    pipeline.config.cache.mode = "block"  # trace via the masked-gate seam

    dataset: Dict[str, List[Tuple[float, float, float]]] = {}
    n_steps = steps or min(r.remain_steps for r in requests)
    for step_i in range(n_steps):
        by_res: Dict[int, list] = {}
        for r in requests:
            by_res.setdefault(r.resolution, []).append(r)
        pipeline.denoise_step_mixed(by_res)
        if step_i == 0:
            continue  # first step has no previous state to compare against
        per_key_rows = [(key, entry) for r in requests
                        for key, entry in (r.cache_rows or {}).items()]
        # MMDiT token path: state lives per batch composition on the
        # pipeline store (sd3.py _sd3_state_entry), not per request
        per_key_rows += [(key, entry)
                         for st in getattr(pipeline, "_sd3_state", {}).values()
                         for key, entry in st["state"].items()]
        for key, entry in per_key_rows:
            if "rel_in" not in entry:
                continue
            rel_in = np.asarray(entry["rel_in"])
            rel_out = np.asarray(entry["rel_out"])
            ts = np.asarray(entry["t"])
            rows = dataset.setdefault(key, [])
            for a, t, b in zip(rel_in, ts, rel_out):
                rows.append((float(a), float(t), float(b)))
    return dataset


def fit_logistic(x: np.ndarray, y: np.ndarray, iters: int = 500,
                 lr: float = 0.5) -> np.ndarray:
    """Fit sigmoid(w.x + b) ~ y by gradient descent; returns (w..., b)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    # standardize for conditioning, then fold the transform into the weights
    mu, sd = x.mean(axis=0), x.std(axis=0) + 1e-9
    xs = (x - mu) / sd
    w = np.zeros(x.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(iters):
        z = xs @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = p - y
        w -= lr * (xs.T @ g) / n
        b -= lr * float(g.mean())
    w_orig = w / sd
    b_orig = b - float(w_orig @ mu)
    return np.concatenate([w_orig, [b_orig]])


def fit_classifiers(dataset: Dict[str, List[Tuple[float, float, float]]],
                    reuse_threshold: float = 0.01,
                    out_path: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Per block: label fresh when the true output drift exceeds the
    threshold (reference trains against MSE-vs-cache at threshold 0.01,
    exp/sdxl-*-threshold0.01.pkl)."""
    out: Dict[str, np.ndarray] = {}
    for key, rows in dataset.items():
        arr = np.asarray(rows, np.float64)
        x = arr[:, :2]  # (rel_in, t_norm)
        y = (arr[:, 2] >= reuse_threshold).astype(np.float64)
        if y.min() == y.max():
            # Degenerate block (always/never fresh): bias-only classifier.
            w = np.asarray([0.0, 0.0, 0.0, 1e3 if y[0] else -1e3])
        else:
            fitted = fit_logistic(x, y)  # (w_mse, w_t, b)
            w = np.asarray([fitted[0], fitted[1], 0.0, fitted[2]])
        out[key] = w
    if out_path:
        np.savez(out_path, **out)
    return out


def main() -> None:  # pragma: no cover
    """Collect traces on this backend and fit the per-block classifiers.

    Replaces the reference's offline sklearn training of
    exp/{model}-{block}-threshold0.01.pkl with a one-command TPU-native flow.
    """
    import argparse

    from sduss_tpu.config import Config, ModelConfig
    from sduss_tpu.pipelines import build_pipeline
    from sduss_tpu.request import Request, SamplingParams

    ap = argparse.ArgumentParser("sduss_tpu cache classifier training")
    ap.add_argument("--family", default="sdxl")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--resolutions", type=int, nargs="+", default=None)
    ap.add_argument("--reuse-threshold", type=float, default=0.01)
    ap.add_argument("--out", default="cache_classifiers.npz")
    ap.add_argument("--encoders-on-host", action="store_true",
                    help="keep text encoders in host memory (HBM-limited "
                         "chips; required for full-size SD3 on one v5e)")
    args = ap.parse_args()

    config = Config()
    config.model = ModelConfig(model=args.family, test_tiny=args.tiny,
                               dtype=args.dtype,
                               encoders_on_host=args.encoders_on_host)
    config.cache.enabled = True
    pipe = build_pipeline(config)
    res = args.resolutions or list(config.model.resolutions)
    # One resolution per collection pass: the trace cache holds inp+out per
    # gated block per request, and a full multi-resolution batch of those
    # rows exceeds a 16 GB chip at SD3 scale (measured ResourceExhausted).
    # Per-block (rel_in, t, rel_out) features are batch-composition
    # independent, so the merged dataset trains the same classifiers.
    data: dict = {}
    for i, r in enumerate(res):
        reqs = [Request(f"train-{i}", SamplingParams(
            prompt=f"training prompt {i}", resolution=r,
            num_inference_steps=args.steps, seed=i))]
        part = collect_traces(pipe, reqs, steps=args.steps)
        for k, rows in part.items():
            data.setdefault(k, []).extend(rows)
        print(f"res {r}: {sum(len(v) for v in part.values())} trace rows")
    out = fit_classifiers(data, args.reuse_threshold, args.out)
    print(f"fitted {len(out)} block classifiers -> {args.out}")


if __name__ == "__main__":  # pragma: no cover
    main()
