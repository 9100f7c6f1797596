"""A/B the VAE mid-block attention path on chip: dense vs q-row-blocked.

The decoder's single mid attention runs single-head d=512 over the full
token grid (16384 tokens at 1024px) — too wide for the flash kernels'
full-KV-in-VMEM layout, and the dense path stages the (L, L) f32 score
matrix (~1 GB/image at 1024px) through HBM.  attention_blocked
(models/layers.py) bounds the live logits to (block_q, L).  This measures
whole-decode latency both ways plus the isolated op, and writes
exp/bench_vae_attn_v5e.json; flip the SDUSS_VAE_BLOCKED_ATTN default only
if blocked wins here.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, reps=3):
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU code-path smoke (no real numbers, no file)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from sduss_tpu.models import layers as L
    from sduss_tpu.models.vae import SDXL_VAE, AutoencoderKL

    out = {}

    # isolated op at the 1024px decode shape (b8 CFG-free: decode is
    # per-image), bf16 in / out like the decoder
    b, s, d = (2, 4096, 64) if args.tiny else (8, 128 * 128, 512)
    rng = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(key, (b, s, d), jnp.bfloat16)
               for key in jax.random.split(rng, 3))

    @jax.jit
    def op_dense(q, k, v):
        return jnp.sum(L.attention(q, k, v, num_heads=1)
                       .astype(jnp.float32))

    @jax.jit
    def op_blocked(q, k, v):
        return jnp.sum(L.attention_blocked(q, k, v, num_heads=1)
                       .astype(jnp.float32))

    out["op_dense_s"] = round(_time(op_dense, q, k, v), 4)
    print(f"op dense ({b},{s},{d}): {out['op_dense_s']*1e3:.1f} ms",
          flush=True)
    out["op_blocked_s"] = round(_time(op_blocked, q, k, v), 4)
    print(f"op blocked: {out['op_blocked_s']*1e3:.1f} ms", flush=True)

    # whole decode, both routes (env read happens at trace time)
    vae = AutoencoderKL(SDXL_VAE)
    params = vae.init(jax.random.key(0))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    for res in ((768,) if args.tiny else (768, 1024)):
        hw = res // 8
        nb = 1 if args.tiny else 8
        z = jax.random.normal(jax.random.PRNGKey(1), (nb, hw, hw, 4),
                              jnp.float32)
        for mode, env in (("dense", "0"), ("blocked", "1")):
            os.environ["SDUSS_VAE_BLOCKED_ATTN"] = env

            def dec(p, z):
                return jnp.sum(vae.decode(p, z, dtype=jnp.bfloat16)
                               .astype(jnp.float32))

            t = _time(jax.jit(dec), params, z)
            out[f"decode_{res}_b{nb}_{mode}_s"] = round(t, 4)
            print(f"decode {res} b{nb} {mode}: {t*1e3:.1f} ms", flush=True)

    if not args.tiny:
        with open("exp/bench_vae_attn_v5e.json", "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
