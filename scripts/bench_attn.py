"""Attention microbenchmark: decompose the SDXL step time on the real chip.

Measures, at SDXL-1024 batch-8 CFG shapes:
  * dense fused attention (the serving default) per level
  * Pallas flash with default and tuned block sizes
  * a level-1 resnet conv pair (the conv side of the budget)

Guides kernel work: if attention dominates, a tuned kernel is the lever.
Usage: python scripts/bench_attn.py   (runs on the default backend)
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np


def timeit(fn, *args, n=20):
    out = fn(*args)
    np.asarray(out)  # force completion (axon: block_until_ready returns early)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from sduss_tpu.models import layers as L

    rng = np.random.default_rng(0)
    results = {}

    # SDXL self-attention shapes at 1024^2, batch 8 + CFG = 16:
    # level1: 4096 tokens, 640 ch, 10 heads; level2: 1024 tokens, 1280 ch, 20 heads
    for name, (b, s, c, h, layers) in {
        "attn_lvl1": (16, 4096, 640, 10, 10),
        "attn_lvl2": (16, 1024, 1280, 20, 61),
    }.items():
        q = jnp.asarray(rng.standard_normal((b, s, c)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, c)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, c)), jnp.bfloat16)

        dense = jax.jit(functools.partial(L.attention, num_heads=h))
        t = timeit(dense, q, k, v)
        results[f"{name}_dense_ms"] = t * 1e3
        results[f"{name}_dense_total_ms"] = t * 1e3 * layers
        print(f"{name}: dense {t*1e3:.2f} ms/layer x{layers} "
              f"= {t*1e3*layers:.0f} ms/step", flush=True)

        if os.environ.get("BENCH_FLASH") == "1":
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, flash_attention)

            def flash(q, k, v, bs=None):
                hd = c // h
                qh = q.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
                kh = k.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
                vh = v.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
                o = flash_attention(qh, kh, vh, sm_scale=1.0 / hd**0.5,
                                    block_sizes=bs)
                return o.transpose(0, 2, 1, 3).reshape(b, s, c)

            t = timeit(jax.jit(flash), q, k, v)
            results[f"{name}_flash_ms"] = t * 1e3
            print(f"{name}: flash default {t*1e3:.2f} ms/layer", flush=True)

            bs = BlockSizes(block_q=min(512, s), block_k_major=min(512, s),
                            block_k=min(512, s), block_b=1)
            t = timeit(jax.jit(functools.partial(flash, bs=bs)), q, k, v)
            results[f"{name}_flash_tuned_ms"] = t * 1e3
            print(f"{name}: flash tuned {t*1e3:.2f} ms/layer", flush=True)

    # conv side: level0 resnet conv (128x128, 320ch) and level1 (64x64, 640ch)
    for name, (b, hw, c) in {
        "conv_lvl0": (16, 128, 320),
        "conv_lvl1": (16, 64, 640),
    }.items():
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
        p = {"kernel": jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02,
                                   jnp.bfloat16),
             "bias": jnp.zeros((c,), jnp.bfloat16)}
        t = timeit(jax.jit(L.conv2d), p, x)
        results[f"{name}_ms"] = t * 1e3
        print(f"{name}: {t*1e3:.2f} ms", flush=True)

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
