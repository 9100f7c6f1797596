"""Custom flash kernel A/B at SD3 + SDXL attention shapes on the real chip.

Usage: python scripts/bench_flash.py   (TPU; ~minutes of remote compiles)
"""

from __future__ import annotations

import functools
import json
import math
import time

import numpy as np


def timeit(fn, *args, n=10):
    """Per-op time with the relay dispatch overhead amortized away.

    Chains ``fn`` N times INSIDE one jit (output feeds the next query, so
    XLA cannot parallelize or elide iterations); one dispatch, N ops.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(q, *rest):
        for _ in range(n):
            q = fn(q, *rest)
        # scalar output: fetching full tensors through the relay (~50 MB/s)
        # would dominate the measurement
        return jnp.sum(q.astype(jnp.float32))

    out = chained(*args)
    np.asarray(out)  # axon: block_until_ready can return early
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / (reps * n)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from sduss_tpu.ops.attention import _dense_masked
    from sduss_tpu.ops.flash import flash_mha

    rng = np.random.default_rng(0)
    results = {}

    # (name, B, S, D_model, heads): SD3 joint attention at 1024^2 CFG b1;
    # SDXL lvl1/lvl2 at 1024^2 CFG b8.
    shapes = {
        "sd3_dual": (2, 4096, 1536, 24),
    }
    for name, (b, s, dm, h) in shapes.items():
        hd = dm // h
        scale = 1.0 / math.sqrt(hd)
        q = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.bfloat16)

        t = timeit(jax.jit(functools.partial(
            _dense_masked, num_heads=h, kv_token_mask=None, scale=scale)),
            q, k, v)
        results[f"{name}_dense_ms"] = round(t * 1e3, 3)
        print(f"{name}: dense {t*1e3:.2f} ms", flush=True)

        for bq, bkv in [(512, 512), (1024, 512)]:
            fn = functools.partial(flash_mha, num_heads=h, scale=scale,
                                   block_q=bq, block_kv=bkv)
            try:
                t = timeit(fn, q, k, v)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: custom q{bq}/kv{bkv} FAILED {type(e).__name__}: {e}",
                      flush=True)
                continue
            results[f"{name}_custom_q{bq}_kv{bkv}_ms"] = round(t * 1e3, 3)
            print(f"{name}: custom q{bq}/kv{bkv} {t*1e3:.2f} ms", flush=True)

        # matmul-bound floor for context
        flops = 4 * b * h * s * s * hd
        results[f"{name}_matmul_bound_ms"] = round(flops / 394e12 * 1e3, 3)

    with open("exp/bench_flash_v5e.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
