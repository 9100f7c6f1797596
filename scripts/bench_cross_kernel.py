"""On-chip: no-transpose short-KV cross-attention kernel vs dense, plus the
retuned flash auto-heuristic (hb cap) at the in-model self-attention shapes.

Methodology per CLAUDE.md: chained ops in one jit, scalar fetch.
"""

from __future__ import annotations

import json
import time

import numpy as np


def timeit(fn, *args, n=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x, *rest):
        for _ in range(n):
            x = fn(x, *rest)
        return jnp.sum(x.astype(jnp.float32))

    out = chained(*args)
    np.asarray(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / (reps * n)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from sduss_tpu.ops.attention import _dense_masked, masked_attention
    from sduss_tpu.ops.flash import flash_cross_short

    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    results = {}

    # -- cross-attention: dense vs the new kernel ---------------------------
    cross_cases = [
        ("xl2", 16, 20, 1024, 77, 1280),   # SDXL level2, 61 calls/step
        ("xl1", 16, 10, 4096, 77, 640),    # SDXL level1, 10 calls/step
        ("x15l0", 16, 8, 4096, 77, 320),   # SD1.5 level0 (hd=40 lane slices)
        ("x15l1", 16, 8, 1024, 77, 640),   # SD1.5 level1 (hd=80)
    ]
    for name, b, h, sq, lk, dm in cross_cases:
        q = mk((b, sq, dm))
        kv = mk((b, lk, dm))
        scale = (dm // h) ** -0.5
        td = timeit(lambda x, kv=kv, h=h, s=scale:
                    _dense_masked(x, kv, kv, h, None, s), q)
        tk = timeit(lambda x, kv=kv, h=h, s=scale:
                    flash_cross_short(x, kv, kv, h, s), q)
        results[f"{name}_dense_ms"] = round(td * 1e3, 3)
        results[f"{name}_kernel_ms"] = round(tk * 1e3, 3)
        print(f"{name}: dense {td*1e3:.3f} ms -> kernel {tk*1e3:.3f} ms "
              f"({td/tk:.2f}x)", flush=True)

    # -- self-attention through the dispatch (retuned hb cap) ---------------
    self_cases = [
        ("attn_l2", 16, 20, 1024, 1280),
        ("attn_l1", 16, 10, 4096, 640),
        ("sd3_joint", 2, 24, 4480, 1536),
    ]
    for name, b, h, s, dm in self_cases:
        q = mk((b, s, dm))
        t = timeit(lambda x, h=h: masked_attention(x, x, x, h), q)
        results[f"{name}_ms"] = round(t * 1e3, 3)
        print(f"{name}: {t*1e3:.3f} ms", flush=True)

    with open("exp/bench_cross_kernel_v5e.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
