"""On-chip: model-layout fused self-attention (zero head transposes) vs the
head-transposed flash path, INCLUDING the qkv head reshape cost that the
model pays around each call.  Chained in-graph, scalar fetch (CLAUDE.md).
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

    from sduss_tpu.ops.flash import flash_mha, flash_mha_fused

    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    results = {}
    cases = [
        ("attn_l2", 16, 20, 1024, 1280, 512),
        ("attn_l1", 16, 10, 4096, 640, 512),
        ("sd3_joint", 2, 24, 4480, 1536, 256),   # VMEM: 14 MB K/V rows
        ("sd15_l0", 16, 8, 4096, 320, 512),      # hd=40 lane slices
    ]
    for name, b, h, s, dm, bq in cases:
        q = mk((b, s, dm))
        scale = (dm // h) ** -0.5
        t0 = timeit(lambda x, h=h, sc=scale: flash_mha(x, x, x, h, sc), q)
        try:
            t1 = timeit(lambda x, h=h, sc=scale, bq=bq:
                        flash_mha_fused(x, x, x, h, sc, block_q=bq), q)
        except Exception as e:
            print(f"{name}: fused FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            results[f"{name}_fused_ms"] = None
            results[f"{name}_headed_ms"] = round(t0 * 1e3, 3)
            continue
        results[f"{name}_headed_ms"] = round(t0 * 1e3, 3)
        results[f"{name}_fused_ms"] = round(t1 * 1e3, 3)
        print(f"{name}: headed {t0*1e3:.3f} ms -> fused {t1*1e3:.3f} ms "
              f"({t0/t1:.2f}x)", flush=True)

    with open("exp/bench_fused_attn_v5e.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
