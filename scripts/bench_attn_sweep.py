"""On-chip sweep of flash-kernel cell shapes (heads_per_cell x block_q).

Targets the op-budget's remaining attention headroom (exp/bench_sdxl_ops_v5e
.json): SDXL l2 self-attention (S=1024, 61 calls/step) measured 2.56 ms vs a
~1.4 ms structural floor, and dense short-KV cross-attention (1.21 ms vs
~0.2 ms floor, 61+10 calls/step).  SD3's joint shape included to protect the
current 252.6 ms step.

Methodology per CLAUDE.md: chain n ops inside ONE jit, return a scalar sum
(np.asarray of a full tensor would measure the ~50 MB/s relay, not the chip).
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
            x = fn(x, *rest)  # output feeds next input: natural dep chain
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

    from sduss_tpu.ops.attention import _dense_masked
    from sduss_tpu.ops.flash import flash_mha

    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    results = {}

    # (name, B, H, Sq, Lk, dm, [(block_q, hb)...])
    cases = [
        ("sdxl_l2_self", 16, 20, 1024, 1024, 1280,
         [(512, None), (512, 4), (512, 8), (1024, 2), (1024, 4), (1024, 8),
          (1024, 16)]),
        ("sdxl_l1_self", 16, 10, 4096, 4096, 640,
         [(512, None), (512, 2), (256, 1), (1024, 1)]),
        ("sdxl_l2_cross", 16, 20, 1024, 77, 1280,
         [(512, None), (512, 8), (512, 16), (1024, 8), (1024, 16),
          (1024, 20)]),
        ("sdxl_l1_cross", 16, 10, 4096, 77, 640,
         [(512, None), (512, 8), (1024, 4), (1024, 8), (1024, 16)]),
        ("sd3_joint_b1", 2, 24, 4480, 4480, 1536,
         [(512, None), (512, 2), (1024, 1), (1024, 2), (256, 2)]),
    ]

    for name, b, h, sq, lk, dm, variants in cases:
        q = mk((b, sq, dm))
        kv = q if lk == sq else mk((b, lk, dm))
        scale = (dm // h) ** -0.5
        flops = 4 * b * h * sq * lk * (dm // h)

        t = timeit(lambda x, kv=kv, h=h, scale=scale:
                   _dense_masked(x, kv, kv, h, None, scale), q)
        results[f"{name}/dense"] = round(t * 1e3, 3)
        print(f"{name:>14s} dense        : {t*1e3:7.3f} ms "
              f"({flops/t/1e12:5.1f} TF/s)", flush=True)

        for bq, hb in variants:
            tag = f"bq{bq}_hb{hb if hb is not None else 'auto'}"
            try:
                t = timeit(lambda x, kv=kv, h=h, scale=scale, bq=bq, hb=hb:
                           flash_mha(x, kv, kv, h, scale, block_q=bq,
                                     heads_per_cell=hb), q)
            except Exception as e:  # Mosaic VMEM/layout failures are data
                print(f"{name:>14s} {tag:13s}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                results[f"{name}/{tag}"] = None
                continue
            results[f"{name}/{tag}"] = round(t * 1e3, 3)
            print(f"{name:>14s} {tag:13s}: {t*1e3:7.3f} ms "
                  f"({flops/t/1e12:5.1f} TF/s)", flush=True)

    with open("exp/bench_attn_sweep_v5e.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
