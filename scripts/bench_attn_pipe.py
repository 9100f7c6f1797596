"""On-chip A/B of head-software-pipelined flash schedules (pipe=True).

The SD3 roofline (exp/sd3_roofline_v5e.json) attributes the residual
kernel gap (4.53 vs 3.10 ms/joint op) to softmax VPU passes not overlapped
with the MXU: the per-head QK -> softmax -> PV chain serializes the units.
The ``pipeline`` schedule issues head h+1's QK matmul before head h's
softmax so Mosaic can overlap them.  This bench measures pipe on/off at the
production shapes (methodology per CLAUDE.md: chain ops in ONE jit, fetch a
4-byte scalar).
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

    # flash_mha variants: (name, B, H, Sq, Lk, dm, [(block_q, hb)])
    mha_cases = [
        ("sd3_joint_b1", 2, 24, 4480, 4480, 1536, [(512, 2), (256, 4)]),
        ("sdxl_l2_self", 16, 20, 1024, 1024, 1280, [(512, 4)]),
        ("sdxl_l1_self", 16, 10, 4096, 4096, 640, [(512, 2)]),
    ]
    for name, b, h, sq, lk, dm, variants in mha_cases:
        q = mk((b, sq, dm))
        kv = q if lk == sq else mk((b, lk, dm))
        scale = (dm // h) ** -0.5
        flops = 4 * b * h * sq * lk * (dm // h)
        for bq, hb in variants:
            for pipe in (False, True):
                tag = f"{name}/bq{bq}_hb{hb}_pipe{int(pipe)}"
                try:
                    t = timeit(
                        lambda x, kv=kv, h=h, scale=scale, bq=bq, hb=hb,
                        pipe=pipe: flash_mha(x, kv, kv, h, scale, block_q=bq,
                                             heads_per_cell=hb, pipeline=pipe),
                        q)
                except Exception as e:
                    print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:140]}",
                          flush=True)
                    results[tag] = None
                    continue
                results[tag] = round(t * 1e3, 3)
                print(f"{tag}: {t*1e3:7.3f} ms ({flops/t/1e12:5.1f} TF/s)",
                      flush=True)

    # fused model-layout variants (default SDXL aligned self-attention
    # path): pipe on/off x f32/bf16 score tiles (the short-S shapes are
    # VPU-bound; bf16 halves softmax-pass bytes)
    fused_cases = [
        ("sdxl_l2_fused", 16, 20, 1024, 1280),
        ("sdxl_l1_fused", 16, 10, 4096, 640),
    ]
    for name, b, h, s, dm in fused_cases:
        q = mk((b, s, dm))
        scale = (dm // h) ** -0.5
        flops = 4 * b * h * s * s * (dm // h)
        for pipe in (False, True):
            for bf16s in (False, True):
                tag = f"{name}/pipe{int(pipe)}_bf16s{int(bf16s)}"
                try:
                    t = timeit(lambda x, h=h, scale=scale, pipe=pipe,
                               bf16s=bf16s:
                               flash_mha_fused(x, x, x, h, scale,
                                               pipeline=pipe,
                                               bf16_scores=bf16s), q)
                except Exception as e:
                    print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:140]}",
                          flush=True)
                    results[tag] = None
                    continue
                results[tag] = round(t * 1e3, 3)
                print(f"{tag}: {t*1e3:7.3f} ms ({flops/t/1e12:5.1f} TF/s)",
                      flush=True)

    # nobias per-head kernel with bf16 scores at the SD3 joint shape (the
    # alignment change routes 4480 through nobias now)
    q = mk((2, 4480, 1536))
    flops = 4 * 2 * 24 * 4480 * 4480 * 64
    for bf16s in (False, True):
        tag = f"sd3_joint_nobias/bf16s{int(bf16s)}"
        try:
            t = timeit(lambda x, bf16s=bf16s:
                       flash_mha(x, x, x, 24, 64 ** -0.5,
                                 bf16_scores=bf16s), q)
        except Exception as e:
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            results[tag] = None
            continue
        results[tag] = round(t * 1e3, 3)
        print(f"{tag}: {t*1e3:7.3f} ms ({flops/t/1e12:5.1f} TF/s)",
              flush=True)

    with open("exp/bench_attn_pipe_v5e.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
