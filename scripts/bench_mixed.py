"""Mixed-resolution patched UNet step on chip, fetch-corrected.

Measures the SDXL patched path for a 512^2 + 1024^2 pair (the composition
previously measured at 983 -> 516 ms/step via per-call runs) and the dense
per-resolution alternative, both as in-graph chains with scalar fetches.
Validates the per-class grouped-attention change.

Env: BENCH_GRIDS="2,4" (patch-grid sides; 2=512^2, 3=768^2, 4=1024^2)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from sduss_tpu.config import SchedulerConfig
    from sduss_tpu.models.unet import SDXL_UNET, UNet2DConditionModel
    from sduss_tpu.ops import patching
    from sduss_tpu.ops.patch_ctx import PatchContext, ctx_arrays
    from sduss_tpu.samplers import get_sampler
    from sduss_tpu.utils import random_params_bf16

    grids = tuple(int(g) for g in
                  os.environ.get("BENCH_GRIDS", "2,4").split(","))
    sc = SchedulerConfig()
    cells = 32
    unet = UNet2DConditionModel(SDXL_UNET)
    params = random_params_bf16(unet)
    sampler = get_sampler("euler")
    n_steps = 8

    meta = patching.build_meta(grids, cells, tuple(sc.patch_buckets),
                               tuple(sc.batch_buckets))
    meta2 = patching.double_meta(grids, cells, tuple(sc.patch_buckets),
                                 tuple(sc.batch_buckets))
    a1 = ctx_arrays(meta)
    a2 = ctx_arrays(meta2)

    i_pad = meta.i_pad
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((meta.p_pad, cells, cells, 4)),
                    jnp.bfloat16)
    t = jnp.full((i_pad,), 500.0, jnp.float32)
    coeffs = jnp.asarray([[4.0, 3.0]] * i_pad, jnp.float32)
    guidance = jnp.full((i_pad,), 5.0, jnp.float32)
    ehs2 = jnp.asarray(rng.standard_normal((2 * i_pad, 77, 2048)), jnp.bfloat16)
    pooled2 = jnp.asarray(rng.standard_normal((2 * i_pad, 1280)), jnp.bfloat16)
    time_ids2 = jnp.asarray([[1024.0, 1024.0, 0, 0, 1024.0, 1024.0]] * (2 * i_pad),
                            jnp.float32)

    def one_step(params, x, a1, a2):
        ctx1 = PatchContext(meta, arrays=a1)
        ctx2 = PatchContext(meta2, arrays=a2)
        c0, c1 = coeffs[:, 0], coeffs[:, 1]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        x2 = sampler.scale_model_input(x2, jnp.concatenate([c0, c0])[ctx2.image_id])
        added = {"text_embeds": pooled2, "time_ids": time_ids2}
        out = unet.apply(params, x2, t2, ehs2, added_cond=added, ctx=ctx2)
        u, c = jnp.split(out, 2, axis=0)
        eps = u + guidance[ctx1.image_id].reshape(-1, 1, 1, 1) * (c - u)
        return sampler.step(x, eps, c0[ctx1.image_id], c1[ctx1.image_id])

    @jax.jit
    def run(params, x, a1, a2):
        for _ in range(n_steps):
            x = one_step(params, x, a1, a2)
        return jnp.sum(x.astype(jnp.float32))

    np.asarray(run(params, x, a1, a2))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(params, x, a1, a2))
        best = min(best, time.perf_counter() - t0)
    ms = best / n_steps * 1e3
    result = {
        "metric": "SDXL mixed patched step",
        "grids": list(grids), "p_pad": meta.p_pad, "i_pad": meta.i_pad,
        "classes": [list(ci) for ci in meta.class_info],
        "ms_per_step": round(ms, 1),
        "history_ms": {"coarse_buckets": 983, "finer_buckets": 516},
    }

    # -- patch-compact block cache (gate_compact_patch) ----------------------
    frac = float(os.environ.get("BENCH_COMPACT_FRACTION", "0.5"))
    # BENCH_PATCH_FRACTION < 1: two-level per-patch tail compaction inside
    # recomputed images (CacheConfig.patch_fraction)
    pfrac = float(os.environ.get("BENCH_PATCH_FRACTION", "1.0"))
    if frac > 0:
        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        cc = CacheConfig(enabled=True, mode="compact", compact_fraction=frac,
                         patch_fraction=pfrac, mse_threshold=0.01, min_level=1)
        cache = BlockCache(cc)
        layout = unet.cache_layout(cells, cc.min_level)
        state = {key: cache.init_rows(key, meta2.p_pad, s, ci, co, jnp.bfloat16)
                 for key, (s, ci, co) in layout.items()}

        def one_step_c(params, x, st, a1, a2):
            ctx1 = PatchContext(meta, arrays=a1)
            ctx2 = PatchContext(meta2, arrays=a2)
            c0, c1 = coeffs[:, 0], coeffs[:, 1]
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            x2 = sampler.scale_model_input(
                x2, jnp.concatenate([c0, c0])[ctx2.image_id])
            added = {"text_embeds": pooled2, "time_ids": time_ids2}
            out, st = unet.apply(params, x2, t2, ehs2, added_cond=added,
                                 ctx=ctx2, cache=cache, cache_state=st)
            u, c = jnp.split(out, 2, axis=0)
            eps = u + guidance[ctx1.image_id].reshape(-1, 1, 1, 1) * (c - u)
            return sampler.step(x, eps, c0[ctx1.image_id],
                                c1[ctx1.image_id]), st

        @jax.jit
        def run_c(params, x, state, a1, a2):
            for _ in range(n_steps):
                x, state = one_step_c(params, x, state, a1, a2)
            return jnp.sum(x.astype(jnp.float32))

        np.asarray(run_c(params, x, state, a1, a2))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run_c(params, x, state, a1, a2))
            best = min(best, time.perf_counter() - t0)
        result["ms_per_step_compact"] = round(best / n_steps * 1e3, 1)
        result["compact_fraction"] = frac
        result["patch_fraction"] = pfrac

    print(json.dumps(result))
    out_path = os.environ.get("BENCH_MIXED_OUT", "exp/bench_mixed_v5e.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
