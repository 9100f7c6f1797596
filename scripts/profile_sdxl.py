"""Measure real v5e SDXL stage latencies -> exp/profile_sdxl_v5e.json.

Grounds the ESyMReD deadlines/predictor on this chip (the defaults in
sduss_tpu/scheduler/profiles.py are H100 anchors from the reference).
Measures with scanned trajectories (one dispatch per measurement) so the
axon relay's per-call overhead doesn't pollute the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from sduss_tpu.models.unet import SDXL_UNET, UNet2DConditionModel
    from sduss_tpu.models.vae import SDXL_VAE, AutoencoderKL
    from sduss_tpu.samplers import get_sampler
    from sduss_tpu.utils import random_params_bf16

    unet = UNet2DConditionModel(SDXL_UNET)
    params = random_params_bf16(unet)
    sampler = get_sampler("euler")
    table = sampler.make_table(10)
    ts = jnp.asarray(table.timesteps)
    cs = jnp.asarray(table.coeffs)

    out = {"family": "sdxl", "standalone": {"denoising": {}, "postprocessing": {}},
           "step_latency": {}, "post_batch_latency": {}}

    for res in (512, 768, 1024):
        hw = res // 8
        lat = jnp.zeros((1, hw, hw, 4), jnp.bfloat16)
        ehs = jnp.zeros((1, 77, 2048), jnp.bfloat16)
        pooled = jnp.zeros((1, 1280), jnp.bfloat16)
        tid = jnp.asarray([[res, res, 0, 0, res, res]], jnp.float32)
        g = jnp.full((1,), 5.0)

        @jax.jit
        def run(params, lat, g, ehs, pooled, tid):
            def body(i, x):
                t_i = jnp.full((1,), ts[i], jnp.float32)
                c0 = jnp.full((1,), cs[i, 0])
                c1 = jnp.full((1,), cs[i, 1])
                x_in = jnp.concatenate([x, x])
                x_in = sampler.scale_model_input(x_in, jnp.concatenate([c0, c0]))
                added = {"text_embeds": jnp.concatenate([pooled, pooled]),
                         "time_ids": jnp.concatenate([tid, tid])}
                o = unet.apply(params, x_in, jnp.full((2,), ts[i]),
                               jnp.concatenate([ehs, ehs]), added_cond=added)
                u, c = jnp.split(o, 2)
                return sampler.step(x, u + g.reshape(-1, 1, 1, 1) * (c - u), c0, c1)

            return jax.lax.fori_loop(0, 10, body, lat)

        np.asarray(run(params, lat, g, ehs, pooled, tid))  # compile+warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(params, lat, g, ehs, pooled, tid))
            best = min(best, time.perf_counter() - t0)
        step_s = best / 10.0
        out["step_latency"][str(res)] = round(step_s, 5)
        out["standalone"]["denoising"][str(res)] = round(step_s * 50, 4)
        print(f"res {res}: {step_s*1e3:.1f} ms/step", flush=True)

    del params
    import gc

    gc.collect()

    vae = AutoencoderKL(SDXL_VAE)
    vparams = jax.tree.map(lambda x: x, vae.init(jax.random.key(0)))
    for res in (512, 768, 1024):
        hw = res // 8
        z = jnp.zeros((1, hw, hw, 4), jnp.float32)

        @jax.jit
        def dec(p, z):
            # scalar output — fetching the decoded image through the relay
            # (~50 MB/s, 12 MB at 1024^2) would dominate the measurement
            return jnp.sum(vae.decode(p, z).astype(jnp.float32))

        np.asarray(dec(vparams, z))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(dec(vparams, z))
            best = min(best, time.perf_counter() - t0)
        out["standalone"]["postprocessing"][str(res)] = round(best, 4)
        out["post_batch_latency"][str(res)] = [round(best, 4)]
        print(f"vae {res}: {best*1e3:.1f} ms", flush=True)

    path = os.path.join("exp", "profile_sdxl_v5e.json")
    os.makedirs("exp", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
