"""Measure VAE decode latency per dtype on the real chip; update the profile.

fp32 numbers in exp/profile_sdxl_v5e.json were measured before the bf16
decode path landed; this re-measures postprocessing with bf16 (the serving
default on TPU) and rewrites the profile's post entries.
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

    from sduss_tpu.models.vae import SDXL_VAE, AutoencoderKL

    vae = AutoencoderKL(SDXL_VAE)
    params = vae.init(jax.random.key(0))
    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    results = {}
    for res in (512, 768, 1024):
        hw = res // 8
        z = jnp.zeros((1, hw, hw, 4), jnp.float32)

        @jax.jit
        def dec_bf16(p, z):
            # scalar output: image fetch through the relay (~50 MB/s) would
            # dominate — a 1024^2 decode is ~6 MB, ~120 ms of pure download
            return jnp.sum(vae.decode(p, z, dtype=jnp.bfloat16)
                           .astype(jnp.float32))

        np.asarray(dec_bf16(params_bf16, z))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(dec_bf16(params_bf16, z))
            best = min(best, time.perf_counter() - t0)
        results[str(res)] = round(best, 4)
        print(f"vae bf16 {res}: {best*1e3:.1f} ms (device compute)", flush=True)

    path = os.path.join("exp", "profile_sdxl_v5e.json")
    if os.path.exists(path):
        with open(path) as f:
            prof = json.load(f)
        prof["standalone"]["postprocessing"] = results
        prof["post_batch_latency"] = {k: [v] for k, v in results.items()}
        with open(path, "w") as f:
            json.dump(prof, f, indent=2)
        print(f"updated {path}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
