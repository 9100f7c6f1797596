"""Delivered-peak probe for the attached TPU: big matmuls, several accum
dtypes/sizes. Sets the realistic utilization denominator for kernel targets."""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    rng = np.random.default_rng(0)
    results = {}
    for size, acc in [(2048, "bf16"), (4096, "bf16"), (4096, "f32"),
                      (8192, "bf16")]:
        a = jnp.asarray(rng.standard_normal((size, size)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((size, size)), jnp.bfloat16)
        pet = jnp.bfloat16 if acc == "bf16" else jnp.float32

        @jax.jit
        def chained(x, y, pet=pet):
            for _ in range(8):
                x = jnp.dot(x, y, preferred_element_type=pet).astype(jnp.bfloat16)
            # scalar output: the axon relay downloads results at ~50 MB/s, so
            # fetching the full matrix would dominate the measurement
            return jnp.sum(x.astype(jnp.float32))

        out = chained(a, b)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = chained(a, b)
        np.asarray(out)
        t = (time.perf_counter() - t0) / 24
        tf = 2 * size**3 / t / 1e12
        results[f"mm{size}_{acc}_tflops"] = round(tf, 1)
        print(f"mm {size} {acc}: {t*1e3:.3f} ms = {tf:.1f} TFLOP/s", flush=True)

    with open("exp/bench_peak_v5e.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
