"""MXU efficiency diagnostic: what do d=64 attention-shaped matmuls achieve?

Pins the floor for the attention kernel: if (512,64)@(64,4608) style matmuls
run far below peak, the kernel is matmul-bound and needs shape changes, not
softmax tricks.
"""

from __future__ import annotations

import json
import time

import numpy as np


def timeit_chain(fn, x, *rest, n=10):
    import jax

    @jax.jit
    def chained(x, *rest):
        import jax.numpy as jnp
        for _ in range(n):
            x = fn(x, *rest)
        # scalar output: the relay downloads results at ~50 MB/s; fetching
        # the full tensor would dominate the measurement
        return jnp.sum(x.astype(jnp.float32))

    out = chained(x, *rest)
    np.asarray(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained(x, *rest)
    np.asarray(out)
    return (time.perf_counter() - t0) / (reps * n)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    rng = np.random.default_rng(0)
    results = {}

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    # peak reference: big square matmul (output feeds next -> chained)
    a = mk((4096, 4096))
    b = mk((4096, 4096))
    t = timeit_chain(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.bfloat16), a, b)
    fl = 2 * 4096**3
    results["square_4096_tflops"] = round(fl / t / 1e12, 1)
    print(f"square 4096: {t*1e3:.3f} ms = {fl/t/1e12:.1f} TFLOP/s", flush=True)

    # attention-shaped, batched over 48 heads (einsum, output recycled via pad)
    cases = {
        # QK^T: (48,512,64)@(48,4608,64)^T
        "qk_d64": ("bqd,bkd->bqk", (48, 512, 64), (48, 4608, 64)),
        # PV: (48,512,4608)@(48,4608,64)
        "pv_d64": ("bqk,bkd->bqd", (48, 512, 4608), (48, 4608, 64)),
        # what if head pairs were packed to d=128?
        "qk_d128": ("bqd,bkd->bqk", (24, 512, 128), (24, 4608, 128)),
        "pv_out128": ("bqk,bkd->bqd", (24, 512, 4608), (24, 4608, 128)),
        # full-seq q tile (no q tiling)
        "qk_d64_fullq": ("bqd,bkd->bqk", (48, 4608, 64), (48, 4608, 64)),
    }
    for name, (eq, sa, sb) in cases.items():
        x = mk(sa)
        y = mk(sb)

        def fn(x, y, eq=eq, sa=sa):
            out = jnp.einsum(eq, x, y, preferred_element_type=jnp.bfloat16)
            # feed something output-dependent back at the input shape to chain
            red = out.reshape(out.shape[0], -1)[:, :1].astype(jnp.bfloat16)
            return x + red[:, :, None] * 1e-6

        t = timeit_chain(fn, x, y)
        m, k = sa[1], sa[2]
        n = sb[1] if eq.startswith("bqd") else sb[2]
        if name.startswith("pv"):
            m, k, n = sa[1], sa[2], sb[2]
        fl = 2 * sa[0] * m * k * n
        results[f"{name}_ms"] = round(t * 1e3, 3)
        results[f"{name}_tflops"] = round(fl / t / 1e12, 1)
        print(f"{name}: {t*1e3:.3f} ms = {fl/t/1e12:.1f} TFLOP/s", flush=True)

    with open("exp/bench_mxu_v5e.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
