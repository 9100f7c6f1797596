"""SDXL step decomposition on chip (fetch-corrected: in-graph chains, scalar
outputs). Maps where the 1024^2 batch-8 CFG step's time lives:

  level0 (128x128, 320ch): resnet convs only, 3+3 blocks up/down
  level1 (64x64, 640ch):   resnets + 2-layer transformers x (2+3), attn S=4096
  level2 (32x32, 1280ch):  resnets + 10-layer transformers x (2+3+mid), S=1024

Per-op times x in-model counts -> step budget vs the measured 1182 ms.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def timeit(fn, x, *rest, n=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x, *rest):
        for _ in range(n):
            x = fn(x, *rest)
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

    from sduss_tpu.models import layers as L

    rng = np.random.default_rng(0)
    results = {}
    B = 16  # batch 8 + CFG

    def mk(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    # -- 3x3 convs per level (the resnet body) --------------------------------
    # counts: conv pairs per resnet; resnets per level (down+up+mid)
    conv_cases = {
        # (hw, cin, cout, convs_per_step)
        "conv_l0_320": (128, 320, 320, 2 * (2 + 3)),       # level0 resnets x2 convs
        "conv_l1_640": (64, 640, 640, 2 * (2 + 3)),
        "conv_l2_1280": (32, 1280, 1280, 2 * (2 + 3 + 2)),
    }
    for name, (hw, cin, cout, count) in conv_cases.items():
        x = mk((B, hw, hw, cin))
        p = {"kernel": mk((3, 3, cin, cout)) * 0.02, "bias": jnp.zeros((cout,), jnp.bfloat16)}

        def f(x, p=p):
            return L.conv2d(p, x)

        t = timeit(f, x)
        fl = 2 * B * hw * hw * 9 * cin * cout
        results[f"{name}_ms"] = round(t * 1e3, 3)
        results[f"{name}_tflops"] = round(fl / t / 1e12, 1)
        results[f"{name}_step_ms"] = round(t * 1e3 * count, 1)
        print(f"{name}: {t*1e3:.3f} ms ({fl/t/1e12:.1f} TF/s) x{count} = "
              f"{t*1e3*count:.0f} ms/step", flush=True)

    # -- group norm + silu (per resnet: 2; per transformer: 1) ----------------
    for name, (hw, c) in {"gn_l0": (128, 320), "gn_l1": (64, 640),
                          "gn_l2": (32, 1280)}.items():
        x = mk((B, hw, hw, c))
        p = {"scale": jnp.ones((c,), jnp.bfloat16), "bias": jnp.zeros((c,), jnp.bfloat16)}

        def f(x, p=p):
            return L.group_norm(p, x, 32, 1e-5, act="silu")

        t = timeit(f, x)
        results[f"{name}_ms"] = round(t * 1e3, 3)
        print(f"{name}: {t*1e3:.3f} ms", flush=True)

    # -- transformer FFN (geglu) at lvl1/lvl2 ---------------------------------
    for name, (s, c, count) in {"ffn_l1": (4096, 640, 10),
                                "ffn_l2": (1024, 1280, 61)}.items():
        x = mk((B, s, c))
        p1 = {"kernel": mk((c, 8 * c)) * 0.02, "bias": jnp.zeros((8 * c,), jnp.bfloat16)}
        p2 = {"kernel": mk((4 * c, c)) * 0.02, "bias": jnp.zeros((c,), jnp.bfloat16)}

        def f(x, p1=p1, p2=p2):
            h = L.linear(p1, x)
            a, b_ = jnp.split(h, 2, axis=-1)
            h = a * jax.nn.gelu(b_.astype(jnp.float32)).astype(a.dtype)
            return L.linear(p2, h)

        t = timeit(f, x)
        fl = 2 * B * s * c * 8 * c + 2 * B * s * 4 * c * c
        results[f"{name}_ms"] = round(t * 1e3, 3)
        results[f"{name}_tflops"] = round(fl / t / 1e12, 1)
        results[f"{name}_step_ms"] = round(t * 1e3 * count, 1)
        print(f"{name}: {t*1e3:.3f} ms ({fl/t/1e12:.1f} TF/s) x{count} = "
              f"{t*1e3*count:.0f} ms/step", flush=True)

    # -- attention (self+cross) at lvl1/lvl2, through the real dispatch -------
    from sduss_tpu.ops.attention import masked_attention

    for name, (s, c, h, count) in {"attn_l1": (4096, 640, 10, 10),
                                   "attn_l2": (1024, 1280, 20, 61)}.items():
        q = mk((B, s, c))

        def f(q, h=h):
            return masked_attention(q, q, q, h)

        t = timeit(f, q)
        results[f"{name}_ms"] = round(t * 1e3, 3)
        results[f"{name}_step_ms"] = round(t * 1e3 * count, 1)
        print(f"{name}: {t*1e3:.3f} ms x{count} = {t*1e3*count:.0f} ms/step",
              flush=True)

        kv = mk((B, 77, c))

        def fx(q, kv, h=h):
            return masked_attention(q, kv, kv, h)

        t = timeit(fx, q, kv)
        results[f"x{name}_ms"] = round(t * 1e3, 3)
        results[f"x{name}_step_ms"] = round(t * 1e3 * count, 1)
        print(f"x{name}: {t*1e3:.3f} ms x{count} = {t*1e3*count:.0f} ms/step",
              flush=True)

    with open("exp/bench_sdxl_ops_v5e.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
