"""Shared utilities."""

from __future__ import annotations


def random_params(model, seed: int = 0, dtype=None):
    """Device-side param generation directly in ``dtype`` — no staging copy.

    ``init`` materializes fp32 params (10.3 GB for SDXL's UNet) before
    casting — past a v5e chip's HBM alongside the bf16 copy.  Instead take
    the param tree structure from eval_shape and jit a generator producing
    every leaf directly in the target dtype on device.  For benchmarks,
    compile checks and weight-less serving where values are irrelevant.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    dtype = dtype or jnp.bfloat16
    shapes = jax.eval_shape(model.init, jax.random.key(seed))
    flat, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def make(seed_arr):
        key = jax.random.key(seed_arr[0])
        leaves = [
            jax.random.normal(jax.random.fold_in(key, i), s.shape, dtype) * 0.02
            for i, s in enumerate(flat)
        ]
        return jax.tree.unflatten(treedef, leaves)

    return make(np.asarray([seed], np.uint32))


def random_params_bf16(model, seed: int = 0):
    import jax.numpy as jnp

    return random_params(model, seed, jnp.bfloat16)


def set_random_seed(seed: int) -> None:
    """Seed numpy's global RNG (reference model_executor/utils set_random_seed)."""
    import numpy as np

    np.random.seed(seed)
