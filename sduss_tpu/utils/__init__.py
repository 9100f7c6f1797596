"""Shared utilities."""

from __future__ import annotations


def random_params_bf16(model, seed: int = 0):
    """Device-side bf16 param generation without an fp32 staging copy.

    ``init`` materializes fp32 params (10.3 GB for SDXL's UNet) before
    casting — past a v5e chip's HBM alongside the bf16 copy.  Instead take
    the param tree structure from eval_shape and jit a generator producing
    every leaf directly in bf16 on device.  For benchmarks/compile checks
    where weight values are irrelevant.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    shapes = jax.eval_shape(model.init, jax.random.key(seed))
    flat, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def make(seed_arr):
        key = jax.random.key(seed_arr[0])
        leaves = [
            jax.random.normal(jax.random.fold_in(key, i), s.shape, jnp.bfloat16) * 0.02
            for i, s in enumerate(flat)
        ]
        return jax.tree.unflatten(treedef, leaves)

    return make(np.asarray([seed], np.uint32))


def set_random_seed(seed: int) -> None:
    """Seed numpy's global RNG (reference model_executor/utils set_random_seed)."""
    import numpy as np

    np.random.seed(seed)
