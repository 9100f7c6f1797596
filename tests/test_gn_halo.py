"""Fused GroupNorm+SiLU+halo Pallas kernel vs the jnp reference composition.

The kernel (ops/gn_halo.py) rebuilds the reference's norm_silu_concat.cu;
here it runs in Pallas interpret mode on the CPU mesh and must match the
unfused composition (per-image group norm + halo gather) exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sduss_tpu.ops import patching
from sduss_tpu.ops.gn_halo import gn_silu_haloed
from sduss_tpu.ops.patch_ctx import PatchContext


def make_case(grids=(2, 3), s=8, c=16, seed=0):
    meta = patching.build_meta(tuple(grids), s, (32,), (4,))
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((meta.p_pad, s, s, c)), jnp.float32)
    p = {"scale": jnp.asarray(rng.standard_normal(c), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(c), jnp.float32)}
    return meta, x, p


class TestGnHaloKernel:
    @pytest.mark.parametrize("act", ["silu", None])
    def test_kernel_matches_reference_composition(self, act):
        meta, x, p = make_case()
        groups = 4
        want = gn_silu_haloed(p, x, meta.image_id, meta.neighbors, meta.i_pad,
                              groups, 1e-5, act, force_pallas=False)
        got = gn_silu_haloed(p, x, meta.image_id, meta.neighbors, meta.i_pad,
                             groups, 1e-5, act, force_pallas=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_border_halo_is_zero(self):
        meta, x, p = make_case(grids=(2,), s=4, c=8)
        got = np.asarray(gn_silu_haloed(p, x, meta.image_id, meta.neighbors,
                                        meta.i_pad, 4, 1e-5, "silu",
                                        force_pallas=True))
        # patch 0 is top-left of a 2x2 grid: its top row and left col halos
        # are image borders -> zero
        np.testing.assert_array_equal(got[0, 0, :, :], 0.0)
        np.testing.assert_array_equal(got[0, :, 0, :], 0.0)
        # its bottom halo comes from patch 2 (below) and right from patch 1
        assert np.abs(got[0, -1, 1:-1, :]).sum() > 0
        assert np.abs(got[0, 1:-1, -1, :]).sum() > 0

    def test_bf16_path(self):
        meta, x, p = make_case(s=4, c=8)
        xb = x.astype(jnp.bfloat16)
        want = gn_silu_haloed(p, xb, meta.image_id, meta.neighbors, meta.i_pad,
                              4, 1e-5, "silu", force_pallas=False)
        got = gn_silu_haloed(p, xb, meta.image_id, meta.neighbors, meta.i_pad,
                             4, 1e-5, "silu", force_pallas=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_inside_jit_with_traced_indices(self):
        meta, x, p = make_case(s=4, c=8)
        ctx = PatchContext(meta)

        @jax.jit
        def f(p, x, image_id, neighbors):
            return gn_silu_haloed(p, x, image_id, neighbors, meta.i_pad,
                                  4, 1e-5, "silu", force_pallas=True)

        got = f(p, x, ctx.image_id, ctx.neighbors)
        want = gn_silu_haloed(p, x, meta.image_id, meta.neighbors, meta.i_pad,
                              4, 1e-5, "silu", force_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
