"""Mixed-resolution patch batching correctness: patched == dense, exactly.

The decisive property the reference never tested: running a mixed-resolution
patch batch through the UNet must produce (to float tolerance) the SAME
output as running each image densely on its own.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sduss_tpu.models import layers as L
from sduss_tpu.models.unet import TINY_UNET, UNet2DConditionModel
from sduss_tpu.ops import patching
from sduss_tpu.ops.patch_ctx import PatchContext

PATCH_BUCKETS = (4, 8, 16, 32, 64)
IMAGE_BUCKETS = (2, 4, 8, 16)
CELLS = 8  # 64px patches at vae_scale 8


def _meta(grids):
    return patching.build_meta(tuple(grids), CELLS, PATCH_BUCKETS, IMAGE_BUCKETS)


class TestMeta:
    def test_counts_and_padding(self):
        m = _meta([2, 4])  # 4 + 16 = 20 patches -> pad 32
        assert m.n_patches == 20
        assert m.p_pad == 32
        assert m.i_pad == 4  # 2 real + dummy -> bucket 4
        assert m.max_pp == 16
        assert (m.image_id[:4] == 0).all() and (m.image_id[4:20] == 1).all()
        assert (m.image_id[20:] == m.i_pad - 1).all()

    def test_neighbors_2x2(self):
        m = _meta([2])
        # patch layout: 0 1 / 2 3 ; order U D L R UL UR DL DR
        np.testing.assert_array_equal(m.neighbors[0], [-1, 2, -1, 1, -1, -1, -1, 3])
        np.testing.assert_array_equal(m.neighbors[3], [1, -1, 2, -1, 0, -1, -1, -1])

    def test_group_roundtrip(self):
        m = _meta([2, 3])
        for p in range(m.n_patches):
            assert m.group_gather[m.patch_pos[p]] == p

    def test_double_meta_offsets(self):
        m1 = _meta([2])
        m2 = patching.double_meta((2,), CELLS, PATCH_BUCKETS, IMAGE_BUCKETS)
        assert m2.p_pad == 2 * m1.p_pad
        assert m2.i_pad == 2 * m1.i_pad
        np.testing.assert_array_equal(m2.image_id[m1.p_pad:][:4],
                                      m1.image_id[:4] + m1.i_pad)


class TestHalo:
    def test_halo_matches_dense_padding(self):
        rng = np.random.default_rng(0)
        g, s, c = 2, CELLS, 3
        img = jnp.asarray(rng.standard_normal((1, g * s, g * s, c)), jnp.float32)
        m = _meta([g])
        patches = patching.split_latent(img, s)
        # pad patch axis to p_pad
        pad = jnp.zeros((m.p_pad - patches.shape[0], s, s, c))
        hal = patching.haloed(jnp.concatenate([patches, pad]), jnp.asarray(m.neighbors))
        dense_pad = jnp.pad(img[0], [(1, 1), (1, 1), (0, 0)])
        for p in range(g * g):
            i, j = divmod(p, g)
            want = dense_pad[i * s : i * s + s + 2, j * s : j * s + s + 2]
            np.testing.assert_array_equal(np.asarray(hal[p]), np.asarray(want))

    def test_split_merge_roundtrip(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.standard_normal((1, 24, 24, 5)), jnp.float32)
        patches = patching.split_latent(img, 8)
        back = patching.merge_patches(patches, 3)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def _patched_vs_dense(grids, seed=0):
    """Run tiny UNet densely per image and as one patch batch; compare."""
    rng = np.random.default_rng(seed)
    model = UNet2DConditionModel(TINY_UNET)
    params = model.init(jax.random.key(0))
    s = CELLS
    n_img = len(grids)
    images = [jnp.asarray(rng.standard_normal((1, g * s, g * s, 4)), jnp.float32)
              for g in grids]
    t = jnp.asarray(rng.uniform(1, 999, (n_img,)), jnp.float32)
    ehs = jnp.asarray(rng.standard_normal((n_img, 7, 32)), jnp.float32)

    dense = [model.apply(params, images[i], t[i : i + 1], ehs[i : i + 1])
             for i in range(n_img)]

    m = _meta(list(grids))
    ctx = PatchContext(m)
    parts = [patching.split_latent(im, s) for im in images]
    x = jnp.concatenate(parts, axis=0)
    if x.shape[0] < m.p_pad:
        x = jnp.concatenate([x, jnp.zeros((m.p_pad - x.shape[0], s, s, 4))], axis=0)
    t_pad = jnp.concatenate([t, jnp.zeros((m.i_pad - n_img,))])
    ehs_pad = jnp.concatenate([ehs, jnp.zeros((m.i_pad - n_img, 7, 32))])
    out = model.apply(params, x, t_pad, ehs_pad, ctx=ctx)

    off = 0
    for i, g in enumerate(grids):
        got = patching.merge_patches(out[off : off + g * g], g)
        off += g * g
        np.testing.assert_allclose(np.asarray(got), np.asarray(dense[i]),
                                   rtol=5e-3, atol=5e-4)


def test_patched_equals_dense_single_image():
    _patched_vs_dense([2])


def test_patched_equals_dense_mixed_resolutions():
    _patched_vs_dense([2, 4])


def test_patched_equals_dense_three_images():
    _patched_vs_dense([2, 2, 4], seed=3)


def test_patch_group_norm_exact():
    rng = np.random.default_rng(0)
    m = _meta([2, 4])
    ctx = PatchContext(m)
    c = 16
    imgs = [jnp.asarray(rng.standard_normal((1, 16, 16, c)), jnp.float32),
            jnp.asarray(rng.standard_normal((1, 32, 32, c)), jnp.float32)]
    p = L.group_norm_init(c)
    parts = [patching.split_latent(im, 8) for im in imgs]
    x = jnp.concatenate(parts + [jnp.zeros((m.p_pad - 20, 8, 8, c))], axis=0)
    got = ctx.group_norm(p, x, groups=4, eps=1e-5, act="silu", lvl=0)
    off = 0
    for im, g in zip(imgs, [2, 4]):
        want = L.group_norm(p, im, num_groups=4, eps=1e-5, act="silu")
        merged = patching.merge_patches(got[off : off + g * g], g)
        off += g * g
        np.testing.assert_allclose(np.asarray(merged), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


class TestCompactSubmeta:
    def test_exact_fit_and_class_order(self):
        m = _meta([2, 2, 4, 4])
        sub, caps = patching.compact_submeta(m.patch_cells, m.class_info, 0.5)
        # classes largest first: (4, ipc4), (2, ipc2); capacity >= 1 each
        assert caps == tuple(max(1, round(ipc * 0.5))
                             for _, ipc in m.class_info)
        grids = []
        for (g, _), c in zip(m.class_info, caps):
            grids += [g] * c
        assert sub.grids == tuple(grids)
        # exact fit: no patch padding, no dummy image
        assert sub.p_pad == sub.n_patches == sum(g * g for g in grids)
        assert sub.i_pad == sub.n_images == len(grids)

    def test_full_fraction_covers_all_images(self):
        m = _meta([2, 4])
        sub, caps = patching.compact_submeta(m.patch_cells, m.class_info, 1.0)
        assert sum(caps) == sum(ipc for _, ipc in m.class_info)

    def test_cached_identity(self):
        m = _meta([2, 4])
        a = patching.compact_submeta(m.patch_cells, m.class_info, 0.5)
        b = patching.compact_submeta(m.patch_cells, m.class_info, 0.5)
        assert a[0] is b[0]  # lru-cached: stable trace constants


def test_meta_full_ceiling_overflow_is_loose():
    """Full-ceiling mixed batches must not crash meta construction: the
    dummy slot (+1 image) and CFG class doubling legitimately exceed the
    admission buckets (engine clamps real request counts elsewhere)."""
    from sduss_tpu.ops import patching

    # 2 images at the bucket ceiling 2, patch padding forces a dummy slot
    m = patching.build_meta((1, 2), 16, (4, 8, 16, 32), (1, 2))
    assert m.i_pad >= 3
    # doubled: the 5-slot class becomes 10 > buckets[-1] = 8
    grids = (2, 2, 2, 2, 2, 1, 1, 1)
    d = patching.double_meta(grids, 16, (4, 8, 16, 32, 64), (2, 4, 8))
    assert d.n_images == 16


def test_patched_equals_dense_over_ceiling_class():
    """A class whose slot count exceeds the largest image bucket (loose
    _bucket path: dummy/full-ceiling compositions) stays numerically exact."""
    rng = np.random.default_rng(5)
    model = UNet2DConditionModel(TINY_UNET)
    params = model.init(jax.random.key(0))
    s = CELLS
    grids = [1, 1, 1]
    images = [jnp.asarray(rng.standard_normal((1, g * s, g * s, 4)), jnp.float32)
              for g in grids]
    t = jnp.asarray(rng.uniform(1, 999, (3,)), jnp.float32)
    ehs = jnp.asarray(rng.standard_normal((3, 7, 32)), jnp.float32)
    dense = [model.apply(params, images[i], t[i : i + 1], ehs[i : i + 1])
             for i in range(3)]

    # image_buckets (1, 2): 3 same-class slots exceed the largest bucket
    m = patching.build_meta(tuple(grids), s, PATCH_BUCKETS, (1, 2))
    ctx = PatchContext(m)
    parts = [patching.split_latent(im, s) for im in images]
    x = jnp.concatenate(parts, axis=0)
    if x.shape[0] < m.p_pad:
        x = jnp.concatenate([x, jnp.zeros((m.p_pad - x.shape[0], s, s, 4))], axis=0)
    t_pad = jnp.concatenate([t, jnp.zeros((m.i_pad - 3,))])
    ehs_pad = jnp.concatenate([ehs, jnp.zeros((m.i_pad - 3, 7, 32))])
    out = model.apply(params, x, t_pad, ehs_pad, ctx=ctx)
    for i in range(3):
        got = patching.merge_patches(out[i : i + 1], 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(dense[i]),
                                   rtol=5e-3, atol=5e-4)
