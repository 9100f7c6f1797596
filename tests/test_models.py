"""Shape/finiteness/jit smoke tests for the denoisers and VAE (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sduss_tpu.models.mmdit import TINY_MMDIT, SD3Transformer2DModel
from sduss_tpu.models.unet import TINY_SDXL_UNET, TINY_UNET, UNet2DConditionModel
from sduss_tpu.models.vae import TINY_VAE, AutoencoderKL


def test_unet_sd15_shapes():
    model = UNet2DConditionModel(TINY_UNET)
    params = model.init(jax.random.key(0))
    x = jnp.ones((2, 32, 32, 4), jnp.float32)
    t = jnp.asarray([10.0, 500.0])
    ehs = jnp.ones((2, 7, 32), jnp.float32)
    out = jax.jit(model.apply)(params, x, t, ehs)
    assert out.shape == (2, 32, 32, 4)
    assert bool(jnp.isfinite(out).all())


def test_unet_sdxl_shapes_with_added_cond():
    model = UNet2DConditionModel(TINY_SDXL_UNET)
    params = model.init(jax.random.key(0))
    x = jnp.ones((2, 16, 16, 4), jnp.float32)
    t = jnp.asarray([10.0, 500.0])
    ehs = jnp.ones((2, 7, 32), jnp.float32)
    added = {"text_embeds": jnp.ones((2, 48)), "time_ids": jnp.ones((2, 6))}
    out = jax.jit(model.apply)(params, x, t, ehs, added_cond=added)
    assert out.shape == (2, 16, 16, 4)
    assert bool(jnp.isfinite(out).all())


def test_unet_different_resolutions_same_params():
    model = UNet2DConditionModel(TINY_UNET)
    params = model.init(jax.random.key(0))
    ehs = jnp.ones((1, 7, 32), jnp.float32)
    for hw in (16, 32, 48):
        out = model.apply(params, jnp.ones((1, hw, hw, 4)), jnp.asarray([3.0]), ehs)
        assert out.shape == (1, hw, hw, 4)


def test_unet_batch_independence():
    """Per-sample outputs must not depend on batch composition (no cross-talk)."""
    model = UNet2DConditionModel(TINY_UNET)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 4)), jnp.float32)
    t = jnp.asarray([5.0, 100.0, 900.0])
    ehs = jnp.asarray(rng.standard_normal((3, 7, 32)), jnp.float32)
    full = model.apply(params, x, t, ehs)
    solo = model.apply(params, x[1:2], t[1:2], ehs[1:2])
    np.testing.assert_allclose(np.asarray(full[1]), np.asarray(solo[0]), rtol=2e-4, atol=1e-5)


def test_vae_decode_encode_shapes():
    model = AutoencoderKL(TINY_VAE)
    params = model.init(jax.random.key(0))
    lat = jnp.ones((1, 8, 8, 4), jnp.float32) * 0.1
    img = jax.jit(model.decode)(params, lat)
    # tiny cfg has 2 levels => one 2x upsample stage
    assert img.shape == (1, 16, 16, 3)
    z = model.encode(params, img)
    assert z.shape == (1, 8, 8, 4)
    assert bool(jnp.isfinite(img).all())


def test_mmdit_shapes():
    model = SD3Transformer2DModel(TINY_MMDIT)
    params = model.init(jax.random.key(0))
    x = jnp.ones((2, 16, 16, 4), jnp.float32)
    t = jnp.asarray([10.0, 500.0])
    ehs = jnp.ones((2, 9, 32), jnp.float32)
    pooled = jnp.ones((2, 32), jnp.float32)
    out = jax.jit(model.apply)(params, x, t, ehs, pooled)
    assert out.shape == (2, 16, 16, 4)
    assert bool(jnp.isfinite(out).all())


def test_mmdit_pos_embed_crop_centered():
    model = SD3Transformer2DModel(TINY_MMDIT)
    pe_8 = np.asarray(model.pos_embed(8, 8))
    full = model._pos_embed_full
    np.testing.assert_allclose(pe_8.reshape(8, 8, -1), full[12:20, 12:20], rtol=1e-6)


def test_mmdit_batch_independence():
    model = SD3Transformer2DModel(TINY_MMDIT)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([5.0, 800.0])
    ehs = jnp.asarray(rng.standard_normal((2, 9, 32)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    full = model.apply(params, x, t, ehs, pooled)
    solo = model.apply(params, x[:1], t[:1], ehs[:1], pooled[:1])
    np.testing.assert_allclose(np.asarray(full[0]), np.asarray(solo[0]), rtol=2e-4, atol=1e-5)


def test_vae_tiled_decode_matches_full():
    """Tiled decode (models/vae.py decode_tiled — the SD3 full-res HBM fix)
    approximates full-frame decode: per-tile mid attention + conv pad context
    bound the deviation; blending must keep it small and seam-free."""
    model = AutoencoderKL(TINY_VAE)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    lat = jax.image.resize(base, (1, 32, 32, 4), "linear")  # smooth field
    full = np.asarray(model.decode(params, lat), np.float32)
    tiled = np.asarray(
        jax.jit(lambda p, z: model.decode_tiled(p, z, tile=16, overlap=8))(
            params, lat), np.float32)
    assert tiled.shape == full.shape == (1, 64, 64, 3)
    assert np.isfinite(tiled).all()
    scale = np.abs(full).max()
    assert np.abs(tiled - full).mean() / scale < 0.06
    # borders renormalize to weight 1: no vignetting at the frame edge
    assert np.abs(tiled[:, 0, :, :] - full[:, 0, :, :]).mean() / scale < 0.2


def test_vae_tiled_decode_strip_vs_2d():
    """Row-strip tiling (the 1024^2 default: ~1.25x dense compute vs 2.25x
    for 2D tiles at the same HBM envelope) matches full decode as well as
    the 2D tiling does, on square AND non-square latents."""
    model = AutoencoderKL(TINY_VAE)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(2)
    for shape in ((1, 32, 32, 4), (1, 48, 24, 4)):
        base = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
        lat = jax.image.resize(base, shape, "linear")
        full = np.asarray(model.decode(params, lat), np.float32)
        scale = np.abs(full).max()
        for strips in (True, False):
            tiled = np.asarray(model.decode_tiled(
                params, lat, tile=16, overlap=8, strips=strips), np.float32)
            assert tiled.shape == full.shape
            assert np.isfinite(tiled).all()
            assert np.abs(tiled - full).mean() / scale < 0.06, (shape, strips)


def test_vae_blocked_mid_attention_exact(monkeypatch):
    """SDUSS_VAE_BLOCKED_ATTN=1 routes the mid attention through the
    q-row-blocked exact path (>=4k tokens); decode output is identical."""
    model = AutoencoderKL(TINY_VAE)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 72, 72, 4)), jnp.float32)
    monkeypatch.setenv("SDUSS_VAE_BLOCKED_ATTN", "0")
    dense = np.asarray(model.decode(params, lat), np.float32)
    monkeypatch.setenv("SDUSS_VAE_BLOCKED_ATTN", "1")
    blocked = np.asarray(model.decode(params, lat), np.float32)
    np.testing.assert_allclose(blocked, dense, atol=1e-5, rtol=1e-5)


def test_vae_tiled_decode_small_input_passthrough():
    model = AutoencoderKL(TINY_VAE)
    params = model.init(jax.random.key(0))
    lat = jnp.ones((1, 8, 8, 4), jnp.float32) * 0.1
    a = np.asarray(model.decode(params, lat))
    b = np.asarray(model.decode_tiled(params, lat, tile=16))
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
