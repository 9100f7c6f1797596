"""Custom flash-attention kernel vs dense reference (interpret mode on CPU)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from sduss_tpu.ops.attention import _dense_masked
from sduss_tpu.ops.flash import flash_mha


def _mk(b, lq, lk, dm, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, lq, dm)), dtype)
    k = jnp.asarray(rng.standard_normal((b, lk, dm)), dtype)
    v = jnp.asarray(rng.standard_normal((b, lk, dm)), dtype)
    return q, k, v


@pytest.mark.parametrize("lq,lk,heads", [
    (256, 256, 2),      # aligned, multi-tile
    (384, 250, 2),      # ragged kv -> masked epilogue tile
    (130, 130, 1),      # ragged q and kv, single partial tile
    (256, 384, 2),      # 128-aligned kv NOT block_kv-aligned: two-pass pads
                        # to 384 (nobias), online to 512 (SD3-joint shape
                        # class — 4480 = 35x128)
])
@pytest.mark.parametrize("online", [False, True])
def test_flash_matches_dense(lq, lk, heads, online):
    dm = heads * 64
    q, k, v = _mk(2, lq, lk, dm)
    scale = 1.0 / math.sqrt(64)
    ref = _dense_masked(q, k, v, heads, None, scale)
    out = flash_mha(q, k, v, heads, scale, block_q=128, block_kv=128,
                    interpret=True, force_online=online)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("online", [False, True])
def test_flash_runtime_mask_matches_dense(online):
    heads, dm = 2, 128
    q, k, v = _mk(3, 256, 256, dm, seed=1)
    rng = np.random.default_rng(2)
    mask = jnp.asarray(rng.random((3, 256)) > 0.3)
    scale = 1.0 / math.sqrt(64)
    ref = _dense_masked(q, k, v, heads, mask, scale)
    out = flash_mha(q, k, v, heads, scale, kv_mask=mask,
                    block_q=128, block_kv=128, interpret=True,
                    force_online=online)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_bf16_close_to_f32_dense():
    heads, dm = 4, 256
    q, k, v = _mk(1, 512, 512, dm, seed=3, dtype=jnp.bfloat16)
    scale = 1.0 / math.sqrt(64)
    ref = _dense_masked(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), heads, None, scale)
    out = flash_mha(q, k, v, heads, scale, interpret=True,
                    block_q=256, block_kv=256)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
    assert err < 0.05, err


@pytest.mark.parametrize("hd,heads", [(40, 2), (80, 2), (160, 2)])
def test_flash_sd15_head_dims(hd, heads):
    """SD-1.5 uses head dims 40/80/160 (not 64); the kernel is generic."""
    dm = heads * hd
    q, k, v = _mk(2, 256, 256, dm, seed=7)
    scale = 1.0 / math.sqrt(hd)
    ref = _dense_masked(q, k, v, heads, None, scale)
    out = flash_mha(q, k, v, heads, scale, block_q=128, block_kv=128,
                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("lq,lk,heads,hd", [
    (512, 77, 4, 64),    # SDXL-style text KV, ragged -> masked pad cols
    (640, 128, 2, 64),   # aligned kv, ragged q tile
    (512, 77, 4, 40),    # SD1.5 head dim (lane slices off 128 alignment)
])
def test_cross_short_matches_dense(lq, lk, heads, hd):
    from sduss_tpu.ops.flash import flash_cross_short

    dm = heads * hd
    q, k, v = _mk(3, lq, lk, dm, seed=5)
    scale = 1.0 / math.sqrt(hd)
    ref = _dense_masked(q, k, v, heads, None, scale)
    out = flash_cross_short(q, k, v, heads, scale, block_q=256,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("b,lq,lk,heads,hd", [
    (2, 512, 512, 4, 64),    # aligned multi-head
    (2, 640, 250, 2, 64),    # ragged q and kv
    (1, 256, 256, 8, 40),    # SD1.5 head dim
])
def test_mha_fused_matches_dense(b, lq, lk, heads, hd):
    from sduss_tpu.ops.flash import flash_mha_fused

    dm = heads * hd
    q, k, v = _mk(b, lq, lk, dm, seed=7)
    scale = 1.0 / math.sqrt(hd)
    ref = _dense_masked(q, k, v, heads, None, scale)
    out = flash_mha_fused(q, k, v, heads, scale, block_q=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


class TestHeadPipelining:
    """The head-software-pipelined schedules (pipe=True) are pure
    instruction reorderings — results must be bit-identical in value to the
    sequential schedule and equal to dense."""

    @pytest.mark.parametrize("lq,lk,heads", [
        (256, 256, 4),       # aligned -> nobias kernel, hb>1
        (384, 250, 4),       # ragged kv -> bias kernel
    ])
    def test_flash_mha_pipeline_matches_dense(self, lq, lk, heads):
        dm = heads * 64
        q, k, v = _mk(2, lq, lk, dm, seed=11)
        scale = 1.0 / math.sqrt(64)
        ref = _dense_masked(q, k, v, heads, None, scale)
        out = flash_mha(q, k, v, heads, scale, block_q=128, block_kv=128,
                        heads_per_cell=4, interpret=True, pipeline=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        seq = flash_mha(q, k, v, heads, scale, block_q=128, block_kv=128,
                        heads_per_cell=4, interpret=True, pipeline=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))

    def test_flash_mha_runtime_mask_pipeline(self):
        heads, dm = 4, 256
        q, k, v = _mk(2, 256, 256, dm, seed=12)
        rng = np.random.default_rng(13)
        mask = jnp.asarray(rng.random((2, 256)) > 0.3)
        scale = 1.0 / math.sqrt(64)
        ref = _dense_masked(q, k, v, heads, mask, scale)
        out = flash_mha(q, k, v, heads, scale, kv_mask=mask, block_q=128,
                        block_kv=128, heads_per_cell=2, interpret=True,
                        pipeline=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("b,lq,lk,heads,hd", [
        (2, 512, 512, 4, 64),
        (2, 640, 250, 2, 64),
    ])
    def test_mha_fused_pipeline_matches_dense(self, b, lq, lk, heads, hd):
        from sduss_tpu.ops.flash import flash_mha_fused

        dm = heads * hd
        q, k, v = _mk(b, lq, lk, dm, seed=14)
        scale = 1.0 / math.sqrt(hd)
        ref = _dense_masked(q, k, v, heads, None, scale)
        out = flash_mha_fused(q, k, v, heads, scale, block_q=256,
                              interpret=True, pipeline=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        seq = flash_mha_fused(q, k, v, heads, scale, block_q=256,
                              interpret=True, pipeline=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))


class TestBf16Scores:
    """Opt-in bf16 score tiles: ~8-bit-mantissa logits, so outputs track
    the f32 kernel to ~1e-2 — bounded here; perf measured on chip."""

    def test_nobias_bf16_scores_close(self):
        heads, dm = 4, 256
        q, k, v = _mk(2, 256, 256, dm, seed=21)
        scale = 1.0 / math.sqrt(64)
        ref = _dense_masked(q, k, v, heads, None, scale)
        out = flash_mha(q, k, v, heads, scale, block_q=128, block_kv=128,
                        interpret=True, bf16_scores=True)
        err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
        assert err < 0.05, err

    def test_fused_bf16_scores_close(self):
        from sduss_tpu.ops.flash import flash_mha_fused

        heads, dm = 4, 256
        q, k, v = _mk(2, 512, 250, dm, seed=22)  # ragged -> masked cols
        scale = 1.0 / math.sqrt(64)
        ref = _dense_masked(q, k, v, heads, None, scale)
        out = flash_mha_fused(q, k, v, heads, scale, block_q=256,
                              interpret=True, bf16_scores=True)
        err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
        assert err < 0.05, err
