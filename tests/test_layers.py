"""Primitive numerics vs torch: conv2d, group/layer norm, attention.

The reference leans on torch/diffusers for all of these; our functional
primitives (models/layers.py) must match torch's reference semantics exactly
(padding placement, normalization statistics, softmax attention).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from sduss_tpu.models import layers as L  # noqa: E402


def rngs(*shapes, seed=0):
    r = np.random.default_rng(seed)
    return [r.standard_normal(s).astype(np.float32) for s in shapes]


class TestConv:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_conv2d_matches_torch(self, stride):
        x, w, b = rngs((2, 13, 13, 5), (3, 3, 5, 7), (7,))
        got = np.asarray(L.conv2d({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                                  jnp.asarray(x), stride=stride))
        want = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        torch.from_numpy(w.transpose(3, 2, 0, 1)),
                        torch.from_numpy(b), stride=stride, padding=1)
        want = want.numpy().transpose(0, 2, 3, 1)
        if stride == 1:
            np.testing.assert_allclose(got, want, atol=1e-4)
        else:
            # torch pads symmetrically; our explicit padding matches it
            np.testing.assert_allclose(got, want, atol=1e-4)

    def test_conv1x1(self):
        x, w, b = rngs((2, 8, 8, 4), (1, 1, 4, 6), (6,))
        got = np.asarray(L.conv2d({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                                  jnp.asarray(x)))
        want = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        torch.from_numpy(w.transpose(3, 2, 0, 1)),
                        torch.from_numpy(b)).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestNorms:
    def test_group_norm_matches_torch(self):
        (x,) = rngs((2, 6, 6, 8))
        scale, bias = rngs((8,), (8,), seed=1)
        got = np.asarray(L.group_norm(
            {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
            jnp.asarray(x), num_groups=4))
        want = F.group_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)), 4,
                            torch.from_numpy(scale), torch.from_numpy(bias),
                            eps=1e-5).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_group_norm_silu(self):
        (x,) = rngs((1, 4, 4, 8))
        p = {"scale": jnp.ones(8), "bias": jnp.zeros(8)}
        got = np.asarray(L.group_norm(p, jnp.asarray(x), 4, act="silu"))
        plain = torch.from_numpy(np.asarray(L.group_norm(p, jnp.asarray(x), 4)))
        want = F.silu(plain).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_layer_norm_matches_torch(self):
        (x,) = rngs((3, 5, 16))
        scale, bias = rngs((16,), (16,), seed=2)
        got = np.asarray(L.layer_norm(
            {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}, jnp.asarray(x)))
        want = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(scale),
                            torch.from_numpy(bias), eps=1e-5).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_rms_norm(self):
        (x,) = rngs((2, 4, 8))
        scale = np.abs(rngs((8,), seed=3)[0])
        got = np.asarray(L.rms_norm({"scale": jnp.asarray(scale)}, jnp.asarray(x)))
        want = (x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6)) * scale
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestAttention:
    def test_attention_matches_torch_sdpa(self):
        q, k, v = rngs((2, 10, 32), (2, 14, 32), (2, 14, 32))
        heads = 4
        got = np.asarray(L.attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), heads))

        def split(x):
            b, l, d = x.shape
            return torch.from_numpy(x).reshape(b, l, heads, d // heads).transpose(1, 2)

        want = F.scaled_dot_product_attention(split(q), split(k), split(v))
        want = want.transpose(1, 2).reshape(2, 10, 32).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_attention_blocked_matches_dense(self):
        """q-row-blocked attention (VAE mid block at big decode shapes) is
        exact vs the dense path, including ragged last blocks."""
        for lq in (7, 16, 37):
            q, k, v = rngs((2, lq, 32), (2, 14, 32), (2, 14, 32), seed=lq)
            want = np.asarray(L.attention(jnp.asarray(q), jnp.asarray(k),
                                          jnp.asarray(v), 4))
            got = np.asarray(L.attention_blocked(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 4,
                block_q=8))
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_masked_attention_excludes_masked_keys(self):
        from sduss_tpu.ops.attention import masked_attention

        q, k, v = rngs((1, 4, 16), (1, 8, 16), (1, 8, 16))
        mask = np.zeros((1, 8), bool)
        mask[0, :5] = True
        got = np.asarray(masked_attention(jnp.asarray(q), jnp.asarray(k),
                                          jnp.asarray(v), 2,
                                          kv_token_mask=jnp.asarray(mask)))
        want = np.asarray(L.attention(jnp.asarray(q), jnp.asarray(k[:, :5]),
                                      jnp.asarray(v[:, :5]), 2))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_geglu_matches_torch(self):
        (x,) = rngs((2, 3, 8))
        w, b = rngs((8, 16), (16,), seed=4)
        got = np.asarray(L.geglu({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                                 jnp.asarray(x)))
        h = torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(b)
        a, g = h.chunk(2, dim=-1)
        want = (a * F.gelu(g)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestFullSizeShapes:
    """Primitive semantics at real deployment shapes (round-1 verdict #6:
    torch spot-checks must also cover full-size conv/linear/norm shapes,
    where padding/layout bugs can hide behind small-shape symmetry)."""

    def test_conv2d_sdxl_shape_matches_torch(self):
        # SDXL down_blocks.1 conv: 320->640 at 64x64 latent cells
        x, w, b = rngs((1, 64, 64, 320), (3, 3, 320, 640), (640,))
        got = np.asarray(L.conv2d({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                                  jnp.asarray(x)))
        want = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        torch.from_numpy(w.transpose(3, 2, 0, 1)),
                        torch.from_numpy(b), padding=1)
        np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                                   rtol=2e-4, atol=2e-3)

    def test_linear_mmdit_shape_matches_torch(self):
        # MMDiT qkv projection: 1536->1536 over 4096 joint tokens
        x, w, b = rngs((1, 4096, 1536), (1536, 1536), (1536,))
        got = np.asarray(L.linear({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                                  jnp.asarray(x)))
        want = torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(b)
        np.testing.assert_allclose(got, want.numpy(), rtol=2e-4, atol=2e-3)

    def test_group_norm_unet_shape_matches_torch(self):
        # UNet groupnorm: 32 groups over 1280 channels at 32x32
        x, sc, b = rngs((2, 32, 32, 1280), (1280,), (1280,))
        got = np.asarray(L.group_norm({"scale": jnp.asarray(sc), "bias": jnp.asarray(b)},
                                      jnp.asarray(x), 32, 1e-5))
        want = F.group_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)), 32,
                            torch.from_numpy(sc), torch.from_numpy(b), 1e-5)
        np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                                   rtol=2e-4, atol=2e-3)
