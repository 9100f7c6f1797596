"""PatchContext: the patch-batch implementations of the UNet's spatial ops.

Plugs into UNet2DConditionModel.apply via the ctx seam (models/unet.py):
every conv/group-norm/attention/upsample call dispatches here when the batch
is a mixed-resolution patch batch.  Functional equivalents of the reference's
Patch* module wrappers:

  conv            <- PatchConv / PatchDown/Upsample2D (modules/resnet.py:249-378)
  group_norm      <- PatchGroupNorm + fused CUDA kernel (modules/groupnorm.py,
                     kernels/norm_silu_concat.cu) — here: per-image segment
                     statistics, exact across each image's patches
  self_attention  <- PatchSelfAttention regrouping (modules/attention.py:112-232)
                     — here: gather patches into per-image padded groups, one
                     masked batched attention, scatter back
  cross_attention <- PatchCrossAttention (modules/attention.py:52-110) — here:
                     per-image KV gathered to patches, exact

All shapes are static; correctness is patched == dense per image to float
tolerance (tests/test_patching.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from sduss_tpu.models import layers as L
from sduss_tpu.ops.attention import masked_attention
from sduss_tpu.ops.patching import PatchMeta, haloed


class PatchContext:
    """Bound to one PatchMeta; index arrays live on device.

    Inside jit, construct with ``arrays=`` (traced tensors) so the compiled
    function is keyed only by the meta's STATIC shape info
    (meta.compile_key) and reused across different compositions that share a
    bucket — the index values are runtime inputs, not baked constants.
    """

    def __init__(self, meta: PatchMeta, arrays: Dict[str, jnp.ndarray] = None):
        self.meta = meta
        if arrays is None:
            arrays = ctx_arrays(meta)
        self.image_id = arrays["image_id"]
        self.neighbors = arrays["neighbors"]
        self.group_gather = arrays["group_gather"]
        self.patch_pos = arrays["patch_pos"]
        self.kv_mask = arrays["kv_mask"]
        self.patch_valid = arrays["patch_valid"]
        self.class_gather = [arrays[f"class_gather_{i}"]
                             for i in range(len(meta.class_info))]
        self.class_pos = [arrays[f"class_pos_{i}"]
                          for i in range(len(meta.class_info))]
        self.class_member = [arrays[f"class_member_{i}"]
                             for i in range(len(meta.class_info))]
        self.class_kv = [arrays[f"class_kv_{i}"]
                         for i in range(len(meta.class_info))]

    # -- time embedding -----------------------------------------------------

    def broadcast_to_patches(self, temb_img: jnp.ndarray) -> jnp.ndarray:
        """(I_pad, D) per-image rows -> (P_pad, D) per-patch rows."""
        return temb_img[self.image_id]

    def per_patch(self, img_values: jnp.ndarray) -> jnp.ndarray:
        return img_values[self.image_id]

    # -- convs --------------------------------------------------------------

    def conv(self, p, x, lvl: int, stride: int = 1) -> jnp.ndarray:
        k = p["kernel"].shape[0]
        if k == 1:
            return L.conv2d(p, x, stride=stride)
        if k != 3:  # pragma: no cover
            raise NotImplementedError(f"patch conv kernel {k}")
        xh = haloed(x, self.neighbors)
        return L.conv2d(p, xh, stride=stride, padding="VALID")

    def upsample_2x(self, x, lvl: int) -> jnp.ndarray:
        return L.nearest_upsample_2x(x)

    def gn_silu_halo(self, p_gn, x, groups: int, eps: float,
                     lvl: int) -> jnp.ndarray:
        """(P, s, s, C) -> (P, s+2, s+2, C): GN+SiLU + 1-px halo ring.

        On TPU runs the fused Pallas kernel (ops/gn_halo.py — the rebuild of
        the reference norm_silu_concat.cu); elsewhere the jnp composition
        with identical semantics.
        """
        from sduss_tpu.ops.gn_halo import gn_silu_haloed

        return gn_silu_haloed(p_gn, x, self.image_id, self.neighbors,
                              self.meta.i_pad, groups, eps, "silu")

    def gn_silu_conv(self, p_gn, p_conv, x, groups: int, eps: float,
                     lvl: int) -> jnp.ndarray:
        """GroupNorm+SiLU fused into the conv's haloed input buffer."""
        k = p_conv["kernel"].shape[0]
        if k == 1:
            y = self.group_norm(p_gn, x, groups, eps, "silu", lvl)
            return L.conv2d(p_conv, y, stride=1)
        xh = self.gn_silu_halo(p_gn, x, groups, eps, lvl)
        return L.conv2d(p_conv, xh, stride=1, padding="VALID")

    # -- group norm ---------------------------------------------------------

    def group_norm(self, p, x, groups: int, eps: float, act, lvl: int) -> jnp.ndarray:
        """Per-IMAGE statistics across that image's patches (exact)."""
        pp, s, _, c = x.shape
        g = groups
        xf = x.astype(jnp.float32).reshape(pp, s * s, g, c // g)
        psum = xf.sum(axis=(1, 3))          # (P, G)
        psq = (xf * xf).sum(axis=(1, 3))    # (P, G)
        n_img = self.meta.i_pad
        sums = jax.ops.segment_sum(psum, self.image_id, num_segments=n_img)
        sqs = jax.ops.segment_sum(psq, self.image_id, num_segments=n_img)
        cnt = jax.ops.segment_sum(
            jnp.full((pp,), float(s * s * (c // g)), jnp.float32),
            self.image_id, num_segments=n_img)
        cnt = jnp.maximum(cnt, 1.0)[:, None]
        mean = sums / cnt
        var = sqs / cnt - mean * mean
        m = mean[self.image_id][:, None, :, None]
        v = var[self.image_id][:, None, :, None]
        y = (xf - m) * jax.lax.rsqrt(v + eps)
        y = y.reshape(pp, s, s, c) * p["scale"].astype(jnp.float32) \
            + p["bias"].astype(jnp.float32)
        if act == "silu":
            y = jax.nn.silu(y)
        return y.astype(x.dtype)

    # -- attention ----------------------------------------------------------

    def self_attention(self, p, h, heads: int, lvl: int) -> jnp.ndarray:
        """h: (P, s^2, C) patch token runs -> full-image attention.

        Gather patches into per-RESOLUTION-CLASS padded image groups
        ((I_c, g_c^2*s^2, C), one masked attention per class), scatter token
        runs back.  Per-class grouping avoids padding every image to the
        largest class's slot count (a 512^2 image's 4 patches padded to a
        1024^2 image's 16 slots cost 4x its attention flops); uniform
        compositions keep the single-group fast path.
        """
        q = L.linear(p["to_q"], h)
        k = L.linear(p["to_k"], h)
        v = L.linear(p["to_v"], h)
        pp, s2, c = q.shape
        m = self.meta

        if len(m.class_info) <= 1:
            def group(x):
                rows = x[jnp.clip(self.group_gather, 0)]      # (I*max_pp, s2, C)
                return rows.reshape(m.i_pad, m.max_pp * s2, c)

            gq, gk, gv = group(q), group(k), group(v)
            kv_token_mask = jnp.repeat(self.kv_mask, s2, axis=1)
            # full-image grouped attention reaches 16k+ tokens at 1024^2 —
            # dense logits would not fit HBM; prefer the flash kernel on TPU
            out = masked_attention(gq, gk, gv, heads, kv_token_mask,
                                   prefer_flash=True)
            out = out.reshape(m.i_pad * m.max_pp, s2, c)
            return out[self.patch_pos]                          # (P, s2, C)

        out = jnp.zeros((pp, s2, c), q.dtype)
        for ci, (g, ipc) in enumerate(m.class_info):
            gather = self.class_gather[ci]
            def group(x, gather=gather, ipc=ipc, g=g):
                rows = x[jnp.clip(gather, 0)]                  # (I_c*g^2, s2, C)
                return rows.reshape(ipc, g * g * s2, c)

            gq, gk, gv = group(q), group(k), group(v)
            kv_token_mask = jnp.repeat(self.class_kv[ci], s2, axis=1)
            o = masked_attention(gq, gk, gv, heads, kv_token_mask,
                                 prefer_flash=True)
            rows = o.reshape(ipc * g * g, s2, c)[self.class_pos[ci]]
            out = jnp.where(self.class_member[ci][:, None, None], rows, out)
        return out

    def cross_attention(self, p, h, ehs, heads: int, lvl: int,
                        rows=None) -> jnp.ndarray:
        """h: (P, s^2, C); ehs: (I_pad, L, D) per-image text context.

        ``rows``: h holds only these patch rows (second-level compaction,
        CacheConfig.patch_fraction) — per-row text KV follows their images.
        """
        k = L.linear(p["to_k"], ehs)
        v = L.linear(p["to_v"], ehs)
        q = L.linear(p["to_q"], h)
        image_id = self.image_id if rows is None else self.image_id[rows]
        k = k[image_id]  # (rows, L, C)
        v = v[image_id]
        return masked_attention(q, k, v, heads)


def ctx_arrays(meta: PatchMeta) -> Dict[str, jnp.ndarray]:
    """Device arrays for a PatchMeta, suitable as traced jit arguments."""
    out = {
        "image_id": jnp.asarray(meta.image_id),
        "neighbors": jnp.asarray(meta.neighbors),
        "group_gather": jnp.asarray(meta.group_gather),
        "patch_pos": jnp.asarray(meta.patch_pos),
        "kv_mask": jnp.asarray(meta.kv_mask),
        # (p_pad,) bool: True for real patches, False for bucket pads (pads
        # point at the dummy image's empty kv slot).  Traced — n_patches is
        # not part of the bucket compile key.
        "patch_valid": jnp.asarray(meta.kv_mask.reshape(-1)[meta.patch_pos]),
    }
    for i in range(len(meta.class_info)):
        out[f"class_gather_{i}"] = jnp.asarray(meta.class_gather[i])
        out[f"class_pos_{i}"] = jnp.asarray(meta.class_pos[i])
        out[f"class_member_{i}"] = jnp.asarray(meta.class_member[i])
        out[f"class_kv_{i}"] = jnp.asarray(meta.class_kv[i])
    return out
