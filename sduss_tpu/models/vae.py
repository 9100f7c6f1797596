"""AutoencoderKL (SD VAE) in pure functional JAX, NHWC.

Decoder is the serving hot path (POSTPROCESSING stage); encoder included for
img2img parity.  Mirrors diffusers' AutoencoderKL module tree for mechanical
weight conversion.  SD-1.5/SDXL: 4 latent channels; SD-3.5: 16 channels with
shift factor.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sduss_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0
    # SDXL VAE needs float32 decode to avoid overflow (reference handles this
    # at pipelines/stable_diffusion_xl/*.py:48-54); we upcast when set.
    force_upcast: bool = False
    # SD3's 16-channel AutoencoderKL ships use_quant_conv=false /
    # use_post_quant_conv=false — no 1x1 (post_)quant convs in the
    # checkpoint or the architecture.
    use_quant_conv: bool = True


SD15_VAE = VAEConfig()
SDXL_VAE = VAEConfig(scaling_factor=0.13025, force_upcast=True)
SD3_VAE = VAEConfig(latent_channels=16, scaling_factor=1.5305,
                    shift_factor=0.0609, use_quant_conv=False)
TINY_VAE = VAEConfig(block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8)


def _resnet_init(rng, in_ch, out_ch):
    k = iter(jax.random.split(rng, 3))
    p = {
        "norm1": L.group_norm_init(in_ch),
        "conv1": L.conv_init(next(k), in_ch, out_ch, 3),
        "norm2": L.group_norm_init(out_ch),
        "conv2": L.conv_init(next(k), out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = L.conv_init(next(k), in_ch, out_ch, 1)
    return p


def _resnet_apply(p, x, groups):
    h = L.group_norm(p["norm1"], x, groups, 1e-6, "silu")
    h = L.conv2d(p["conv1"], h)
    h = L.group_norm(p["norm2"], h, groups, 1e-6, "silu")
    h = L.conv2d(p["conv2"], h)
    if "conv_shortcut" in p:
        x = L.conv2d(p["conv_shortcut"], x)
    return x + h


def _attn_init(rng, ch):
    k = iter(jax.random.split(rng, 4))
    return {
        "group_norm": L.group_norm_init(ch),
        "to_q": L.linear_init(next(k), ch, ch),
        "to_k": L.linear_init(next(k), ch, ch),
        "to_v": L.linear_init(next(k), ch, ch),
        "to_out": L.linear_init(next(k), ch, ch),
    }


def _attn_apply(p, x, groups):
    b, h, w, c = x.shape
    res = x
    y = L.group_norm(p["group_norm"], x, groups, 1e-6)
    y = y.reshape(b, h * w, c)
    q, k, v = (L.linear(p["to_q"], y), L.linear(p["to_k"], y),
               L.linear(p["to_v"], y))
    # single head, d=512 — too wide for the flash kernels' full-KV-in-VMEM
    # layout; at >=4k tokens (768px+ decode) q-row blocking keeps the f32
    # score matrix from materializing (~1 GB/image at 1024px dense).
    # DEFAULT since the on-chip A/B measured an exact latency TIE with
    # dense at decode shapes (exp/bench_vae_attn_v5e.json) — the dense
    # score transient is what pushed serving postprocess over HBM next to
    # live cache state (r2y OOM).  SDUSS_VAE_BLOCKED_ATTN=0 reverts.
    if (h * w >= 4096
            and os.environ.get("SDUSS_VAE_BLOCKED_ATTN", "1") == "1"):
        y = L.attention_blocked(q, k, v, num_heads=1)
    else:
        y = L.attention(q, k, v, num_heads=1)
    y = L.linear(p["to_out"], y).reshape(b, h, w, c)
    return res + y


def _mid_init(rng, ch):
    k = iter(jax.random.split(rng, 3))
    return {
        "resnets": [_resnet_init(next(k), ch, ch), _resnet_init(next(k), ch, ch)],
        "attentions": [_attn_init(next(k), ch)],
    }


def _mid_apply(p, x, groups):
    x = _resnet_apply(p["resnets"][0], x, groups)
    x = _attn_apply(p["attentions"][0], x, groups)
    return _resnet_apply(p["resnets"][1], x, groups)


class AutoencoderKL:
    def __init__(self, cfg: VAEConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        cfg = self.cfg
        keys = iter(jax.random.split(rng, 64))
        chs = cfg.block_out_channels
        n = len(chs)

        enc = {
            "conv_in": L.conv_init(next(keys), cfg.in_channels, chs[0], 3),
            "down_blocks": [],
            "mid_block": _mid_init(next(keys), chs[-1]),
            "conv_norm_out": L.group_norm_init(chs[-1]),
            "conv_out": L.conv_init(next(keys), chs[-1], 2 * cfg.latent_channels, 3),
        }
        out_ch = chs[0]
        for i in range(n):
            in_ch, out_ch = out_ch, chs[i]
            blk = {"resnets": [_resnet_init(next(keys), in_ch if j == 0 else out_ch, out_ch)
                               for j in range(cfg.layers_per_block)]}
            if i < n - 1:
                blk["downsample"] = L.conv_init(next(keys), out_ch, out_ch, 3)
            enc["down_blocks"].append(blk)

        dec = {
            "conv_in": L.conv_init(next(keys), cfg.latent_channels, chs[-1], 3),
            "mid_block": _mid_init(next(keys), chs[-1]),
            "up_blocks": [],
            "conv_norm_out": L.group_norm_init(chs[0]),
            "conv_out": L.conv_init(next(keys), chs[0], cfg.out_channels, 3),
        }
        rev = list(reversed(chs))
        out_ch = rev[0]
        for i in range(n):
            in_ch, out_ch = out_ch, rev[i]
            blk = {"resnets": [_resnet_init(next(keys), in_ch if j == 0 else out_ch, out_ch)
                               for j in range(cfg.layers_per_block + 1)]}
            if i < n - 1:
                blk["upsample"] = L.conv_init(next(keys), out_ch, out_ch, 3)
            dec["up_blocks"].append(blk)

        out = {"encoder": enc, "decoder": dec}
        if cfg.use_quant_conv:
            out["quant_conv"] = L.conv_init(
                next(keys), 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
            out["post_quant_conv"] = L.conv_init(
                next(keys), cfg.latent_channels, cfg.latent_channels, 1)
        return out

    def encode(self, params, images, sample_rng=None):
        """images (B,H,W,3) in [-1,1] -> latent (B,H/8,W/8,latent_ch), scaled."""
        cfg = self.cfg
        g = cfg.norm_num_groups
        x = images
        if cfg.force_upcast:
            x = x.astype(jnp.float32)
        enc = params["encoder"]
        h = L.conv2d(enc["conv_in"], x)
        for blk in enc["down_blocks"]:
            for r in blk["resnets"]:
                h = _resnet_apply(r, h, g)
            if "downsample" in blk:
                # diffusers VAE encoder downsample pads (0,1) bottom/right only.
                h = jnp.pad(h, [(0, 0), (0, 1), (0, 1), (0, 0)])
                h = L.conv2d(blk["downsample"], h, stride=2, padding="VALID")
        h = _mid_apply(enc["mid_block"], h, g)
        h = L.group_norm(enc["conv_norm_out"], h, g, 1e-6, "silu")
        h = L.conv2d(enc["conv_out"], h)
        if self.cfg.use_quant_conv:
            h = L.conv2d(params["quant_conv"], h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        if sample_rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(sample_rng, mean.shape, mean.dtype)
        return (mean - cfg.shift_factor) * cfg.scaling_factor

    def decode(self, params, latents, dtype=None):
        """Scaled latents (B,h,w,latent_ch) -> images (B,8h,8w,3) in [-1,1].

        ``dtype`` overrides the compute dtype.  force_upcast reflects the
        fp16 OVERFLOW problem of the SDXL VAE (reference handles it by
        pinning fp32, pipeline_stable_diffusion_xl_esymred.py:48-54);
        bfloat16 shares float32's exponent range, so bf16 decode is safe on
        TPU and ~4x faster (fp32 has no fast MXU path).
        """
        z = self._scale_in(latents, dtype)
        return self._decode_core(params, z)

    def _scale_in(self, latents, dtype):
        cfg = self.cfg
        z = latents / cfg.scaling_factor + cfg.shift_factor
        if dtype is not None:
            z = z.astype(dtype)
        elif cfg.force_upcast:
            z = z.astype(jnp.float32)
        return z

    def _decode_core(self, params, z):
        g = self.cfg.norm_num_groups
        if self.cfg.use_quant_conv:
            z = L.conv2d(params["post_quant_conv"], z)
        dec = params["decoder"]
        h = L.conv2d(dec["conv_in"], z)
        h = _mid_apply(dec["mid_block"], h, g)
        for blk in dec["up_blocks"]:
            for r in blk["resnets"]:
                h = _resnet_apply(r, h, g)
            if "upsample" in blk:
                h = L.nearest_upsample_2x(h)
                h = L.conv2d(blk["upsample"], h)
        h = L.group_norm(dec["conv_norm_out"], h, g, 1e-6, "silu")
        return L.conv2d(dec["conv_out"], h)

    def decode_tiled(self, params, latents, dtype=None, tile: int = 64,
                     overlap: int = 16, strips=None):
        """Spatially-tiled decode: same contract as ``decode``.

        Full-resolution decode activations are the serving pipeline's HBM
        peak — the SD3 16-channel VAE at 1024^2 exhausts a 16 GB v5e chip
        (the round-1 profiler OOM).  Decoding overlapping latent tiles
        bounds the live activation set to one tile; tiles blend with a
        linear ramp over the overlap and normalize by the accumulated
        weight, so interior seams are smooth and image borders renormalize
        to weight 1.  Equivalent job to diffusers' `enable_vae_tiling`
        (the reference serves SD3 through diffusers' AutoencoderKL; its
        H100s have 80 GB so it never needs this).

        All tiles share one static (tile, tile) shape, so a jit of this
        function compiles the decoder body once per tile position with a
        single live tile at a time.
        """
        b, h, w, _ = latents.shape
        if h <= tile and w <= tile:
            return self.decode(params, latents, dtype=dtype)
        z = self._scale_in(latents, dtype)
        s = 2 ** (len(self.cfg.block_out_channels) - 1)  # pixels per latent cell

        # Full-width ROW STRIPS whenever a strip with the same live-area
        # budget (tile^2 cells) spans the width: horizontal seams vanish and
        # the redundant-halo compute drops from ~2.25x dense (9 64^2 tiles
        # at 128^2) to ~1.25x (5 32-row strips) — same HBM envelope, ~45%
        # faster 1024^2 decode.  Square 2D tiling remains for very wide
        # latents where a >=8-row strip would exceed the budget.
        if strips is None:
            strips = w <= (tile * tile) // 8 and (tile * tile) // w < h
        if strips:
            if w > (tile * tile) // 8:
                # An explicit strips=True on a very wide latent would floor
                # tile_h at 8 and silently blow the tile^2 live-cell budget
                # (8*w cells) — the exact OOM this path exists to prevent.
                raise ValueError(
                    f"strips=True needs latent width <= tile^2/8 "
                    f"({(tile * tile) // 8} cells at tile={tile}); got w={w}. "
                    f"Use 2D tiling (strips=False) or a larger tile.")
            tile_h = max(8, min((tile * tile) // w, h))
            tile_w = w
            ov_h, ov_w = min(overlap, tile_h // 4), 0
        else:
            tile_h = tile_w = min(tile, h, w)
            ov_h = ov_w = min(overlap, tile_h // 2)

        def positions(extent, t, ov):
            if extent <= t:
                return [0]
            n = -(-(extent - ov) // (t - ov))  # ceil
            return [int(round(p)) for p in np.linspace(0, extent - t, n)]

        def ramp1d(t, ov):
            ramp_len = max(ov * s, 1)
            axis = np.arange(t * s, dtype=np.float32)
            return np.minimum(1.0, np.minimum((axis + 1) / ramp_len,
                                              (t * s - axis) / ramp_len))

        wgt = jnp.asarray(np.outer(ramp1d(tile_h, ov_h),
                                   ramp1d(tile_w, ov_w))[None, :, :, None])

        out_sum = jnp.zeros((b, h * s, w * s, self.cfg.out_channels), jnp.float32)
        wgt_sum = jnp.zeros((1, h * s, w * s, 1), jnp.float32)
        for py in positions(h, tile_h, ov_h):
            for px in positions(w, tile_w, ov_w):
                img = self._decode_core(
                    params, z[:, py:py + tile_h, px:px + tile_w, :])
                oy, ox = py * s, px * s
                oy2, ox2 = oy + tile_h * s, ox + tile_w * s
                out_sum = out_sum.at[:, oy:oy2, ox:ox2, :].add(
                    img.astype(jnp.float32) * wgt)
                wgt_sum = wgt_sum.at[:, oy:oy2, ox:ox2, :].add(wgt)
        return out_sum / wgt_sum
