"""UNet2DConditionModel (SD-1.5 / SDXL) in pure functional JAX, NHWC.

Config-driven rebuild of the denoiser the reference wraps with PatchUNet
(sduss/model_executor/modules/unet.py:27-530).  The same ``apply`` serves both
the dense per-resolution path and the mixed-resolution patch path: every
spatial helper takes an optional PatchContext (sduss_tpu/ops/patching.py) and
switches between dense NHWC ops and patch-batch ops (per-image group norm with
halo exchange, segment-grouped attention).

Weight layout mirrors diffusers' UNet2DConditionModel module tree so loading
from HF safetensors is a mechanical rename (sduss_tpu/models/convert.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from sduss_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    # True at index i => down block i has cross-attention transformers.
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    layers_per_block: int = 2
    # Transformer depth per level (SDXL: (1, 2, 10) on its 3 levels).
    transformer_layers: Tuple[int, ...] = (1, 1, 1, 0)
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    # SDXL text_time conditioning: (addition_time_embed_dim, pooled_dim, num_time_ids)
    addition_embed: Optional[Tuple[int, int, int]] = None
    use_linear_projection: bool = False
    sample_size: int = 64

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


SD15_UNET = UNetConfig()
SDXL_UNET = UNetConfig(
    block_out_channels=(320, 640, 1280),
    down_block_has_attn=(False, True, True),
    transformer_layers=(0, 2, 10),
    num_heads=(5, 10, 20),
    cross_attention_dim=2048,
    addition_embed=(256, 1280, 6),
    use_linear_projection=True,
    sample_size=128,
)
TINY_UNET = UNetConfig(
    block_out_channels=(32, 64),
    down_block_has_attn=(True, False),
    layers_per_block=1,
    transformer_layers=(1, 0),
    num_heads=(2, 2),
    cross_attention_dim=32,
    norm_num_groups=8,
    sample_size=16,
)
TINY_SDXL_UNET = UNetConfig(
    block_out_channels=(32, 64),
    down_block_has_attn=(False, True),
    layers_per_block=1,
    transformer_layers=(0, 1),
    num_heads=(2, 2),
    cross_attention_dim=32,
    norm_num_groups=8,
    addition_embed=(32, 48, 6),
    use_linear_projection=True,
    sample_size=16,
)
# 3-level tiny proxy with SDXL's level structure (no-attn level 0, attn at
# levels 1-2) so the deep_boundary ladder (cache wider spans on shallow
# steps) can be quality-ranked on CPU before chip time.
TINY3_SDXL_UNET = UNetConfig(
    block_out_channels=(32, 64, 128),
    down_block_has_attn=(False, True, True),
    layers_per_block=1,
    transformer_layers=(0, 1, 2),
    num_heads=(2, 2, 4),
    cross_attention_dim=32,
    norm_num_groups=8,
    addition_embed=(32, 48, 6),
    use_linear_projection=True,
    sample_size=16,
)
# 4-level tiny proxy with SD1.5's level structure (cross-attention at
# levels 0-2, none at the deepest; conv projections) so sd15 deep-cache
# BOUNDARY choices can be quality-ranked on the same harness
# (scripts/cache_quality.py --unet-levels 4).  addition_embed kept so the
# shared SDXL-shaped harness drives it unchanged — level structure, not
# conditioning, is what the boundary ladder exercises.
TINY4_SD15_UNET = UNetConfig(
    block_out_channels=(16, 24, 32, 32),
    down_block_has_attn=(True, True, True, False),
    layers_per_block=1,
    transformer_layers=(1, 1, 1, 0),
    num_heads=(2, 2, 2, 2),
    cross_attention_dim=32,
    norm_num_groups=8,
    addition_embed=(32, 48, 6),
    use_linear_projection=False,
    sample_size=32,
)


# ---------------------------------------------------------------------------
# Sub-module init/apply helpers.  `ctx` is a PatchContext (or None for dense);
# `lvl` the resolution level (0 = full latent res), used by patch ops to pick
# the right halo/segment index tables.
# ---------------------------------------------------------------------------

def _resnet_init(rng, in_ch, out_ch, temb_dim, groups):
    k = iter(jax.random.split(rng, 4))
    p = {
        "norm1": L.group_norm_init(in_ch),
        "conv1": L.conv_init(next(k), in_ch, out_ch, 3),
        "time_emb_proj": L.linear_init(next(k), temb_dim, out_ch),
        "norm2": L.group_norm_init(out_ch),
        "conv2": L.conv_init(next(k), out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = L.conv_init(next(k), in_ch, out_ch, 1)
    return p


def _resnet_apply(p, x, temb, groups, ctx, lvl):
    h = _gn_silu_conv(p["norm1"], p["conv1"], x, groups, ctx, lvl)
    t = L.linear(p["time_emb_proj"], jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
    h = h + t[:, None, None, :].astype(h.dtype)
    h = _gn_silu_conv(p["norm2"], p["conv2"], h, groups, ctx, lvl)
    if "conv_shortcut" in p:
        x = _conv1x1(p["conv_shortcut"], x)
    return x + h


def _attn_init(rng, query_dim, context_dim, heads):
    k = iter(jax.random.split(rng, 4))
    inner = query_dim
    return {
        "to_q": L.linear_init(next(k), query_dim, inner, bias=False),
        "to_k": L.linear_init(next(k), context_dim, inner, bias=False),
        "to_v": L.linear_init(next(k), context_dim, inner, bias=False),
        "to_out": L.linear_init(next(k), inner, query_dim),
    }


def _tblock_init(rng, dim, context_dim, heads):
    k = iter(jax.random.split(rng, 4))
    return {
        "norm1": L.layer_norm_init(dim),
        "attn1": _attn_init(next(k), dim, dim, heads),
        "norm2": L.layer_norm_init(dim),
        "attn2": _attn_init(next(k), dim, context_dim, heads),
        "norm3": L.layer_norm_init(dim),
        "ff_geglu": L.linear_init(next(k), dim, dim * 8),
        "ff_out": L.linear_init(next(k), dim * 4, dim),
    }


def _transformer_init(rng, channels, context_dim, heads, depth, use_linear):
    k = iter(jax.random.split(rng, depth + 2))
    p = {
        "norm": L.group_norm_init(channels),
        "blocks": [_tblock_init(next(k), channels, context_dim, heads) for _ in range(depth)],
    }
    if use_linear:
        p["proj_in"] = L.linear_init(next(k), channels, channels)
        p["proj_out"] = L.linear_init(next(k), channels, channels)
    else:
        p["proj_in"] = L.conv_init(next(k), channels, channels, 1)
        p["proj_out"] = L.conv_init(next(k), channels, channels, 1)
    return p


def _transformer_apply(p, x, ehs, heads, groups, use_linear, ctx, lvl,
                       tok_sel=None):
    """Spatial transformer: x (B,H,W,C) dense or (P,ph,pw,C) patched.

    ``tok_sel`` (patch path only): second-level per-patch compaction inside
    an image-granular cache sub-composition (CacheConfig.patch_fraction).
    Self-attention runs ALL rows (full-image KV stays exact); the per-token
    tail (cross-attention + FF + proj_out) runs only the selected rows, and
    the function returns ONLY those rows — the caller splices cached pair
    outputs for the rest (reference finest granularity,
    cache_manager.py:101-191, with the reference's own partial-KV
    approximation replaced by exact KV + compacted queries).
    """
    residual = x
    h = _gn(p["norm"], x, groups, 1e-6, None, ctx, lvl)
    if not use_linear:
        h = _conv1x1(p["proj_in"], h)
    n, hh, ww, c = h.shape
    h = h.reshape(n, hh * ww, c)
    if use_linear:
        h = L.linear(p["proj_in"], h)
    for blk in p["blocks"]:
        h = _tblock_apply(blk, h, ehs, heads, ctx, lvl, tok_sel=tok_sel)
    if tok_sel is not None:
        h = h[tok_sel]
        n = h.shape[0]
        residual = residual[tok_sel]
    if use_linear:
        h = L.linear(p["proj_out"], h)
    h = h.reshape(n, hh, ww, c)
    if not use_linear:
        h = _conv1x1(p["proj_out"], h)
    return h + residual


def _tblock_apply(p, h, ehs, heads, ctx, lvl, tok_sel=None):
    """h: (N, S, C) token sequences; ehs: (B_img, L, D) text context.

    With ``tok_sel``: self-attention over all rows, then the cross-attn/FF
    tail only on the selected rows (scattered back so deeper blocks see
    their fresh values; unselected rows keep partially-updated states that
    only ever serve as attention KV context — their own outputs are
    replaced by cached rows at the gate)."""
    attn_in = L.layer_norm(p["norm1"], h)
    h = h + _self_attention(p["attn1"], attn_in, heads, ctx, lvl)
    if tok_sel is None:
        attn_in = L.layer_norm(p["norm2"], h)
        h = h + _cross_attention(p["attn2"], attn_in, ehs, heads, ctx, lvl)
        ff_in = L.layer_norm(p["norm3"], h)
        h = h + L.linear(p["ff_out"], L.geglu(p["ff_geglu"], ff_in))
        return h
    hs = h[tok_sel]
    attn_in = L.layer_norm(p["norm2"], hs)
    hs = hs + _cross_attention(p["attn2"], attn_in, ehs, heads, ctx, lvl,
                               rows=tok_sel)
    ff_in = L.layer_norm(p["norm3"], hs)
    hs = hs + L.linear(p["ff_out"], L.geglu(p["ff_geglu"], ff_in))
    return h.at[tok_sel].set(hs)


def _downsample_init(rng, ch):
    return L.conv_init(rng, ch, ch, 3)


def _upsample_init(rng, ch, out_ch):
    return L.conv_init(rng, ch, out_ch, 3)


# --- dense/patch dispatch seam ---------------------------------------------

def _gn(p, x, groups, eps, act, ctx, lvl):
    if ctx is None:
        return L.group_norm(p, x, groups, eps, act)
    return ctx.group_norm(p, x, groups, eps, act, lvl)


def _gn_silu_conv(p_gn, p_conv, x, groups, ctx, lvl):
    """GroupNorm+SiLU fused into the following 3x3 conv's halo layout.

    Patch path uses the fused Pallas kernel (ops/gn_halo.py, the rebuild of
    the reference's norm_silu_concat.cu); dense path relies on XLA fusion.
    """
    if ctx is None:
        return L.conv2d(p_conv, L.group_norm(p_gn, x, groups, 1e-5, "silu"))
    return ctx.gn_silu_conv(p_gn, p_conv, x, groups, 1e-5, lvl)


def _conv(p, x, ctx, lvl, stride: int = 1):
    if ctx is None:
        return L.conv2d(p, x, stride=stride)
    return ctx.conv(p, x, lvl, stride=stride)


def _conv1x1(p, x):
    if p["kernel"].ndim == 4:
        return L.conv2d(p, x, stride=1)
    return L.linear(p, x)


def _self_attention(p, h, heads, ctx, lvl):
    if ctx is None:
        from sduss_tpu.ops.attention import masked_attention

        # Dispatches to the Pallas flash kernel on TPU for long sequences
        # (4096 tokens at 1024px), plain einsum elsewhere.
        out = masked_attention(L.linear(p["to_q"], h), L.linear(p["to_k"], h),
                               L.linear(p["to_v"], h), heads)
    else:
        out = ctx.self_attention(p, h, heads, lvl)
    return L.linear(p["to_out"], out)


def _cross_attention(p, h, ehs, heads, ctx, lvl, rows=None):
    if ctx is None:
        from sduss_tpu.ops.attention import masked_attention

        # Dispatches to the no-transpose short-KV kernel on TPU (77 text
        # tokens), plain einsum elsewhere.
        k = L.linear(p["to_k"], ehs)
        v = L.linear(p["to_v"], ehs)
        out = masked_attention(L.linear(p["to_q"], h), k, v, heads)
    elif rows is None:
        # keep the plain call shape: sharded contexts (displaced path)
        # don't take rows — two-level compaction never runs there
        out = ctx.cross_attention(p, h, ehs, heads, lvl)
    else:
        out = ctx.cross_attention(p, h, ehs, heads, lvl, rows=rows)
    return L.linear(p["to_out"], out)


def _upsample_2x(x, ctx, lvl):
    if ctx is None:
        return L.nearest_upsample_2x(x)
    return ctx.upsample_2x(x, lvl)


# ---------------------------------------------------------------------------


class UNet2DConditionModel:
    """Pure-function UNet; all state lives in the params pytree."""

    def __init__(self, cfg: UNetConfig):
        self.cfg = cfg

    # -- init ---------------------------------------------------------------

    def init(self, rng) -> dict:
        cfg = self.cfg
        n_levels = len(cfg.block_out_channels)
        keys = iter(jax.random.split(rng, 64))
        p: dict = {
            "conv_in": L.conv_init(next(keys), cfg.in_channels, cfg.block_out_channels[0], 3),
            "time_embedding": {
                "linear_1": L.linear_init(next(keys), cfg.block_out_channels[0], cfg.time_embed_dim),
                "linear_2": L.linear_init(next(keys), cfg.time_embed_dim, cfg.time_embed_dim),
            },
            "down_blocks": [],
            "up_blocks": [],
            "conv_norm_out": L.group_norm_init(cfg.block_out_channels[0]),
            "conv_out": L.conv_init(next(keys), cfg.block_out_channels[0], cfg.out_channels, 3),
        }
        if cfg.addition_embed is not None:
            add_dim, pooled_dim, num_ids = cfg.addition_embed
            in_dim = pooled_dim + add_dim * num_ids
            p["add_embedding"] = {
                "linear_1": L.linear_init(next(keys), in_dim, cfg.time_embed_dim),
                "linear_2": L.linear_init(next(keys), cfg.time_embed_dim, cfg.time_embed_dim),
            }

        out_ch = cfg.block_out_channels[0]
        for i in range(n_levels):
            in_ch, out_ch = out_ch, cfg.block_out_channels[i]
            blk = {"resnets": [], "attentions": []}
            for j in range(cfg.layers_per_block):
                blk["resnets"].append(_resnet_init(
                    next(keys), in_ch if j == 0 else out_ch, out_ch, cfg.time_embed_dim,
                    cfg.norm_num_groups))
                if cfg.down_block_has_attn[i]:
                    blk["attentions"].append(_transformer_init(
                        next(keys), out_ch, cfg.cross_attention_dim, cfg.num_heads[i],
                        cfg.transformer_layers[i], cfg.use_linear_projection))
            if i < n_levels - 1:
                blk["downsample"] = _downsample_init(next(keys), out_ch)
            p["down_blocks"].append(blk)

        mid_ch = cfg.block_out_channels[-1]
        p["mid_block"] = {
            "resnets": [
                _resnet_init(next(keys), mid_ch, mid_ch, cfg.time_embed_dim, cfg.norm_num_groups),
                _resnet_init(next(keys), mid_ch, mid_ch, cfg.time_embed_dim, cfg.norm_num_groups),
            ],
            "attentions": [_transformer_init(
                next(keys), mid_ch, cfg.cross_attention_dim, cfg.num_heads[-1],
                max(cfg.transformer_layers[-1], 1), cfg.use_linear_projection)],
        }

        rev_out = list(reversed(cfg.block_out_channels))
        for i in range(n_levels):
            lvl = n_levels - 1 - i  # resolution level of this up block
            prev_out = mid_ch if i == 0 else rev_out[i - 1]
            out_ch = rev_out[i]
            skip_out = rev_out[i]
            blk = {"resnets": [], "attentions": []}
            for j in range(cfg.layers_per_block + 1):
                res_in = prev_out if j == 0 else out_ch
                # Skip connections pop in reverse: the last one at each level
                # comes from one level up.
                skip_ch = cfg.block_out_channels[max(lvl - 1, 0)] \
                    if j == cfg.layers_per_block else cfg.block_out_channels[lvl]
                blk["resnets"].append(_resnet_init(
                    next(keys), res_in + skip_ch, out_ch, cfg.time_embed_dim, cfg.norm_num_groups))
                if cfg.down_block_has_attn[lvl]:
                    blk["attentions"].append(_transformer_init(
                        next(keys), out_ch, cfg.cross_attention_dim, cfg.num_heads[lvl],
                        cfg.transformer_layers[lvl], cfg.use_linear_projection))
            if i < n_levels - 1:
                blk["upsample"] = _upsample_init(next(keys), out_ch, out_ch)
            p["up_blocks"].append(blk)
        return p

    # -- forward ------------------------------------------------------------

    def time_embed(self, params, timesteps, added_cond=None, dtype=jnp.float32):
        """(B,) timesteps (+ SDXL added conditioning) -> (B, time_embed_dim)."""
        cfg = self.cfg
        te = L.timestep_embedding(timesteps, cfg.block_out_channels[0]).astype(dtype)
        emb = L.linear(params["time_embedding"]["linear_2"],
                       jax.nn.silu(L.linear(params["time_embedding"]["linear_1"], te)
                                   .astype(jnp.float32)).astype(dtype))
        if cfg.addition_embed is not None:
            add_dim, _, _ = cfg.addition_embed
            text_embeds = added_cond["text_embeds"]  # (B, pooled_dim)
            time_ids = added_cond["time_ids"]  # (B, num_ids)
            b = time_ids.shape[0]
            tid_emb = L.timestep_embedding(time_ids.reshape(-1), add_dim)
            tid_emb = tid_emb.reshape(b, -1).astype(dtype)
            add_in = jnp.concatenate([text_embeds.astype(dtype), tid_emb], axis=-1)
            aemb = L.linear(params["add_embedding"]["linear_2"],
                            jax.nn.silu(L.linear(params["add_embedding"]["linear_1"], add_in)
                                        .astype(jnp.float32)).astype(dtype))
            emb = emb + aemb
        return emb

    def cache_layout(self, cells: int, min_level: int = 1):
        """Gated-block layout for the block cache: key -> (s, c_in, c_out).

        ``cells`` is the patch side in latent cells at level 0.  One gate per
        (resnet, attention) pair plus the mid block — the TPU adaptation of
        the reference's per-Down/Up/Transformer-block CacheManagers
        (sduss/model_executor/modules/unet_2d_blocks.py:40-380) at a slightly
        coarser granularity (fewer in-graph decisions per step).
        """
        cfg = self.cfg
        n_levels = len(cfg.block_out_channels)
        bo = cfg.block_out_channels
        layout = {}
        out_ch = bo[0]
        for i in range(n_levels):
            in_ch, out_ch = out_ch, bo[i]
            if i < min_level:
                continue
            s = cells >> i
            for j in range(cfg.layers_per_block):
                layout[f"down{i}.{j}"] = (s, in_ch if j == 0 else out_ch, out_ch)
        if n_levels - 1 >= min_level:
            s = cells >> (n_levels - 1)
            layout["mid"] = (s, bo[-1], bo[-1])
        rev = list(reversed(bo))
        for i in range(n_levels):
            lvl = n_levels - 1 - i
            if lvl < min_level:
                continue
            s = cells >> lvl
            prev_out = bo[-1] if i == 0 else rev[i - 1]
            for j in range(cfg.layers_per_block + 1):
                res_in = prev_out if j == 0 else rev[i]
                skip_ch = bo[max(lvl - 1, 0)] if j == cfg.layers_per_block else bo[lvl]
                layout[f"up{i}.{j}"] = (s, res_in + skip_ch, rev[i])
        return layout

    def shallow_cache_layout(self, cells: int, boundary: Optional[int] = None):
        """Gated-block layout for the deep x compact HYBRID: only the pairs a
        SHALLOW deep-mode step actually runs (down levels < boundary, up
        blocks with level < boundary; no mid).  key -> (s, c_in, c_out) with
        c_in counting the skip concat for up pairs, matching apply()'s gate
        inputs."""
        cfg = self.cfg
        n_levels = len(cfg.block_out_channels)
        if boundary is None:
            boundary = n_levels - 1
        bo = cfg.block_out_channels
        layout = {}
        out_ch = bo[0]
        for i in range(n_levels):
            in_ch, out_ch = out_ch, bo[i]
            if i >= boundary:
                break
            s = cells >> i
            for j in range(cfg.layers_per_block):
                layout[f"down{i}.{j}"] = (s, in_ch if j == 0 else out_ch, out_ch)
        rev = list(reversed(bo))
        first_shallow_up = n_levels - boundary
        for i in range(n_levels):
            lvl = n_levels - 1 - i
            if i < first_shallow_up:
                continue
            s = cells >> lvl
            prev_out = bo[-1] if i == 0 else rev[i - 1]
            for j in range(cfg.layers_per_block + 1):
                res_in = prev_out if j == 0 else rev[i]
                skip_ch = bo[max(lvl - 1, 0)] if j == cfg.layers_per_block else bo[lvl]
                layout[f"up{i}.{j}"] = (s, res_in + skip_ch, rev[i])
        return layout

    def _deep_tail(self, params, h, temb, ehs, boundary: int):
        """Dense, ungated deep tail: the exact op sequence a FULL pass runs
        between the partial capture point (input of the level-(boundary-1)
        downsample) and the deep-feature capture (output of up block
        ``first_shallow_up - 1``, post-upsample) — levels >= boundary down,
        mid, and the deep up blocks.  Used by deep_mode="partial" on a
        GATHERED row subset; rows are independent on the dense path (per-
        sample GroupNorm/attention), so per-row outputs equal the full
        pass's (tests/test_deep_partial.py)."""
        cfg = self.cfg
        n_levels = len(cfg.block_out_channels)
        groups = cfg.norm_num_groups
        dskips = []
        h = L.conv2d(params["down_blocks"][boundary - 1]["downsample"], h,
                     stride=2)
        dskips.append(h)
        for i in range(boundary, n_levels):
            blk = params["down_blocks"][i]
            for j, res in enumerate(blk["resnets"]):
                h = _resnet_apply(res, h, temb, groups, None, i)
                if blk["attentions"]:
                    h = _transformer_apply(
                        blk["attentions"][j], h, ehs, cfg.num_heads[i],
                        groups, cfg.use_linear_projection, None, i)
                dskips.append(h)
            if "downsample" in blk:
                h = L.conv2d(blk["downsample"], h, stride=2)
                dskips.append(h)
        mid = params["mid_block"]
        h = _resnet_apply(mid["resnets"][0], h, temb, groups, None, n_levels - 1)
        h = _transformer_apply(mid["attentions"][0], h, ehs,
                               cfg.num_heads[-1], groups,
                               cfg.use_linear_projection, None, n_levels - 1)
        h = _resnet_apply(mid["resnets"][1], h, temb, groups, None, n_levels - 1)
        first_shallow_up = n_levels - boundary
        for i in range(first_shallow_up):
            lvl = n_levels - 1 - i
            blk = params["up_blocks"][i]
            for j, res in enumerate(blk["resnets"]):
                h = jnp.concatenate([h, dskips.pop()], axis=-1)
                h = _resnet_apply(res, h, temb, groups, None, lvl)
                if blk["attentions"]:
                    h = _transformer_apply(
                        blk["attentions"][j], h, ehs, cfg.num_heads[lvl],
                        groups, cfg.use_linear_projection, None, lvl)
            h = _upsample_2x(h, None, lvl)
            h = L.conv2d(blk["upsample"], h)
        assert not dskips
        return h

    def apply(self, params, sample, timesteps, encoder_hidden_states,
              added_cond=None, ctx: Any = None, cache: Any = None,
              cache_state: Any = None, deep_mode: Optional[str] = None,
              deep_state: Any = None, deep_boundary: Optional[int] = None,
              row_valid: Any = None, compact_sync: bool = False,
              deep_sel: Any = None):
        """Denoise forward.

        sample: (B, H, W, C) dense latents, or (P, ph, pw, C) patches with ctx.
        timesteps: (B,) — with ctx, per-IMAGE (ctx broadcasts to patches).
        encoder_hidden_states: (B_img, L, D).
        cache / cache_state: optional BlockCache + state pytree (patch path
        only); when given, returns (out, new_cache_state).
        deep_mode: temporal deep-block reuse — the static-shape TPU adaptation
        of the reference's per-patch block cache (cache_manager.py:84-191;
        same temporal redundancy, exploited uniformly so no dynamic gathers):
          "full"    — compute everything, also return the deep feature
                      (output of the deepest up block, post-upsample);
          "shallow" — skip levels >= deep_boundary (down tail + mid + deep up
                      blocks) and resume from the cached deep feature;
          "partial" — ROW-GRANULAR warmup (dense path only): shallow spine
                      for every row, deep tail for just the ``deep_sel``
                      request rows (int32[k] request indices; both CFG
                      halves of each selected request run), scattering
                      their fresh deep features into ``deep_state`` — the
                      serving fix for batch-wide warmup fulls flooring the
                      deep schedule under rolling admissions (the TPU
                      static-k analog of the reference's per-patch cache
                      granularity, cache_manager.py:84-99).
        Returns (out, deep_feature) when deep_mode is given.
        """
        cfg = self.cfg
        hybrid = (deep_mode is not None and cache is not None
                  and getattr(cache.config, "deep_compact_fraction", None)
                  is not None)
        if deep_mode == "partial":
            if ctx is not None or (cache is not None and not hybrid):
                raise ValueError("deep_mode='partial' is dense-path only; "
                                 "the only composing cache is the deep x "
                                 "compact hybrid")
            if deep_sel is None or deep_state is None:
                raise ValueError("deep_mode='partial' needs deep_sel + "
                                 "deep_state")
        if deep_mode is not None and cache is not None and not hybrid:
            # the deep-mode return (out, deep_feature) would silently drop
            # the new cache state: gates would splice against a frozen
            # reference forever
            raise ValueError("deep_mode and cache are mutually exclusive "
                             "(set CacheConfig.deep_compact_fraction for "
                             "the hybrid, which returns all three)")
        n_levels = len(cfg.block_out_channels)
        boundary = deep_boundary if deep_boundary is not None else n_levels - 1
        temb = self.time_embed(params, timesteps, added_cond, dtype=sample.dtype)
        t_norm = timesteps.astype(jnp.float32) / 1000.0
        if ctx is not None:
            temb = ctx.broadcast_to_patches(temb)
            t_norm = ctx.per_patch(t_norm)
        new_state: dict = {}
        caching = cache is not None and cache_state is not None
        # Compact top-K recompute, two row regimes (cache/manager.py): dense
        # rows (images) are independent -> gate_compact gathers rows; patch
        # rows couple through per-image group-norm/attention -> the coupling
        # unit is the image, so gate_compact_images gathers whole
        # drift-ranked images per resolution class into the static canonical
        # sub-composition (ops.patching.compact_submeta) and runs the pair
        # there EXACTLY (per-image GN/halo/attention all self-contained).
        compact = caching and cache.config.mode == "compact" and ctx is None
        patch_compact = (caching and cache.config.mode == "compact"
                         and ctx is not None)
        if compact:
            n_active = max(1, round(sample.shape[0]
                                    * cache.config.compact_fraction))
            if compact_sync:
                # ANCHORING sync step (fresh composition state): full
                # capacity selects every row, so the state's out rows are
                # real before any splice — splicing a fresh entry's zero
                # "out" rows was the first-step corruption the composition
                # store made visible (pipelines/base.py _comp_state_entry)
                n_active = sample.shape[0]
        if hybrid:
            # deep x compact hybrid (CacheConfig.deep_compact_fraction):
            # SHALLOW steps gate their pairs at top-K row capacity; FULL
            # steps compute everything and write the row caches through
            # (inp/out refresh + hits reset), bounding row staleness by the
            # deep refresh policy itself.  Dense path: row (image) gating;
            # patch path: image-granular gating via the canonical
            # sub-composition (rows couple through GN/halo/attention).
            if ctx is None:
                # partial steps gate their shallow spine exactly like
                # shallow steps (the deep tail for the selected rows stays
                # ungated — tail blocks are not in shallow_cache_layout)
                compact = caching and deep_mode in ("shallow", "partial")
                patch_compact = False
                n_active = max(1, round(sample.shape[0]
                                        * cache.config.deep_compact_fraction))
            else:
                patch_compact = caching and deep_mode == "shallow"
                compact = False
        sub_ctx = caps = None
        if patch_compact:
            from sduss_tpu.ops.patch_ctx import PatchContext
            from sduss_tpu.ops.patching import compact_submeta

            sub_meta, caps = compact_submeta(
                ctx.meta.patch_cells, ctx.meta.class_info,
                cache.config.deep_compact_fraction if hybrid
                else cache.config.compact_fraction,
                even=hybrid)  # pair-coherent caps under the hybrid
            # static composition => its index arrays are trace constants
            sub_ctx = PatchContext(sub_meta)
        ehs = encoder_hidden_states

        def gated(key, x, compute_fn):
            # compute_fn(x_rows, temb_rows, ehs_rows, ctx_rows) — pair body
            if not caching:
                return compute_fn(x, temb, ehs, ctx)
            st = cache_state.get(key)
            if st is None:  # ungated level (below cache min_level)
                return compute_fn(x, temb, ehs, ctx)
            if hybrid and deep_mode == "full":
                # write-through: full steps recompute everything and
                # re-anchor the row caches (drift reference + hits reset),
                # so row staleness is bounded by the deep refresh policy
                y = compute_fn(x, temb, ehs, ctx)
                ns = {"inp": x, "out": y,
                      "hits": jnp.zeros_like(st["hits"])}
                if "slope" in st:
                    # reuse-then-predict (CacheConfig.compact_predict):
                    # a full recompute of every row measures each row's
                    # velocity against its previous cached out (gap =
                    # gated steps since that write); rows never written
                    # (the zeros init) keep slope 0
                    gap = (st["hits"] + 1).astype(jnp.float32)
                    g = gap.reshape((-1,) + (1,) * (y.ndim - 1))
                    ok = st["seen"].reshape((-1,) + (1,) * (y.ndim - 1))
                    sl = (y.astype(jnp.float32)
                          - st["out"].astype(jnp.float32)) / g
                    ns["slope"] = jnp.where(ok, sl, 0.0).astype(y.dtype)
                    ns["seen"] = jnp.ones_like(st["seen"])
                new_state[key] = ns
                return y
            if compact:
                fn = lambda x_c, idx: compute_fn(x_c, temb[idx], ehs[idx], None)  # noqa: E731
                if hybrid and getattr(cache.config, "deep_compact_pairwise",
                                      False):
                    y, ns, _ = cache.gate_compact_pairs(
                        key, x, t_norm, st, fn,
                        max(1, round(x.shape[0] // 2
                                     * cache.config.deep_compact_fraction)),
                        row_valid=row_valid)
                else:
                    y, ns, _ = cache.gate_compact(key, x, t_norm, st, fn,
                                                  n_active,
                                                  row_valid=row_valid)
            elif patch_compact:
                if cache.config.patch_fraction < 1.0 and not hybrid:
                    # two-level: per-patch tail compaction inside the
                    # sub-composition (compute_fn returns tok_sel rows only)
                    fn = lambda x_s, gidx, imgs, sel: compute_fn(  # noqa: E731
                        x_s, temb[gidx], ehs[imgs], sub_ctx, tok_sel=sel)
                else:
                    fn = lambda x_s, gidx, imgs: compute_fn(  # noqa: E731
                        x_s, temb[gidx], ehs[imgs], sub_ctx)
                y, ns, _ = cache.gate_compact_images(
                    key, x, t_norm, st, fn, ctx, caps,
                    # hybrid: symmetrize each CFG pair's scores (the
                    # doubled meta's halves are offset by i_pad/2) and
                    # gate at image granularity only
                    cfg_pair_offset=(ctx.meta.i_pad // 2 if hybrid
                                     else None),
                    two_level=not hybrid)
            else:
                y, ns, _ = cache.gate(key, x, t_norm, st,
                                      lambda xx: compute_fn(xx, temb, ehs, ctx))
            if ns is not None:
                new_state[key] = ns
            return y

        shallow = deep_mode in ("shallow", "partial")
        h = _conv(params["conv_in"], sample, ctx, 0)
        skips = [h]
        for i, blk in enumerate(params["down_blocks"]):
            if shallow and i >= boundary:
                break
            for j, res in enumerate(blk["resnets"]):

                def down_pair(x, temb_l, ehs_l, ctx_l, tok_sel=None, res=res,
                              blk=blk, i=i, j=j):
                    y = _resnet_apply(res, x, temb_l, cfg.norm_num_groups, ctx_l, i)
                    if blk["attentions"]:
                        return _transformer_apply(blk["attentions"][j], y,
                                                  ehs_l,
                                                  cfg.num_heads[i], cfg.norm_num_groups,
                                                  cfg.use_linear_projection, ctx_l, i,
                                                  tok_sel=tok_sel)
                    return y if tok_sel is None else y[tok_sel]

                h = gated(f"down{i}.{j}", h, down_pair)
                skips.append(h)
            if "downsample" in blk:
                # the level-(boundary-1) downsample feeds only the deep tail
                if shallow and i == boundary - 1:
                    break
                h = _conv(blk["downsample"], h, ctx, i, stride=2)
                skips.append(h)

        deep_feature = None
        if deep_mode == "partial":
            # Deep tail for the selected request rows only (both CFG halves:
            # rows i and i + B/2 — pair-symmetric by construction, the
            # property the hybrid needed explicit pairwise selection for).
            half = h.shape[0] // 2
            sel2 = jnp.concatenate([deep_sel, deep_sel + half], axis=0)
            hd = self._deep_tail(params, h[sel2], temb[sel2], ehs[sel2],
                                 boundary)
            new_deep = deep_state.at[sel2].set(hd.astype(deep_state.dtype))
            deep_feature = new_deep
            h = new_deep.astype(h.dtype)
        elif shallow:
            h = deep_state.astype(h.dtype)
            deep_feature = deep_state
        else:
            mid = params["mid_block"]

            def mid_fn(x, temb_l, ehs_l, ctx_l, tok_sel=None):
                # conv follows attention here, so per-patch tail compaction
                # cannot skip rows (halos need every patch); compute fully
                # and return the selected rows (mid runs at the deepest,
                # cheapest level).
                y = _resnet_apply(mid["resnets"][0], x, temb_l, cfg.norm_num_groups, ctx_l, n_levels - 1)
                y = _transformer_apply(mid["attentions"][0], y, ehs_l,
                                       cfg.num_heads[-1], cfg.norm_num_groups,
                                       cfg.use_linear_projection, ctx_l, n_levels - 1)
                y = _resnet_apply(mid["resnets"][1], y, temb_l, cfg.norm_num_groups, ctx_l, n_levels - 1)
                return y if tok_sel is None else y[tok_sel]

            h = gated("mid", h, mid_fn)

        first_shallow_up = n_levels - boundary  # first up block with lvl < boundary
        for i, blk in enumerate(params["up_blocks"]):
            lvl = n_levels - 1 - i
            if shallow and i < first_shallow_up:
                continue
            if deep_mode == "full" and i == first_shallow_up:
                deep_feature = h
            for j, res in enumerate(blk["resnets"]):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)

                def up_pair(x, temb_l, ehs_l, ctx_l, tok_sel=None, res=res,
                            blk=blk, i=i, j=j, lvl=lvl):
                    y = _resnet_apply(res, x, temb_l, cfg.norm_num_groups, ctx_l, lvl)
                    if blk["attentions"]:
                        return _transformer_apply(blk["attentions"][j], y,
                                                  ehs_l,
                                                  cfg.num_heads[lvl], cfg.norm_num_groups,
                                                  cfg.use_linear_projection, ctx_l, lvl,
                                                  tok_sel=tok_sel)
                    return y if tok_sel is None else y[tok_sel]

                h = gated(f"up{i}.{j}", h, up_pair)
            if "upsample" in blk:
                h = _upsample_2x(h, ctx, lvl)
                h = _conv(blk["upsample"], h, ctx, lvl - 1)

        h = _gn_silu_conv(params["conv_norm_out"], params["conv_out"], h,
                          cfg.norm_num_groups, ctx, 0)
        if deep_mode is not None:
            if caching:  # deep x compact hybrid
                return h, deep_feature, new_state
            return h, deep_feature
        if cache is not None and cache_state is not None:
            return h, new_state
        return h
