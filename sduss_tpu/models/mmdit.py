"""SD3 MMDiT (SD3Transformer2DModel) in pure functional JAX.

Rebuild of the denoiser the reference wraps with PatchSD3Transformer2DModel
(sduss/model_executor/modules/SD3Transformer.py:25-262): joint latent+text
attention blocks with AdaLayerNorm-Zero modulation, 2x2 patch embedding with
cropped 2D sin-cos position grid, optional per-head qk RMS-norm and dual
self-attention layers (SD-3.5-medium).

The sequence design is patch-batching-friendly: the latent token sequence is
produced per image after position embedding, so the mixed-resolution path
(sduss_tpu/ops) can slice token runs into fixed-size groups exactly like the
reference's split_sample_sd3.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sduss_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    num_layers: int = 24
    num_heads: int = 24
    head_dim: int = 64
    joint_attention_dim: int = 4096  # T5 feature width
    pooled_projection_dim: int = 2048  # CLIP-L + CLIP-G pooled concat
    pos_embed_max_size: int = 384
    qk_norm: bool = True
    dual_attention_layers: Tuple[int, ...] = tuple(range(13))
    sample_size: int = 128
    pos_embed_base_size: int = 64

    @property
    def dim(self) -> int:
        return self.num_heads * self.head_dim


SD35_MEDIUM = MMDiTConfig()
TINY_MMDIT = MMDiTConfig(
    in_channels=4, out_channels=4, num_layers=2, num_heads=2, head_dim=16,
    joint_attention_dim=32, pooled_projection_dim=32, pos_embed_max_size=32,
    dual_attention_layers=(0,), sample_size=8, pos_embed_base_size=8,
)


def sincos_2d_pos_embed(dim: int, grid_size: int, base_size: int) -> np.ndarray:
    """2D sin-cos position embedding, (grid_size*grid_size, dim), float32.

    Matches diffusers.get_2d_sincos_pos_embed with interpolation_scale=1:
    grid coords are scaled by base_size/grid_size.
    """
    pos = np.arange(grid_size, dtype=np.float64) / (grid_size / base_size)
    grid = np.meshgrid(pos, pos)  # [x(w), y(h)] each (H, W)

    def _1d(d, p):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", p.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = _1d(dim // 2, grid[1])
    emb_w = _1d(dim // 2, grid[0])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


class SD3Transformer2DModel:
    def __init__(self, cfg: MMDiTConfig):
        self.cfg = cfg
        # Full max-size grid; cropped per resolution at call time.
        self._pos_embed_full = sincos_2d_pos_embed(
            cfg.dim, cfg.pos_embed_max_size, cfg.pos_embed_base_size
        ).reshape(cfg.pos_embed_max_size, cfg.pos_embed_max_size, cfg.dim)

    # -- init ---------------------------------------------------------------

    def _attn_init(self, k, joint: bool, last_block: bool = False):
        cfg = self.cfg
        d = cfg.dim
        keys = iter(jax.random.split(k, 8))
        p = {
            "to_q": L.linear_init(next(keys), d, d),
            "to_k": L.linear_init(next(keys), d, d),
            "to_v": L.linear_init(next(keys), d, d),
            "to_out": L.linear_init(next(keys), d, d),
        }
        if cfg.qk_norm:
            p["norm_q"] = L.rms_norm_init(cfg.head_dim)
            p["norm_k"] = L.rms_norm_init(cfg.head_dim)
        if joint:
            p["add_q_proj"] = L.linear_init(next(keys), d, d)
            p["add_k_proj"] = L.linear_init(next(keys), d, d)
            p["add_v_proj"] = L.linear_init(next(keys), d, d)
            if cfg.qk_norm:
                p["norm_added_q"] = L.rms_norm_init(cfg.head_dim)
                p["norm_added_k"] = L.rms_norm_init(cfg.head_dim)
            if not last_block:
                p["to_add_out"] = L.linear_init(next(keys), d, d)
        return p

    def init(self, rng) -> dict:
        cfg = self.cfg
        d = cfg.dim
        keys = iter(jax.random.split(rng, 16 + 8 * cfg.num_layers))
        p: dict = {
            "patch_embed": L.conv_init(next(keys), cfg.in_channels, d, cfg.patch_size),
            "timestep_embedder": {
                "linear_1": L.linear_init(next(keys), 256, d),
                "linear_2": L.linear_init(next(keys), d, d),
            },
            "text_embedder": {
                "linear_1": L.linear_init(next(keys), cfg.pooled_projection_dim, d),
                "linear_2": L.linear_init(next(keys), d, d),
            },
            "context_embedder": L.linear_init(next(keys), cfg.joint_attention_dim, d),
            "blocks": [],
            "norm_out_proj": L.linear_init(next(keys), d, 2 * d),
            "proj_out": L.linear_init(next(keys), d, cfg.patch_size**2 * cfg.out_channels),
        }
        for i in range(cfg.num_layers):
            last = i == cfg.num_layers - 1
            dual = i in cfg.dual_attention_layers
            blk = {
                "norm1_proj": L.linear_init(next(keys), d, (9 if dual else 6) * d),
                "norm1_context_proj": L.linear_init(next(keys), d, 2 * d if last else 6 * d),
                "attn": self._attn_init(next(keys), joint=True, last_block=last),
                "ff1": L.linear_init(next(keys), d, 4 * d),
                "ff2": L.linear_init(next(keys), 4 * d, d),
            }
            if not last:
                blk["ff_context1"] = L.linear_init(next(keys), d, 4 * d)
                blk["ff_context2"] = L.linear_init(next(keys), 4 * d, d)
            if dual:
                blk["attn2"] = self._attn_init(next(keys), joint=False)
            p["blocks"].append(blk)
        return p

    # -- forward helpers ----------------------------------------------------

    def pos_embed(self, h_patches: int, w_patches: int) -> jnp.ndarray:
        """Center-cropped position grid (h*w, dim) for a given latent size."""
        m = self.cfg.pos_embed_max_size
        top = (m - h_patches) // 2
        left = (m - w_patches) // 2
        crop = self._pos_embed_full[top : top + h_patches, left : left + w_patches]
        return jnp.asarray(crop.reshape(h_patches * w_patches, self.cfg.dim))

    def embed_latents(self, params, latents, ctx=None):
        """(B,H,W,C) latents -> (B, h*w, dim) tokens with position added.

        With a sharded ctx (rows of the latent on different devices), the
        position grid rows come from the ctx (global crop, local slice).
        """
        cfg = self.cfg
        x = L.conv2d(params["patch_embed"], latents, stride=cfg.patch_size, padding="VALID")
        b, hp, wp, d = x.shape
        x = x.reshape(b, hp * wp, d)
        if ctx is not None and hasattr(ctx, "pos_embed_rows"):
            pe = ctx.pos_embed_rows(self, hp, wp)
        else:
            pe = self.pos_embed(hp, wp)
        return x + pe.astype(x.dtype)[None]

    def time_text_embed(self, params, timesteps, pooled, dtype):
        te = L.timestep_embedding(timesteps, 256).astype(dtype)
        emb = L.linear(params["timestep_embedder"]["linear_2"],
                       jax.nn.silu(L.linear(params["timestep_embedder"]["linear_1"], te)
                                   .astype(jnp.float32)).astype(dtype))
        pe = L.linear(params["text_embedder"]["linear_2"],
                      jax.nn.silu(L.linear(params["text_embedder"]["linear_1"], pooled.astype(dtype))
                                  .astype(jnp.float32)).astype(dtype))
        return emb + pe

    def _heads(self, x):
        b, s, d = x.shape
        return x.reshape(b, s, self.cfg.num_heads, self.cfg.head_dim)

    def _qk_norm(self, p, q, k, prefix=""):
        if not self.cfg.qk_norm:
            return q, k
        q = L.rms_norm(p[f"norm_{prefix}q"], q)
        k = L.rms_norm(p[f"norm_{prefix}k"], k)
        return q, k

    def _attention_seq(self, q, k, v, ctx=None, s_lat: int = None):
        """(B,S,H,D) heads attention; masked/sharded when ctx is given.

        ``s_lat``: number of leading LATENT tokens in the (possibly joint)
        sequence — sharded contexts gather only the latent KV across devices
        (text context tokens are replicated)."""
        cfg = self.cfg
        b, s, nh, hd = q.shape
        if ctx is not None:
            return ctx.mmdit_attention(q, k, v, s_lat if s_lat is not None else s)
        from sduss_tpu.ops.attention import masked_attention

        # identical math to L.attention; additionally dispatches to the flash
        # kernel when enabled (37 attention ops over ~4.4k tokens dominate
        # the 1024^2 step)
        out = masked_attention(
            q.reshape(b, s, nh * hd), k.reshape(b, k.shape[1], nh * hd),
            v.reshape(b, v.shape[1], nh * hd), cfg.num_heads)
        return out

    def _joint_block(self, p, x, c, temb, last: bool, dual: bool, ctx=None,
                     tok_sel=None, kv_state=None, kv_stale: bool = False,
                     kv_out=None):
        """One MMDiT joint block.

        ``tok_sel`` (B, k_t): per-token fine compaction
        (cache.manager.gate_tokens_fine) — attention queries and the FF run
        only on these latent tokens and their residual deltas scatter back;
        K/V and the context stream stay full, so attention context is exact.
        This also composes with a sharded ctx (MMDiTShardContext): only the
        QUERIES are gated, K/V stay the full local rows, so the
        gathered/stale KV exchange is shape- and value-identical to the
        ungated path — the fine gate runs per shard on local tokens.

        ``kv_state``/``kv_stale``/``kv_out`` (CacheConfig.fine_stale_kv):
        merged-heads post-qk-norm K/V rows carried across steps.  With
        kv_stale (static — its own compiled program) only the SELECTED
        tokens run norm/modulation/to_k/to_v; the rest splice the previous
        step's rows, killing the per-step full-sequence costs that cap the
        fine cache (~118 ms at any fraction, exp/bench_sd3_v5e_r2_compact35
        .json).  Without kv_stale (the sync program) K/V compute is exactly
        the plain gated path and fresh full rows are emitted into
        ``kv_out``.  Exact at patch_fraction 1.0."""
        cfg = self.cfg
        bix = None if tok_sel is None else jnp.arange(x.shape[0])[:, None]

        def gather_tokens(arr):
            return jnp.take_along_axis(arr, tok_sel[..., None], axis=1)

        silu_t = jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype)
        mods = L.linear(p["norm1_proj"], silu_t)
        n_mod = 9 if dual else 6
        mods = jnp.split(mods, n_mod, axis=-1)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods[:6]

        stale_kv = kv_state is not None and tok_sel is not None and kv_stale
        if stale_kv:
            # only the selected rows are normalized/modulated this step
            xn = None
            xn_sel = L.layer_norm(None, gather_tokens(x), 1e-6)
            x_mod = None
            x_mod_sel = xn_sel * (1 + scale_msa[:, None]) + shift_msa[:, None]
        else:
            xn = L.layer_norm(None, x, 1e-6)
            x_mod = xn * (1 + scale_msa[:, None]) + shift_msa[:, None]

        cmods = L.linear(p["norm1_context_proj"], silu_t)
        if last:
            # AdaLayerNormContinuous: [scale, shift] chunks.
            c_scale, c_shift = jnp.split(cmods, 2, axis=-1)
            cn = L.layer_norm(None, c, 1e-6)
            c_mod = cn * (1 + c_scale[:, None]) + c_shift[:, None]
            c_gate = None
        else:
            (c_shift_msa, c_scale_msa, c_gate_msa,
             c_shift_mlp, c_scale_mlp, c_gate_mlp) = jnp.split(cmods, 6, axis=-1)
            cn = L.layer_norm(None, c, 1e-6)
            c_mod = cn * (1 + c_scale_msa[:, None]) + c_shift_msa[:, None]
            c_gate = c_gate_msa

        ap = p["attn"]
        if stale_kv:
            q = self._heads(L.linear(ap["to_q"], x_mod_sel))
            k_s = self._heads(L.linear(ap["to_k"], x_mod_sel))
            v_s = L.linear(ap["to_v"], x_mod_sel)          # merged (B,k_t,D)
            q, k_s = self._qk_norm(ap, q, k_s)
            k_m = kv_state["k"].astype(x.dtype).at[bix, tok_sel].set(
                k_s.reshape(x.shape[0], -1, cfg.dim))
            v_m = kv_state["v"].astype(x.dtype).at[bix, tok_sel].set(v_s)
            k, v = self._heads(k_m), self._heads(v_m)
            if kv_out is not None:
                kv_out["k"], kv_out["v"] = k_m, v_m
        else:
            q_src = x_mod if tok_sel is None else gather_tokens(x_mod)
            q = self._heads(L.linear(ap["to_q"], q_src))
            k = self._heads(L.linear(ap["to_k"], x_mod))
            v = self._heads(L.linear(ap["to_v"], x_mod))
            q, k = self._qk_norm(ap, q, k)
            if kv_state is not None and kv_out is not None:
                # sync program: emit fresh full rows for the next stale step
                kv_out["k"] = k.reshape(
                    x.shape[0], -1, cfg.dim).astype(x.dtype)
                kv_out["v"] = v.reshape(
                    x.shape[0], -1, cfg.dim).astype(x.dtype)
        cq = self._heads(L.linear(ap["add_q_proj"], c_mod))
        ck = self._heads(L.linear(ap["add_k_proj"], c_mod))
        cv = self._heads(L.linear(ap["add_v_proj"], c_mod))
        cq, ck = self._qk_norm(ap, cq, ck, "added_")

        s_q = q.shape[1]
        qj = jnp.concatenate([q, cq], axis=1)
        kj = jnp.concatenate([k, ck], axis=1)
        vj = jnp.concatenate([v, cv], axis=1)
        attn_out = self._attention_seq(qj, kj, vj, ctx=ctx, s_lat=k.shape[1])
        x_attn, c_attn = attn_out[:, :s_q], attn_out[:, s_q:]

        x_delta = gate_msa[:, None] * L.linear(ap["to_out"], x_attn)
        if tok_sel is None:
            x = x + x_delta
        else:
            x = x.at[bix, tok_sel].add(x_delta)

        if dual:
            shift2, scale2, gate2 = mods[6:]
            a2 = p["attn2"]
            if stale_kv:
                x2_sel = xn_sel * (1 + scale2[:, None]) + shift2[:, None]
                q2 = self._heads(L.linear(a2["to_q"], x2_sel))
                k2_s = self._heads(L.linear(a2["to_k"], x2_sel))
                v2_s = L.linear(a2["to_v"], x2_sel)
                q2, k2_s = self._qk_norm(a2, q2, k2_s)
                k2_m = kv_state["k2"].astype(x.dtype).at[bix, tok_sel].set(
                    k2_s.reshape(x.shape[0], -1, cfg.dim))
                v2_m = kv_state["v2"].astype(x.dtype).at[bix, tok_sel].set(
                    v2_s)
                k2, v2 = self._heads(k2_m), self._heads(v2_m)
                if kv_out is not None:
                    kv_out["k2"], kv_out["v2"] = k2_m, v2_m
            else:
                x2 = xn * (1 + scale2[:, None]) + shift2[:, None]
                q2_src = x2 if tok_sel is None else gather_tokens(x2)
                q2 = self._heads(L.linear(a2["to_q"], q2_src))
                k2 = self._heads(L.linear(a2["to_k"], x2))
                v2 = self._heads(L.linear(a2["to_v"], x2))
                q2, k2 = self._qk_norm(a2, q2, k2)
                if kv_state is not None and kv_out is not None:
                    kv_out["k2"] = k2.reshape(
                        x.shape[0], -1, cfg.dim).astype(x.dtype)
                    kv_out["v2"] = v2.reshape(
                        x.shape[0], -1, cfg.dim).astype(x.dtype)
            out2 = self._attention_seq(q2, k2, v2, ctx=ctx, s_lat=k2.shape[1])
            d2 = gate2[:, None] * L.linear(a2["to_out"], out2)
            if tok_sel is None:
                x = x + d2
            else:
                x = x.at[bix, tok_sel].add(d2)

        x_ff_src = x if tok_sel is None else gather_tokens(x)
        xn2 = L.layer_norm(None, x_ff_src, 1e-6)
        x_ff = xn2 * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        ff = L.linear(p["ff2"], jax.nn.gelu(
            L.linear(p["ff1"], x_ff).astype(jnp.float32), approximate=True).astype(x.dtype))
        ff = gate_mlp[:, None] * ff
        if tok_sel is None:
            x = x + ff
        else:
            x = x.at[bix, tok_sel].add(ff)

        if last:
            return x, None
        c = c + c_gate[:, None] * L.linear(ap["to_add_out"], c_attn)
        cn2 = L.layer_norm(None, c, 1e-6)
        c_ff = cn2 * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        cff = L.linear(p["ff_context2"], jax.nn.gelu(
            L.linear(p["ff_context1"], c_ff).astype(jnp.float32), approximate=True).astype(c.dtype))
        c = c + c_gate_mlp[:, None] * cff
        return x, c

    # -- forward ------------------------------------------------------------

    def prelude(self, params, latents, timesteps, encoder_hidden_states,
                pooled_projections, ctx=None):
        """Embedding front: latents/time/text -> (x tokens, c context, temb).

        Pipeline-parallel stage 0 (parallel/pipeline.py) runs this plus its
        leading block span; single-device apply() uses it too."""
        x = self.embed_latents(params, latents, ctx=ctx)
        temb = self.time_text_embed(params, timesteps, pooled_projections,
                                    latents.dtype)
        c = L.linear(params["context_embedder"],
                     encoder_hidden_states.astype(latents.dtype))
        return x, c, temb

    def trunk_blocks(self, params, x, c, temb, start: int, ctx=None):
        """Run ``params['blocks']`` (a contiguous span) plain, with GLOBAL
        block indices beginning at ``start`` — dual-attention layout and the
        context-dropping last block depend on the global index, so a
        pipeline stage must know where its span sits."""
        cfg = self.cfg
        for j, blk in enumerate(params["blocks"]):
            i = start + j
            last = i == cfg.num_layers - 1
            dual = i in cfg.dual_attention_layers
            x, c2 = self._joint_block(blk, x, c, temb, last, dual, ctx=ctx)
            c = c2 if c2 is not None else c
        return x, c

    def head(self, params, x, temb):
        """Final AdaLN modulation + projection to output tokens."""
        silu_t = jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype)
        mods = L.linear(params["norm_out_proj"], silu_t)
        scale, shift = jnp.split(mods, 2, axis=-1)
        x = L.layer_norm(None, x, 1e-6) * (1 + scale[:, None]) + shift[:, None]
        return L.linear(params["proj_out"], x)

    def _trunk(self, params, x, c, temb, ctx=None, cache=None,
               cache_state=None, t_norm=None, row_valid=None,
               fine_kv_stale: bool = False, compact_sync: bool = False,
               deep_mode=None, deep_span=None, deep_state=None):
        """Joint blocks + final modulation/projection over token sequences.

        With cache/cache_state: per-block per-request output caching over the
        LATENT token stream (the MMDiT analog of the reference's per-block
        CacheManagers in PatchSD3Transformer, modules/SD3Transformer.py:25-262
        with max 2 consecutive hits).  Returns (tokens, new_cache_state).

        deep_mode/deep_span/deep_state: SPAN-SKIP deep cache — the MMDiT
        analog of the UNet's temporal deep-block reuse (unet.py apply
        deep_mode; reference DeepCache semantics, modules/cache_manager.py).
        A transformer trunk has no encoder/decoder skip seam, so the cached
        feature is the residual CONTRIBUTION of a contiguous block span
        ``[lo, hi)``: on a "full" step every block runs and the span's delta
        ``dx = x_at_hi - x_at_lo`` (plus the evolved context ``c_at_hi`` when
        the span is interior) is emitted; on a "shallow" step blocks in the
        span are skipped and the cached delta is spliced in at ``lo`` — the
        fresh prefix/tail still run, and the AdaLN head always modulates with
        the CURRENT timestep.  Composes with the per-block token gates (the
        deep x compact hybrid): gated blocks outside the span run normally,
        skipped blocks pass their cache rows through untouched.
        Returns append ``deep_out`` (the {"dx"[, "c"]} pytree) when
        deep_mode is given: full emits fresh deltas, shallow passes
        ``deep_state`` through so lax.cond branches carry one structure.
        """
        cfg = self.cfg
        new_state: dict = {}
        caching = cache is not None and cache_state is not None
        deep = deep_mode is not None
        if deep:
            lo, hi = deep_span
            if not (0 <= lo < hi <= cfg.num_layers):
                raise ValueError(f"deep_span {deep_span} out of range for "
                                 f"{cfg.num_layers} blocks")
            if deep_mode == "shallow" and deep_state is None:
                raise ValueError("shallow deep_mode needs deep_state")
            x_lo = None
            deep_out = deep_state
        if not caching and not deep:
            x, c = self.trunk_blocks(params, x, c, temb, start=0, ctx=ctx)
            return self.head(params, x, temb)
        compact = caching and cache.config.mode == "compact"
        token_fine = (compact
                      and getattr(cache.config, "patch_fraction", 1.0) < 1.0)
        if token_fine:
            # Per-TOKEN delta-skip compaction (each token = one 2x2 latent
            # patch — the reference's finest SD3 cache granularity).  At
            # batch 1 CFG the request-granular gate below can only
            # alternate the cond/uncond pair; this is the real granularity.
            k_t = max(1, round(x.shape[1] * cache.config.patch_fraction))
            token_valid = ctx.token_mask if hasattr(ctx, "token_mask") else None
        elif compact:
            if ctx is not None and not hasattr(ctx, "gather"):
                raise ValueError(
                    "request-granular compact caching needs ctx.gather "
                    "(row sub-batches); on sharded contexts use the "
                    "per-token fine flavor (patch_fraction < 1), whose "
                    "gated queries compose with the KV exchange")
            n_active = max(1, round(x.shape[0] * cache.config.compact_fraction))
            if compact_sync:
                # ANCHORING sync step for a fresh composition's state: full
                # capacity recomputes every row so the out rows are real
                # before any splice (pipelines/sd3.py _sd3_state_entry)
                n_active = x.shape[0]
        for i, blk in enumerate(params["blocks"]):
            last = i == cfg.num_layers - 1
            dual = i in cfg.dual_attention_layers
            if deep:
                if deep_mode == "full" and i == lo:
                    x_lo = x
                if i == hi:
                    if deep_mode == "full":
                        deep_out = {"dx": x - x_lo}
                        if hi < cfg.num_layers:
                            deep_out["c"] = c
                    else:
                        x = x + deep_state["dx"].astype(x.dtype)
                        if "c" in deep_state:
                            c = deep_state["c"].astype(c.dtype)
                if deep_mode == "shallow" and lo <= i < hi:
                    # skipped span: block-cache rows pass through untouched so
                    # full/shallow programs carry one state structure
                    if caching:
                        st = cache_state.get(f"block{i}")
                        if st is not None:
                            new_state[f"block{i}"] = st
                    continue
            if token_fine:
                key = f"block{i}"
                st = cache_state.get(key)
                if st is None:
                    x, c2 = self._joint_block(blk, x, c, temb, last, dual,
                                              ctx=ctx)
                else:
                    def blk_fn(sel, blk=blk, last=last, dual=dual, c_in=c,
                               st=st):
                        kv_st = {kk: st[kk]
                                 for kk in ("k", "v", "k2", "v2")
                                 if kk in st} or None
                        kv_out = {}
                        y, c2 = self._joint_block(
                            blk, x, c_in, temb, last, dual, ctx=ctx,
                            tok_sel=sel, kv_state=kv_st,
                            kv_stale=fine_kv_stale, kv_out=kv_out)
                        return y, c2, kv_out

                    (x, c2, kv_out), ns, _ = cache.gate_tokens_fine(
                        key, x, t_norm, st, blk_fn, k_t,
                        token_valid=token_valid)
                    ns.update(kv_out)  # fresh splices win over passthrough
                    new_state[key] = ns
                c = c2 if c2 is not None else c
            elif compact:
                # Gather the n_active most-drifted requests, run the block on
                # the compact sub-batch, scatter into cached outputs.  Both
                # streams (x tokens AND the evolving context c) are cached —
                # under compaction inactive rows never recompute c, unlike the
                # masked-splice path where c is recomputed for every row.
                key = f"block{i}"

                def block_fn(x_c, idx, blk=blk, last=last, dual=dual, c=c):
                    y, c2 = self._joint_block(
                        blk, x_c, c[idx], temb[idx], last, dual,
                        ctx=ctx.gather(idx) if ctx is not None else None)
                    return {"x": y, "c": c2 if c2 is not None else c[idx]}

                out, ns, _ = cache.gate_compact(
                    key, x, t_norm, cache_state.get(key), block_fn, n_active,
                    row_valid=row_valid)
                x, c = out["x"], out["c"]
                if ns is not None:
                    new_state[key] = ns
            elif caching:
                key = f"block{i}"
                c_holder = [c]

                def block_fn(x_in, blk=blk, last=last, dual=dual, c_holder=c_holder):
                    y, c2 = self._joint_block(blk, x_in, c_holder[0], temb,
                                              last, dual, ctx=ctx)
                    c_holder[0] = c2 if c2 is not None else c_holder[0]
                    return y

                x, ns, _ = cache.gate(key, x, t_norm, cache_state.get(key),
                                      block_fn)
                c = c_holder[0]
                if ns is not None:
                    new_state[key] = ns
            else:
                x, c = self._joint_block(blk, x, c, temb, last, dual, ctx=ctx)

        if deep and hi == cfg.num_layers:
            if deep_mode == "full":
                deep_out = {"dx": x - x_lo}
            else:
                x = x + deep_state["dx"].astype(x.dtype)
        out = self.head(params, x, temb)
        if deep and caching:
            return out, new_state, deep_out
        if deep:
            return out, deep_out
        return out, new_state

    def unpatchify(self, x, hp: int, wp: int):
        """(B, hp*wp, ps*ps*C) -> (B, H, W, C)."""
        cfg = self.cfg
        ps = cfg.patch_size
        b = x.shape[0]
        x = x[:, : hp * wp].reshape(b, hp, wp, ps, ps, cfg.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, hp * ps, wp * ps, cfg.out_channels)

    def apply(self, params, latents, timesteps, encoder_hidden_states, pooled_projections,
              ctx=None, cache=None, cache_state=None,
              fine_kv_stale: bool = False,
              deep_mode=None, deep_span=None, deep_state=None):
        """Denoise forward.

        latents: (B, H, W, C); timesteps: (B,); encoder_hidden_states:
        (B, L, joint_attention_dim) T5+CLIP token features; pooled_projections:
        (B, pooled_projection_dim).
        Returns velocity prediction (B, H, W, C); with cache/cache_state
        (token caches over the spatial path) returns
        (prediction, new_cache_state).  Only the per-TOKEN fine flavor
        (patch_fraction < 1) composes with a sharded ctx — the gate runs
        per shard on local tokens; request-granular compact needs
        ctx.gather and raises on sharded contexts.
        """
        cfg = self.cfg
        b, hh, ww, _ = latents.shape
        hp, wp = hh // cfg.patch_size, ww // cfg.patch_size

        x, c, temb = self.prelude(params, latents, timesteps,
                                  encoder_hidden_states,
                                  pooled_projections, ctx=ctx)
        caching = cache is not None and cache_state is not None
        if caching or deep_mode is not None:
            t_norm = timesteps.astype("float32") / 1000.0
            out = self._trunk(params, x, c, temb, ctx=ctx,
                              cache=cache if caching else None,
                              cache_state=cache_state if caching else None,
                              t_norm=t_norm,
                              fine_kv_stale=fine_kv_stale,
                              deep_mode=deep_mode, deep_span=deep_span,
                              deep_state=deep_state)
            return (self.unpatchify(out[0], hp, wp),) + tuple(out[1:])
        x = self._trunk(params, x, c, temb, ctx=ctx)
        return self.unpatchify(x, hp, wp)

    def token_cache_layout(self, seq: int):
        """Cache-row layout for apply_tokens caching: key -> (seq, dim)."""
        return {f"block{i}": (seq, self.cfg.dim)
                for i in range(self.cfg.num_layers)}

    def apply_tokens(self, params, tokens, token_mask, timesteps,
                     encoder_hidden_states, pooled_projections,
                     cache=None, cache_state=None, row_valid=None,
                     fine_kv_stale: bool = False,
                     compact_sync: bool = False,
                     deep_mode=None, deep_span=None, deep_state=None):
        """Mixed-resolution forward over PADDED token sequences.

        tokens: (B, S_pad, dim) patch-embedded + position-embedded latent
        tokens, right-padded per sample; token_mask: (B, S_pad) bool, True at
        real tokens.  Attention masks padded latent keys so requests of
        different resolutions share one compiled trunk — the transformer
        analog of the UNet patch batch (reference split_sample_sd3,
        modules/SD3Transformer.py:25-262).
        Returns (B, S_pad, ps*ps*C) output tokens (slice + unpatchify per
        request on the caller side).
        """
        temb = self.time_text_embed(params, timesteps, pooled_projections,
                                    tokens.dtype)
        c = L.linear(params["context_embedder"],
                     encoder_hidden_states.astype(tokens.dtype))
        ctx = MMDiTMaskCtx(token_mask, c.shape[1])
        t_norm = timesteps.astype("float32") / 1000.0
        return self._trunk(params, tokens, c, temb, ctx=ctx, cache=cache,
                           cache_state=cache_state, t_norm=t_norm,
                           row_valid=row_valid, fine_kv_stale=fine_kv_stale,
                           compact_sync=compact_sync,
                           deep_mode=deep_mode, deep_span=deep_span,
                           deep_state=deep_state)


class MMDiTMaskCtx:
    """Masked-attention context for padded mixed-resolution token batches.

    Joint attention (latent+text keys) masks padded latent keys; dual/self
    attention (latent keys only) masks the same rows.  Padded QUERY rows
    produce garbage that never flows into real tokens (masked as keys) and is
    sliced away before unpatchify.
    """

    def __init__(self, token_mask, ctx_len: int):
        self.token_mask = token_mask
        self.ctx_len = ctx_len

    def gather(self, idx):
        """Row-gathered view for compact-cache sub-batches."""
        return MMDiTMaskCtx(self.token_mask[idx], self.ctx_len)

    def mmdit_attention(self, q, k, v, s_lat: int):
        from sduss_tpu.ops.attention import masked_attention

        b, s, nh, hd = q.shape
        s_lat = self.token_mask.shape[1]
        if k.shape[1] == s_lat + self.ctx_len:
            kv_mask = jnp.concatenate(
                [self.token_mask,
                 jnp.ones((b, self.ctx_len), self.token_mask.dtype)], axis=1)
        else:
            kv_mask = self.token_mask
        return masked_attention(
            q.reshape(b, s, nh * hd), k.reshape(b, k.shape[1], nh * hd),
            v.reshape(b, v.shape[1], nh * hd), nh, kv_token_mask=kv_mask)
