"""Displaced patch parallelism: latent rows sharded over the mesh 'sp' axis.

TPU-native rebuild of the vendored DistriFuser's multi-device latency path
(reference distrifuser/distrifuser/distrifuser/utils.py:23-214 comm manager,
modules/pp/conv2d.py:43-120 halo exchange, modules/pp/attn.py:110-200 stale
full-KV self-attention, models/distri_sdxl_unet_pp.py:15-216):

* Each device holds a horizontal row-slice of the latent.  The UNet runs
  under ``shard_map``; this module provides a ``ShardContext`` for the
  model's ctx seam (sduss_tpu/models/unet.py) with explicit collectives:

  - conv: 1-row halo exchange with mesh neighbors via ``lax.ppermute``
    (zeros at the image border arrive for free — ppermute leaves untargeted
    outputs zero).  Exact, and cheap on ICI (one boundary row).
  - group norm: local moments + ``lax.psum`` — exact (the reference needed a
    corrected async groupnorm, distrifuser pp/groupnorm.py:9-98).
  - cross attention: text KV is per-image, replicated — local, exact.
  - self attention:
      sync mode  — fresh all-gather of K/V over 'sp': exact full-image
                   attention (DistriFuser's warmup_steps / NaivePatch mode).
      stale mode — K/V of REMOTE rows come from the previous step's state
                   (the "displaced" trick): the current step does no blocking
                   KV gather; it splices its own fresh rows into the stale
                   full KV and emits a fresh all-gather for the NEXT step,
                   which XLA's scheduler overlaps with remaining compute.

* Denoising runs ``warmup_steps`` sync steps, then displaced steps
  (reference warmup_steps=4, distrifuser utils.py:23-66).

Unlike the reference this needs no comm manager, buffer registry, or stream
bookkeeping: KV state is a pytree threaded through the jitted step.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sduss_tpu.models import layers as L
from sduss_tpu.models.layers import attention


class ShardContext:
    """ctx-seam implementation for H-sharded (B, H/n, W, C) activations.

    Must be constructed INSIDE shard_map.  ``kv_state`` is the previous
    step's full-KV dict (or None in sync mode before any state exists);
    ``new_kv_state`` collects this step's gathered KV for the next step.
    """

    def __init__(self, axis: str = "sp", stale: bool = False,
                 kv_state: Optional[Dict[str, Tuple]] = None):
        self.axis = axis
        self.stale = stale
        self.kv_state = kv_state or {}
        self.new_kv_state: Dict[str, Tuple] = {}
        self._layer = 0

    # -- helpers --------------------------------------------------------------

    def _n(self) -> int:
        return jax.lax.axis_size(self.axis)

    def _from_above(self, x, rows: int = 1):
        """Shard i receives the LAST `rows` rows of shard i-1 (zeros at i=0)."""
        n = self._n()
        perm = [(i, i + 1) for i in range(n - 1)]
        return jax.lax.ppermute(x[:, -rows:], self.axis, perm)

    def _from_below(self, x, rows: int = 1):
        n = self._n()
        perm = [(i, i - 1) for i in range(1, n)]
        return jax.lax.ppermute(x[:, :rows], self.axis, perm)

    # -- ctx seam -------------------------------------------------------------

    def broadcast_to_patches(self, temb):
        return temb  # batch axis is unsharded

    def per_patch(self, img_values):
        return img_values

    def conv(self, p, x, lvl: int, stride: int = 1):
        k = p["kernel"].shape[0]
        if k == 1:
            return L.conv2d(p, x, stride=stride)
        if k != 3:  # pragma: no cover
            raise NotImplementedError(f"sharded conv kernel {k}")
        up = self._from_above(x)
        if stride == 1:
            down = self._from_below(x)
            xh = jnp.concatenate([up, x, down], axis=1)
            return L.conv2d(p, xh, stride=1, padding=[(0, 0), (1, 1)])
        # stride 2: windows for local output r cover local rows 2r-1 .. 2r+1,
        # so only the top halo row is needed (H_local is even).
        xh = jnp.concatenate([up, x], axis=1)
        return L.conv2d(p, xh, stride=2, padding=[(0, 0), (1, 1)])

    def upsample_2x(self, x, lvl: int):
        return L.nearest_upsample_2x(x)  # purely local

    def gn_silu_conv(self, p_gn, p_conv, x, groups: int, eps: float, lvl: int):
        y = self.group_norm(p_gn, x, groups, eps, "silu", lvl)
        return self.conv(p_conv, y, lvl)

    def group_norm(self, p, x, groups: int, eps: float, act, lvl: int):
        """Exact per-image moments across shards: local sums + psum."""
        b, h, w, c = x.shape
        g = groups
        xf = x.astype(jnp.float32).reshape(b, h * w, g, c // g)
        s1 = jax.lax.psum(xf.sum(axis=(1, 3)), self.axis)      # (B, G)
        s2 = jax.lax.psum((xf * xf).sum(axis=(1, 3)), self.axis)
        cnt = float(h * w * (c // g)) * self._n()
        mean = s1 / cnt
        var = s2 / cnt - mean * mean
        y = (xf - mean[:, None, :, None]) * jax.lax.rsqrt(var[:, None, :, None] + eps)
        y = y.reshape(b, h, w, c) * p["scale"].astype(jnp.float32) \
            + p["bias"].astype(jnp.float32)
        if act == "silu":
            y = jax.nn.silu(y)
        return y.astype(x.dtype)

    def self_attention(self, p, h, heads: int, lvl: int):
        """h: (B, S_local, C) local token rows of the full image sequence."""
        key = f"attn{self._layer}"
        self._layer += 1
        q = L.linear(p["to_q"], h)
        k = L.linear(p["to_k"], h)
        v = L.linear(p["to_v"], h)
        s_loc = k.shape[1]
        if self.stale and key in self.kv_state:
            k_stale, v_stale = self.kv_state[key]
            idx = jax.lax.axis_index(self.axis)
            off = idx * s_loc
            k_full = jax.lax.dynamic_update_slice(k_stale.astype(k.dtype), k, (0, off, 0))
            v_full = jax.lax.dynamic_update_slice(v_stale.astype(v.dtype), v, (0, off, 0))
        else:
            k_full = jax.lax.all_gather(k, self.axis, axis=1, tiled=True)
            v_full = jax.lax.all_gather(v, self.axis, axis=1, tiled=True)
        # emit fresh full KV for the next (displaced) step; XLA overlaps the
        # gather with the remaining blocks since nothing this step consumes it
        if self.stale and key in self.kv_state:
            self.new_kv_state[key] = (
                jax.lax.all_gather(k, self.axis, axis=1, tiled=True),
                jax.lax.all_gather(v, self.axis, axis=1, tiled=True))
        else:
            self.new_kv_state[key] = (k_full, v_full)
        # NOTE: to_out is applied by the caller (models/unet.py
        # _self_attention), as for PatchContext.
        return attention(q, k_full, v_full, heads)

    def cross_attention(self, p, h, ehs, heads: int, lvl: int):
        k = L.linear(p["to_k"], ehs)
        v = L.linear(p["to_v"], ehs)
        q = L.linear(p["to_q"], h)
        return attention(q, k, v, heads)


class MMDiTShardContext:
    """Sequence-sharded MMDiT context: latent token rows over 'sp'.

    Rebuild of DistriFuser's SD3 displaced path (reference
    distrifuser/modules/pp/attn.py:202-427, models/distri_sd3_transformer_pp.py
    :14-318): each device holds a row-slice of the latent token sequence;
    joint attention gathers the remote latent K/V — fresh in sync mode, from
    the previous step's state in displaced mode (own rows always fresh).
    Text-context tokens are replicated, so their queries/keys are local.
    """

    def __init__(self, axis: str = "sp", stale: bool = False,
                 kv_state: Optional[Dict[str, Tuple]] = None,
                 kv_mode: str = "gather"):
        self.axis = axis
        self.stale = stale
        self.kv_state = kv_state or {}
        self.new_kv_state: Dict[str, Tuple] = {}
        self._layer = 0
        # "gather": all_gather full latent KV (sync or stale splice);
        # "ring": exact ring attention over the shard axis — KV shards rotate
        # via ppermute with online-softmax combine (parallel/ring.py), no
        # full-KV materialization and no staleness.
        self.kv_mode = kv_mode

    def pos_embed_rows(self, model, hp_local: int, wp: int):
        """Global position crop, this shard's row slice."""
        n = jax.lax.axis_size(self.axis)
        full = model.pos_embed(hp_local * n, wp)          # (hp*n*wp, dim)
        full = full.reshape(hp_local * n, wp, -1)
        idx = jax.lax.axis_index(self.axis)
        rows = jax.lax.dynamic_slice(
            full, (idx * hp_local, 0, 0), (hp_local, wp, full.shape[-1]))
        return rows.reshape(hp_local * wp, -1)

    def _gather_or_splice(self, key: str, k_loc, v_loc):
        """Full latent K/V across shards: gather (sync) or stale splice."""
        s_loc = k_loc.shape[1]
        if self.stale and key in self.kv_state:
            k_stale, v_stale = self.kv_state[key]
            idx = jax.lax.axis_index(self.axis)
            off = idx * s_loc
            k_full = jax.lax.dynamic_update_slice(
                k_stale.astype(k_loc.dtype), k_loc, (0, off, 0, 0))
            v_full = jax.lax.dynamic_update_slice(
                v_stale.astype(v_loc.dtype), v_loc, (0, off, 0, 0))
            self.new_kv_state[key] = (
                jax.lax.all_gather(k_loc, self.axis, axis=1, tiled=True),
                jax.lax.all_gather(v_loc, self.axis, axis=1, tiled=True))
        else:
            k_full = jax.lax.all_gather(k_loc, self.axis, axis=1, tiled=True)
            v_full = jax.lax.all_gather(v_loc, self.axis, axis=1, tiled=True)
            self.new_kv_state[key] = (k_full, v_full)
        return k_full, v_full

    def mmdit_attention(self, q, k, v, s_lat: int):
        """(B, S, H, D) joint or latent-only attention with sharded latents.

        The leading ``s_lat`` tokens of k/v are this shard's LOCAL latent
        rows; any remainder is replicated text context."""
        key = f"attn{self._layer}"
        self._layer += 1
        b, s, nh, hd = q.shape
        # joint iff the KEYS carry context rows — the query length is not a
        # valid proxy: under per-token fine compaction queries are gated to
        # k_t (+ context) rows while keys stay full, and k_t + ctx can be
        # shorter than s_lat.
        joint = k.shape[1] > s_lat
        k_lat, v_lat = k[:, :s_lat], v[:, :s_lat]
        if self.kv_mode == "ring" and not self.stale:
            from sduss_tpu.parallel.ring import ring_attention

            # Latent KV stays sharded and rotates around the ring; the
            # replicated context KV is folded in as one extra exact combine
            # (each device attends q against the full context locally).
            out_lat = ring_attention(
                q.reshape(b, s, nh * hd),
                k_lat.reshape(b, s_lat, nh * hd),
                v_lat.reshape(b, s_lat, nh * hd), nh, self.axis,
                return_stats=True)
            if joint:
                from sduss_tpu.parallel.ring import combine_partials, _partial_dense

                o1, m1, l1 = out_lat
                s_ctx = k.shape[1] - s_lat  # context KEY count, not s - s_lat
                # (query length diverges from key length under gated queries)
                o2, m2, l2 = _partial_dense(
                    q.reshape(b, s, nh * hd),
                    k[:, s_lat:].reshape(b, s_ctx, nh * hd),
                    v[:, s_lat:].reshape(b, s_ctx, nh * hd), nh,
                    1.0 / (hd ** 0.5))
                return combine_partials(o1, m1, l1, o2, m2, l2, q.dtype)
            from sduss_tpu.parallel.ring import finalize_partial

            return finalize_partial(*out_lat, q.dtype)
        k_full, v_full = self._gather_or_splice(key, k_lat, v_lat)
        if joint:  # append the replicated context K/V
            k_full = jnp.concatenate([k_full, k[:, s_lat:]], axis=1)
            v_full = jnp.concatenate([v_full, v[:, s_lat:]], axis=1)
        out = attention(q.reshape(b, s, nh * hd),
                        k_full.reshape(b, k_full.shape[1], nh * hd),
                        v_full.reshape(b, v_full.shape[1], nh * hd), nh)
        return out


class DisplacedPatchRunner:
    """Drives a denoiser under displaced patch parallelism on a mesh.

    ``model_fn(params, x, t, ctx)`` is the family-specific forward (CFG
    handling included by the caller); latents are (B, H, W, C) on the host
    side and sharded (B, H/n, W, C) inside.  ``ctx_cls`` selects the seam:
    ShardContext (UNet conv/halo families) or MMDiTShardContext (SD3).
    """

    def __init__(self, model_fn: Callable, mesh: Mesh, sampler,
                 warmup_steps: int = 4, axis: str = "sp",
                 ctx_cls: type = None):
        self.model_fn = model_fn
        self.mesh = mesh
        self.sampler = sampler
        self.warmup_steps = warmup_steps
        self.axis = axis
        self.n = mesh.shape[axis]
        self.ctx_cls = ctx_cls or ShardContext
        self._steps: Dict[bool, Callable] = {}

    def latent_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(None, self.axis, None, None))

    def _build(self, stale: bool, cached: bool = False) -> Callable:
        from jax import shard_map

        axis = self.axis
        mesh = self.mesh
        sampler = self.sampler
        model_fn = self.model_fn

        ctx_cls = self.ctx_cls

        def local_step(params, x, t, coeffs, guidance, kv_state,
                       cache_state=None):
            ctx = ctx_cls(axis=axis, stale=stale, kv_state=kv_state)
            c0, c1 = coeffs[:, 0], coeffs[:, 1]
            x_in = sampler.scale_model_input(
                jnp.concatenate([x, x], axis=0), jnp.concatenate([c0, c0]))
            t2 = jnp.concatenate([t, t], axis=0)
            if cached:
                out, new_cache = model_fn(params, x_in, t2, ctx, cache_state)
            else:
                out = model_fn(params, x_in, t2, ctx)
            uncond, text = jnp.split(out, 2, axis=0)
            eps = uncond + guidance.reshape(-1, 1, 1, 1) * (text - uncond)
            new_x = sampler.step(x, eps, c0, c1)
            if cached:
                return new_x, ctx.new_kv_state, new_cache
            return new_x, ctx.new_kv_state

        def wrapped(params, x, t, coeffs, guidance, kv_state,
                    cache_state=None):
            spec_x = P(None, axis, None, None)
            kv_specs = jax.tree.map(lambda _: P(), kv_state)
            # P() is a PREFIX spec: it applies to the whole (unknown-ahead)
            # kv-state subtree; all_gathered KV is replicated across 'sp'.
            if cached:
                # token-cache rows are (rows, S, D)/(rows, S): the token
                # axis (1) is the sharded one — the fine gate runs on each
                # shard's local tokens
                cache_specs = jax.tree.map(lambda _: P(None, axis),
                                           cache_state)
                fn = shard_map(
                    local_step, mesh=mesh,
                    in_specs=(P(), spec_x, P(), P(), P(), kv_specs,
                              cache_specs),
                    out_specs=(spec_x, P(), cache_specs), check_vma=False)
                return fn(params, x, t, coeffs, guidance, kv_state,
                          cache_state)
            fn = shard_map(
                local_step, mesh=mesh,
                in_specs=(P(), spec_x, P(), P(), P(), kv_specs),
                out_specs=(spec_x, P()), check_vma=False)
            return fn(params, x, t, coeffs, guidance, kv_state)

        return jax.jit(wrapped)

    def denoise(self, params, latents, table, guidance: float,
                cache_state=None):
        """Full denoising trajectory for one request batch (B, H, W, C).

        ``cache_state``: optional token-cache pytree (GLOBAL token axis;
        e.g. BlockCache.init_token_rows_fine per block) threaded through
        the sharded steps — rows split over 'sp' so the per-token fine gate
        (cache.manager.gate_tokens_fine) ranks and recomputes each shard's
        own tokens: the displaced-SP x token-cache composition
        (docs/DESIGN.md multichip projection).  When given, ``model_fn``
        must accept (params, x, t, ctx, cache_state) and return
        (out, new_cache_state).
        """
        b = latents.shape[0]
        cached = cache_state is not None
        latents = jax.device_put(latents, self.latent_sharding())
        kv_state: Dict = {}
        g = jnp.full((b,), guidance, jnp.float32)
        for i in range(table.num_steps):
            stale = i >= self.warmup_steps and bool(kv_state)
            key = (stale, cached, latents.shape)
            if key not in self._steps:
                self._steps[key] = self._build(stale, cached)
            t = jnp.full((b,), table.current_timestep(), jnp.float32)
            c = jnp.asarray(
                [[float(table.coeffs[table.step, 0]),
                  float(table.coeffs[table.step, 1])]] * b, jnp.float32)
            if cached:
                latents, kv_state, cache_state = self._steps[key](
                    params, latents, t, c, g, kv_state, cache_state)
            else:
                latents, kv_state = self._steps[key](params, latents, t, c,
                                                     g, kv_state)
            table.advance()
        return (latents, cache_state) if cached else latents
