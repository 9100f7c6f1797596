"""Learned per-block output cache for the patched denoiser.

Rebuild of the reference CacheManager (sduss/model_executor/modules/
cache_manager.py:22-199 + block hooks in unet_2d_blocks.py:40-380): per patch,
per UNet block, per timestep, decide whether to RECOMPUTE the block or REUSE
its cached output, based on how much the block's input drifted since the
cached step (MSE features into a trained classifier), with a forced recompute
after ``max_hits`` consecutive cache hits.

TPU-native design (SURVEY.md section 7 step 6):

* Cache state is a **pure pytree** threaded through the jitted step function
  (functional in/out, never module state), split per request between steps so
  continuous-batching membership changes can never misalign rows.
* The decision runs **in-graph** (no per-block device->host sync — the
  reference pays a GPU sync per block per step to call joblib on CPU).
  The classifier is a tiny per-block logistic over [mse, timestep, hits],
  trained from TPU traces by ``sduss_tpu.cache.train`` (numpy, no joblib).
* Two execution modes, both preserving the reference's splice semantics
  (cache_manager.update_and_return:84-99): mode "block" is **masked
  recompute** (compute all rows, select cached outputs back — exact splice,
  no compute saving); mode "compact" is **top-K gather-compute-scatter** at
  static capacity, giving REAL savings: `gate_compact` for independent rows
  (dense image rows, MMDiT token rows) and `gate_compact_images` for the
  coupled UNet patch path (whole drift-ranked images gathered per
  resolution class into a static canonical sub-composition).

Gated by ``CacheConfig.enabled`` (reference env ESYMRED_USE_CACHE,
cache_manager.py:47-51): cache off must stay a correct, fast system.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sduss_tpu.config import CacheConfig


class BlockCache:
    """Decision + splice logic for one deployment; state lives in pytrees.

    State layout per gated block key::

        {"inp":  (P, s, s, C)  block input at last recompute,
         "out":  (P, s, s, C)  block output at last recompute,
         "hits": (P,)          consecutive reuse count, int32}
    """

    def __init__(self, config: CacheConfig):
        self.config = config
        # block key -> (w_mse, w_t, w_hits, bias); decision = sigmoid(.) > 0.5
        self.classifiers: Dict[str, np.ndarray] = {}
        if config.classifier_path:
            data = np.load(config.classifier_path)
            for k in data.files:
                self.classifiers[k] = data[k]

    # -- state ----------------------------------------------------------------

    def init_rows(self, key: str, n_patches: int, s: int, c_in: int,
                  c_out: int, dtype=jnp.bfloat16) -> dict:
        """Fresh cache rows for ``n_patches`` patches of one request."""
        state = {
            "inp": jnp.zeros((n_patches, s, s, c_in), dtype),
            "out": jnp.zeros((n_patches, s, s, c_out), dtype),
            # start at max_hits so the first step always recomputes
            "hits": jnp.full((n_patches,), self.config.max_hits, jnp.int32),
        }
        self._add_predict_state(state)
        return state

    def _add_predict_state(self, state: dict) -> None:
        """Reuse-then-predict extras (CacheConfig.compact_predict): per-row
        output velocity ("slope", measured at each recompute) plus a "seen"
        flag so a row's FIRST recompute — whose previous out is the zeros
        init — never mints a garbage slope.  Stored in the output dtype
        (the same ~0.4% bf16 quantization trade as the deep slope,
        pipelines/base.py _deep_update_slope)."""
        if getattr(self.config, "compact_predict", 0.0):
            state["slope"] = jax.tree.map(jnp.zeros_like, state["out"])
            state["seen"] = jnp.zeros(state["hits"].shape, bool)

    def init_token_rows(self, key: str, n_rows: int, seq: int, dim: int,
                        dtype=jnp.bfloat16, ctx_seq: Optional[int] = None) -> dict:
        """Fresh cache rows for MMDiT token sequences (B, S, D).

        ``ctx_seq``: compact mode also caches the evolving context stream —
        ``out`` becomes {"x": (B,S,D), "c": (B,ctx_seq,D)}.
        """
        out = jnp.zeros((n_rows, seq, dim), dtype)
        if ctx_seq is not None:
            out = {"x": out, "c": jnp.zeros((n_rows, ctx_seq, dim), dtype)}
        state = {
            "inp": jnp.zeros((n_rows, seq, dim), dtype),
            "out": out,
            "hits": jnp.full((n_rows,), self.config.max_hits, jnp.int32),
        }
        self._add_predict_state(state)
        return state

    # -- decision (traced) ------------------------------------------------------

    def _drift_logit(self, key: str, x, state_k, t_norm):
        """Shared drift scoring for BOTH cache decisions (mask + ranking).

        One implementation so "block" gating and "compact" ranking can
        never disagree on drift for the same trained classifier artifact.
        Rank-agnostic: reduces over all non-leading axes, so UNet patch
        rows (P, s, s, C) and MMDiT token rows (B, S, D) score the same
        way.  Returns (signed score: >0 means recompute, rel_mse).
        """
        axes = tuple(range(1, x.ndim))
        xf = x.astype(jnp.float32)
        cf = state_k["inp"].astype(jnp.float32)
        mse = jnp.mean((xf - cf) ** 2, axis=axes)
        rel = mse / (jnp.mean(xf * xf, axis=axes) + 1e-8)
        clf = self.classifiers.get(key)
        if clf is not None:
            w_mse, w_t, w_hits, bias = [float(v) for v in clf]
            score = (w_mse * rel + w_t * t_norm
                     + w_hits * state_k["hits"].astype(jnp.float32) + bias)
        else:
            score = rel - self.config.mse_threshold
        return score, rel

    def _recompute_mask(self, key: str, x, state_k, t_norm):
        """(P,) bool — True where the block must be recomputed."""
        score, rel = self._drift_logit(key, x, state_k, t_norm)
        fresh = score > 0.0
        return fresh | (state_k["hits"] >= self.config.max_hits), rel

    def _scores(self, key: str, x, state_k, t_norm):
        """(P,) f32 drift ranking; forced rows (hits >= max_hits) rank first."""
        score, _ = self._drift_logit(key, x, state_k, t_norm)
        forced = (state_k["hits"] >= self.config.max_hits).astype(jnp.float32)
        return score + forced * 1e6

    # -- gate (traced) ----------------------------------------------------------

    def gate(self, key: str, x, t_norm, state_k: Optional[dict],
             compute_fn: Callable):
        """Run ``compute_fn(x)`` under the cache decision.

        Returns (y, new_state_k, stats).  With ``state_k`` None the block is
        ungated (cache disabled or shallow level): plain compute.
        """
        if state_k is None:
            return compute_fn(x), None, None
        fresh, rel = self._recompute_mask(key, x, state_k, t_norm)
        y_new = compute_fn(x)
        sel = fresh.reshape((-1,) + (1,) * (y_new.ndim - 1))
        sel_in = fresh.reshape((-1,) + (1,) * (x.ndim - 1))
        y = jnp.where(sel, y_new, state_k["out"].astype(y_new.dtype))
        new_state = {
            "inp": jnp.where(sel_in, x, state_k["inp"].astype(x.dtype)),
            "out": y,
            "hits": jnp.where(fresh, 0, state_k["hits"] + 1),
        }
        stats = {"fresh": fresh, "rel_mse": rel}
        return y, new_state, stats


    def gate_compact(self, key: str, x, t_norm, state_k: Optional[dict],
                     compute_fn: Callable, n_active: int, row_valid=None):
        """Top-K compact recompute: REAL compute saving under static shapes.

        The TPU answer to the reference's dynamic per-row cache masks
        (cache_manager.py:101-191): instead of thresholding (dynamic row
        count -> recompilation), every step recomputes exactly the
        ``n_active`` most-drifted rows (MoE-capacity style), gathered to a
        compact sub-batch; the rest take their cached outputs.  Forced rows
        (hits >= max_hits) outrank everything, preserving the reference's
        staleness bound when capacity allows.

        Requires rows independent under ``compute_fn`` (MMDiT token rows,
        dense image rows — NOT the UNet patch path, whose rows couple
        through per-image group-norm/attention; that path uses `gate`).

        ``compute_fn(x_gathered, idx)`` -> row-aligned output pytree; the
        callable must gather its own row-aligned side inputs (temb, context
        stream, masks) by ``idx``.  ``state_k['out']`` holds the matching
        cached pytree.  Returns (full outputs, new_state_k, stats).
        """
        if state_k is None:
            full = compute_fn(x, jnp.arange(x.shape[0]))
            return full, None, None
        scores = self._scores(key, x, state_k, t_norm)
        if row_valid is not None:
            # batch-bucket pad rows rank last (their outputs are discarded)
            scores = jnp.where(row_valid, scores, -jnp.inf)
        _, idx = jax.lax.top_k(scores, n_active)
        x_c = x[idx]
        y_c = compute_fn(x_c, idx)
        y, new_state = self._compact_splice(state_k, x, x_c, y_c, idx)
        return y, new_state, {"idx": idx, "scores": scores}

    def _compact_splice(self, state_k: dict, x, x_c, y_c, idx):
        """Shared splice for the compact gates: fresh rows scatter into the
        cached outputs; the rest splice either the raw cache or (with
        CacheConfig.compact_predict) a first-order extrapolation
        ``out + momentum * staleness * slope`` — the per-row analog of the
        deep cache's reuse-then-predict (pipelines/base.py _deep_predicted).
        ``hits`` counts gated steps since a row's last recompute, so the
        consuming step sits hits+1 gated steps past the cached value and the
        fresh slope's gap is the same hits+1.  Returns (y, new_state)."""
        m = float(getattr(self.config, "compact_predict", 0.0) or 0.0)
        predict = m != 0.0 and "slope" in state_k
        h = state_k["hits"]
        base = state_k["out"]
        if predict:
            k = (h + 1).astype(jnp.float32)

            def extrapolate(o, s):
                kk = k.reshape((-1,) + (1,) * (o.ndim - 1))
                return (o.astype(jnp.float32)
                        + m * kk * s.astype(jnp.float32)).astype(o.dtype)

            base = jax.tree.map(extrapolate, base, state_k["slope"])
        y = jax.tree.map(
            lambda cached, fresh: cached.astype(fresh.dtype).at[idx].set(fresh),
            base, y_c)
        new_state = {
            "inp": state_k["inp"].astype(x.dtype).at[idx].set(x_c),
            "out": jax.tree.map(
                lambda cached, fresh: cached.astype(fresh.dtype)
                .at[idx].set(fresh), state_k["out"], y_c),
            "hits": (h + 1).at[idx].set(0),
        }
        if predict:
            gap = (h[idx] + 1).astype(jnp.float32)
            ok = state_k["seen"][idx]

            def upd(s, old, fresh):
                g = gap.reshape((-1,) + (1,) * (fresh.ndim - 1))
                sl = (fresh.astype(jnp.float32)
                      - old[idx].astype(jnp.float32)) / g
                sl = jnp.where(ok.reshape((-1,) + (1,) * (fresh.ndim - 1)),
                               sl, 0.0)
                return s.at[idx].set(sl.astype(s.dtype))

            new_state["slope"] = jax.tree.map(
                upd, state_k["slope"], state_k["out"], y_c)
            new_state["seen"] = state_k["seen"].at[idx].set(True)
        return y, new_state

    def gate_compact_pairs(self, key: str, x, t_norm, state_k: Optional[dict],
                           compute_fn: Callable, n_pairs: int,
                           row_valid=None):
        """CFG-PAIR-symmetric top-K compact recompute.

        Rows are the [uncond | cond] halves of the same images.  Selecting
        halves independently (gate_compact) lets an odd capacity recompute
        one half of an image while splicing the other, and the CFG combine
        u + g*(c - u) amplifies the asymmetry — measured: tiny-harness
        hybrid divergence is NON-monotonic in fraction (0.7 WORSE than 0.5,
        exp/cache_quality_sdxl_hybrid_tiny.json).  Here the selection unit
        is the PAIR: pair score = sum of both halves' drift scores, and
        both rows of a selected pair recompute together.  Same contract as
        gate_compact; ``row_valid`` marks real rows in BOTH halves.
        """
        if state_k is None:
            full = compute_fn(x, jnp.arange(x.shape[0]))
            return full, None, None
        n = x.shape[0] // 2
        scores = self._scores(key, x, state_k, t_norm)
        if row_valid is not None:
            scores = jnp.where(row_valid, scores, -jnp.inf)
        pair_scores = scores[:n] + scores[n:]
        _, pidx = jax.lax.top_k(pair_scores, n_pairs)
        idx = jnp.concatenate([pidx, pidx + n], axis=0)
        x_c = x[idx]
        y_c = compute_fn(x_c, idx)
        y, new_state = self._compact_splice(state_k, x, x_c, y_c, idx)
        return y, new_state, {"idx": idx, "scores": scores}

    def init_token_rows_fine(self, key: str, n_rows: int, seq: int, dim: int,
                             dtype=jnp.bfloat16, kv_pairs: int = 0) -> dict:
        """State for per-TOKEN delta-skip compaction (gate_tokens_fine):
        only the last-recompute input (drift reference) and per-token hit
        counts — residual blocks need no output cache, skipping a token's
        update IS the reuse.

        ``kv_pairs`` (CacheConfig.fine_stale_kv): number of attention K/V
        pairs the block carries across steps (1, or 2 for dual-attention
        MMDiT blocks) — unselected tokens splice these STALE rows instead
        of recomputing to_k/to_v and the full-sequence norm/modulation
        every step.  Stored merged-heads (n, seq, dim), post qk-norm."""
        st = {
            "inp": jnp.zeros((n_rows, seq, dim), dtype),
            "hits": jnp.full((n_rows, seq), self.config.max_hits, jnp.int32),
        }
        for i in range(kv_pairs):
            sfx = "" if i == 0 else "2"
            st[f"k{sfx}"] = jnp.zeros((n_rows, seq, dim), dtype)
            st[f"v{sfx}"] = jnp.zeros((n_rows, seq, dim), dtype)
        return st

    def gate_tokens_fine(self, key: str, x, t_norm, state_k: dict,
                         compute_fn: Callable, k_t: int, token_valid=None):
        """Per-TOKEN compaction for residual token blocks (MMDiT).

        The finest cache granularity on the token path (the reference's
        per-patch cache for SD3, modules/SD3Transformer.py:25-262 — each
        MMDiT token IS a 2x2 latent patch): every step, each request
        recomputes exactly its ``k_t`` most-drifted tokens through the
        block; the rest skip the block's residual deltas (identity), which
        for a pure-residual block is the natural splice — the token stream
        itself carries the reused values, so no output cache is needed.
        Request-granular gate_compact degenerates at batch 1 CFG (it can
        only alternate the cond/uncond pair); this is the meaningful
        granularity there.

        x: (B, S, D) block input; state_k from init_token_rows_fine;
        ``compute_fn(sel)`` applies the block with query/FF compaction at
        ``sel`` (B, k_t) and returns the full updated streams.
        """
        xf = x.astype(jnp.float32)
        cf = state_k["inp"].astype(jnp.float32)
        rel = jnp.mean((xf - cf) ** 2, axis=-1) / (
            jnp.mean(xf * xf, axis=-1) + 1e-8)                    # (B, S)
        clf = self.classifiers.get(key)
        hits = state_k["hits"]
        if clf is not None:
            w_mse, w_t, w_hits, bias = [float(v) for v in clf]
            score = (w_mse * rel + w_t * t_norm[:, None]
                     + w_hits * hits.astype(jnp.float32) + bias)
        else:
            score = rel - self.config.mse_threshold
        score = score + (hits >= self.config.max_hits).astype(jnp.float32) * 1e6
        if token_valid is not None:
            score = jnp.where(token_valid, score, -jnp.inf)
        _, sel = jax.lax.top_k(score, k_t)                        # (B, k_t)
        out = compute_fn(sel)
        bix = jnp.arange(x.shape[0])[:, None]
        x_sel = jnp.take_along_axis(x, sel[..., None], axis=1)
        # extra keys (stale K/V rows, fine_stale_kv) pass through unchanged;
        # the caller overwrites them with the block's fresh splices
        new_state = dict(state_k)
        new_state.update({
            "inp": state_k["inp"].astype(x.dtype).at[bix, sel].set(x_sel),
            "hits": (hits + 1).at[bix, sel].set(0),
        })
        return out, new_state, {"sel": sel}

    def gate_compact_images(self, key: str, x, t_norm, state_k: dict,
                            compute_fn: Callable, ctx, caps,
                            cfg_pair_offset=None, two_level=True):
        """Image-granular compact recompute for the COUPLED patch path.

        Patch rows couple through per-image group-norm and grouped
        attention, so per-ROW gathering (gate_compact) would corrupt the
        moments/halos/KV.  The coupling unit is the IMAGE: each step
        recomputes the ``caps[ci]`` most-drifted images of every resolution
        class — gathered with ALL their patches into the canonical
        sub-composition of ops.patching.compact_submeta, where GN, halos and
        grouped attention are EXACT — and the rest keep their cached block
        outputs (the reference's splice semantics,
        cache_manager.update_and_return:84-99, at image granularity; the
        dense compact path's rows are whole images too).

        ``compute_fn(x_sub, gather_idx, sel_images) -> y_sub`` runs the
        block pair on the sub-batch (the caller binds the sub PatchContext
        and gathers temb/encoder rows).  Per-image drift = mean of the
        per-patch scores.  Class pad slots rank -inf; if capacity exceeds a
        class's real images the surplus rows scatter out-of-bounds and are
        dropped.

        ``cfg_pair_offset``: image-slot offset between the CFG halves of a
        doubled meta (== the single meta's i_pad).  When given, each
        image's score is symmetrized with its CFG partner's so both halves
        of a pair rank identically and (with even class caps) are selected
        together — the patch-path analog of gate_compact_pairs.
        ``two_level=False`` suppresses the per-token tail compaction even
        when patch_fraction < 1 (the deep x compact hybrid gates at image
        granularity only).
        """
        scores = self._scores(key, x, state_k, t_norm)
        valid = ctx.patch_valid
        p_pad = x.shape[0]
        num = jax.ops.segment_sum(jnp.where(valid, scores, 0.0),
                                  ctx.image_id, num_segments=ctx.meta.i_pad)
        den = jax.ops.segment_sum(valid.astype(jnp.float32), ctx.image_id,
                                  num_segments=ctx.meta.i_pad)
        img_scores = num / jnp.maximum(den, 1.0)
        if cfg_pair_offset is not None:
            h = cfg_pair_offset
            sym = 0.5 * (img_scores[:h] + img_scores[h : 2 * h])
            img_scores = jnp.concatenate([sym, sym], axis=0)
        gather_parts, img_parts, valid_parts = [], [], []
        for ci, (g, ipc) in enumerate(ctx.meta.class_info):
            rows = ctx.class_gather[ci].reshape(ipc, g * g)
            slot_valid = ctx.class_kv[ci][:, 0]          # real image slots
            img_ids = ctx.image_id[jnp.clip(rows[:, 0], 0)]
            s_c = jnp.where(slot_valid, img_scores[img_ids], -jnp.inf)
            _, sel = jax.lax.top_k(s_c, caps[ci])
            gather_parts.append(rows[sel].reshape(-1))
            img_parts.append(img_ids[sel])
            valid_parts.append(
                jnp.repeat(slot_valid[sel], g * g, total_repeat_length=caps[ci] * g * g))
        gidx = jnp.concatenate(gather_parts)
        row_ok = jnp.concatenate(valid_parts) & (gidx >= 0)
        sel_imgs = jnp.concatenate(img_parts)
        x_sub = x[jnp.clip(gidx, 0)]

        frac2 = getattr(self.config, "patch_fraction", 1.0) if two_level else 1.0
        if frac2 < 1.0:
            # Two-level: within the sub-composition, only the k_q most-
            # drifted PATCH rows run the per-token transformer tail
            # (reference finest granularity, cache_manager.py:101-191).
            # ``compute_fn(x_sub, gather_idx, sel_images, tok_sel)`` returns
            # outputs for tok_sel rows ONLY; the other rows of recomputed
            # images keep their cached pair outputs (hits keep rising, so
            # max_hits still forces an eventual refresh).
            p_sub = int(gidx.shape[0])
            k_q = max(1, int(round(p_sub * frac2)))
            scores_sub = jnp.where(row_ok, scores[jnp.clip(gidx, 0)], -jnp.inf)
            _, sel = jax.lax.top_k(scores_sub, k_q)
            y_sel = compute_fn(x_sub, jnp.clip(gidx, 0), sel_imgs, sel)
            sidx = jnp.where(row_ok[sel], gidx[sel], p_pad)
            y = state_k["out"].astype(y_sel.dtype).at[sidx].set(y_sel)
            new_state = {
                "inp": state_k["inp"].astype(x.dtype).at[sidx].set(x_sub[sel]),
                "out": y,
                "hits": (state_k["hits"] + 1).at[sidx].set(0),
            }
            return y, new_state, {"gather": gidx, "images": sel_imgs,
                                  "tok_sel": sel}

        y_sub = compute_fn(x_sub, jnp.clip(gidx, 0), sel_imgs)
        # out-of-bounds scatter indices are dropped by XLA: surplus rows
        # (beyond a class's real images) write nowhere
        sidx = jnp.where(row_ok, gidx, p_pad)
        y = state_k["out"].astype(y_sub.dtype).at[sidx].set(y_sub)
        new_state = {
            "inp": state_k["inp"].astype(x.dtype).at[sidx].set(x_sub),
            "out": y,
            "hits": (state_k["hits"] + 1).at[sidx].set(0),
        }
        return y, new_state, {"gather": gidx, "images": sel_imgs}


def split_state(state: dict, counts: List[int]) -> List[dict]:
    """Split a batched cache state into per-request row slices (host side)."""
    outs: List[dict] = [dict() for _ in counts]
    for key, entry in state.items():
        off = 0
        for i, n in enumerate(counts):
            outs[i][key] = jax.tree.map(lambda a: a[off : off + n], entry)
            off += n
    return outs


def concat_state(per_req: List[dict], keys: List[str]) -> dict:
    """Concatenate per-request rows back into one batched state."""
    out = {}
    for key in keys:
        entries = [r[key] for r in per_req]
        out[key] = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *entries)
    return out
