"""Quality bounds for the serving caches: latent-trajectory divergence.

Round-1 verdict item 4: the headline deep cache (interval 3) and the compact
top-K cache shipped with no quality measurement.  This script measures the
end-of-trajectory latent divergence each cache setting induces vs the exact
cache-off trajectory — the weight-free analog of the reference's
quality-validated thresholds (its classifiers are trained on MSE-vs-cache
features at threshold 0.01, reference cache_manager.py:101-191): identical
seeds/inputs, identical sampler table, only the cache differs.

Metrics per (config, seed): relative MSE and cosine similarity of final
latents vs cache-off.  Runs on CPU tiny models (fast sweep) or the real chip
(full-size spot checks):

    python scripts/cache_quality.py --family sdxl --tiny --steps 30 \
        --out exp/cache_quality_sdxl_tiny.json
    python scripts/cache_quality.py --family sdxl --steps 30 \
        --out exp/cache_quality_sdxl_v5e.json       # on the chip

Output JSON: {"configs": [{"kind": "deep", "param": 3, "rel_mse": ...,
"cosine": ...}, ...]} — the production default should sit at the measured
knee of rel_mse vs saving.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _metrics(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    rel_mse = float(np.mean((a - b) ** 2) / (np.mean(b**2) + 1e-12))
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    return rel_mse, cos


def build_unet_runs(tiny: bool, batch: int, res: int, n_steps: int,
                    levels: int = 0, boundary: int = 0,
                    family: str = "sdxl"):
    """(run_plain, run_deep(interval), run_compact(fraction), make_inputs).

    ``levels`` (tiny only): 3 = use TINY3_SDXL_UNET, the 3-level proxy with
    SDXL's level structure, so ``boundary`` choices actually bite.
    ``boundary``: deep-cache boundary level for all deep/hybrid runs
    (0 = model default, deepest-1).  boundary=1 caches everything above
    level 0 — the shallow step becomes conv-only (SDXL wide span)."""
    import jax
    import jax.numpy as jnp

    from sduss_tpu.models.unet import (SD15_UNET, SDXL_UNET,
                                       TINY3_SDXL_UNET, TINY4_SD15_UNET,
                                       TINY_SDXL_UNET,
                                       UNet2DConditionModel)
    from sduss_tpu.samplers import get_sampler

    # Full-size SD1.5 rides the same builders: UNetConfig with
    # addition_embed=None ignores the added_cond inputs (unet.time_embed
    # guards), so the SDXL-shaped harness drives it unchanged.  Tiny sd15
    # = the 4-level structure proxy.
    cfg = (TINY3_SDXL_UNET if tiny and levels == 3
           else TINY4_SD15_UNET if tiny and (levels == 4
                                             or family == "sd15")
           else TINY_SDXL_UNET if tiny
           else SD15_UNET if family == "sd15" else SDXL_UNET)
    bdy = boundary or None
    unet = UNet2DConditionModel(cfg)
    sampler = get_sampler("euler")
    dtype = jnp.float32 if tiny else jnp.bfloat16
    b = batch
    hw = res // 8
    ctx_dim = cfg.cross_attention_dim
    pooled_dim = 48 if tiny else 1280

    table = sampler.make_table(n_steps)
    ts = jnp.asarray(table.timesteps)
    cs = jnp.asarray(table.coeffs)

    if tiny:
        params = unet.init(jax.random.key(0))
    else:
        from sduss_tpu.utils import random_params_bf16

        params = random_params_bf16(unet)

    def make_inputs(seed: int):
        r = np.random.default_rng(seed)
        lat = jnp.asarray(r.standard_normal((b, hw, hw, 4)), dtype)
        ehs = jnp.asarray(0.3 * r.standard_normal((2 * b, 77, ctx_dim)), dtype)
        pooled = jnp.asarray(0.3 * r.standard_normal((2 * b, pooled_dim)), dtype)
        tid = jnp.tile(jnp.asarray([[res, res, 0, 0, res, res]], jnp.float32),
                       (2 * b, 1))
        g = jnp.full((b,), 5.0)
        return lat, g, ehs, pooled, tid

    def one_step(params, lat, i, g, ehs, pooled, tid, **kw):
        c0 = jnp.full((b,), cs[i, 0])
        c1 = jnp.full((b,), cs[i, 1])
        t2 = jnp.full((2 * b,), ts[i], jnp.float32)
        lat_in = sampler.scale_model_input(jnp.concatenate([lat, lat]),
                                           jnp.concatenate([c0, c0]))
        added = {"text_embeds": pooled, "time_ids": tid}
        out = unet.apply(params, lat_in, t2, ehs, added_cond=added, **kw)
        extra = None
        if isinstance(out, tuple):
            out, extra = out
        u, c = jnp.split(out, 2)
        eps = u + g.reshape(-1, 1, 1, 1) * (c - u)
        return sampler.step(lat, eps, c0, c1), extra, eps

    @jax.jit
    def run_drift(params, lat, g, ehs, pooled, tid):
        """Mean step-to-step relative MSE of the model output along the
        cache-off trajectory — the temporal smoothness every reuse cache
        banks on.  Context metric: random weights have no trained
        smoothness, so cache divergence measured here is an upper bound."""
        def body(i, carry):
            lat, prev, acc = carry
            lat2, _, eps = one_step(params, lat, i, g, ehs, pooled, tid)
            rel = jnp.mean((eps - prev) ** 2) / (jnp.mean(prev**2) + 1e-12)
            acc = acc + jnp.where(i > 0, rel, 0.0)
            return lat2, eps, acc

        lat0, _, eps0 = one_step(params, lat, 0, g, ehs, pooled, tid)
        _, _, acc = jax.lax.fori_loop(
            1, n_steps, body, (lat0, eps0, jnp.float32(0.0)))
        return acc / max(n_steps - 1, 1)

    import functools

    @jax.jit
    def run_plain(params, lat, g, ehs, pooled, tid):
        def body(i, lat):
            return one_step(params, lat, i, g, ehs, pooled, tid)[0]

        return jax.lax.fori_loop(0, n_steps, body, lat)

    # shared deep-step pair (one builder: a fix to the step math cannot
    # silently diverge the fixed-vs-adaptive comparison)
    def _deep_shapes():
        n_lv = len(cfg.block_out_channels)
        bdy_v = bdy if bdy is not None else n_lv - 1
        # deep feature = h entering up block (n_lv - bdy_v): spatial of
        # level bdy_v-1, channels of the deepest cached upsample conv
        return (hw // (2 ** max(bdy_v - 1, 0)),
                cfg.block_out_channels[bdy_v])

    def _deep_step_pair(params, g, ehs, pooled, tid):
        def full_f(args):
            lat, deep, i = args
            out, d2, _ = one_step(params, lat, i, g, ehs, pooled, tid,
                                  deep_mode="full", deep_state=None,
                                  deep_boundary=bdy)
            return out, d2

        def shallow_f(args):
            lat, deep, i = args
            out, d2, _ = one_step(params, lat, i, g, ehs, pooled, tid,
                                  deep_mode="shallow", deep_state=deep,
                                  deep_boundary=bdy)
            return out, d2

        return full_f, shallow_f

    @functools.lru_cache(maxsize=None)
    def run_deep(interval: int, warmup: int = 0):
        hw_deep, c_deep = _deep_shapes()

        @jax.jit
        def run(params, lat, g, ehs, pooled, tid):
            deep0 = jnp.zeros((2 * b, hw_deep, hw_deep, c_deep), dtype)
            full_f, shallow_f = _deep_step_pair(params, g, ehs, pooled, tid)

            def body(i, carry):
                lat, deep = carry
                # production semantics: deep_warmup always-full steps first,
                # then one full every `interval` (pipelines/base.py
                # _denoise_group_deep)
                full = (i < warmup) | (((i - warmup) % interval) == 0)
                return jax.lax.cond(full, full_f, shallow_f, (lat, deep, i))

            lat, _ = jax.lax.fori_loop(0, n_steps, body, (lat, deep0))
            return lat

        return run

    @functools.lru_cache(maxsize=None)
    def run_deep_predict(interval: int, momentum: float, warmup: int = 0):
        """Reuse-then-PREDICT deep refresh (arXiv 2505.14741 / TaylorSeer
        shape): instead of holding the last full step's deep features
        frozen, shallow steps feed a first-order extrapolation
        ``deep_last + momentum * age * slope`` where ``slope`` is the
        per-step feature velocity between the last two full steps.  Same
        full/shallow schedule as run_deep — only the shallow input changes
        — so a quality win here converts 1:1 into longer intervals (fewer
        full steps) at matched divergence."""
        hw_deep, c_deep = _deep_shapes()

        @jax.jit
        def run(params, lat, g, ehs, pooled, tid):
            z = jnp.zeros((2 * b, hw_deep, hw_deep, c_deep), dtype)
            full_f, shallow_f = _deep_step_pair(params, g, ehs, pooled, tid)

            def body(i, carry):
                lat, deep_last, slope, age, gap = carry
                full = (i < warmup) | (((i - warmup) % interval) == 0)

                def do_full(args):
                    lat, deep_last, slope, age, gap = args
                    lat2, d2 = full_f((lat, deep_last, i))
                    # per-step velocity from the realized gap; first full
                    # (gap 0) keeps slope 0 (falls back to plain reuse)
                    new_slope = jnp.where(
                        gap > 0,
                        (d2 - deep_last).astype(jnp.float32)
                        / jnp.maximum(gap, 1).astype(jnp.float32),
                        jnp.zeros_like(slope))
                    return lat2, d2, new_slope, jnp.int32(0), jnp.int32(0)

                def do_shallow(args):
                    lat, deep_last, slope, age, gap = args
                    pred = (deep_last.astype(jnp.float32)
                            + momentum * (age + 1).astype(jnp.float32)
                            * slope).astype(dtype)
                    lat2, _ = shallow_f((lat, pred, i))
                    return lat2, deep_last, slope, age + 1, gap

                lat, deep_last, slope, age, gap = jax.lax.cond(
                    full, do_full, do_shallow,
                    (lat, deep_last, slope, age, gap))
                return lat, deep_last, slope, age, gap + 1

            lat, _, _, _, _ = jax.lax.fori_loop(
                0, n_steps, body,
                (lat, z, jnp.zeros_like(z, jnp.float32), jnp.int32(0),
                 jnp.int32(0)))
            return lat

        return run

    @functools.lru_cache(maxsize=None)
    def run_deep_adaptive(threshold: float, max_interval: int = 6,
                          warmup: int = 0):
        """Drift-triggered deep refresh: full step when the latent has
        drifted (relative MSE) past ``threshold`` since the last full step,
        else shallow, with a ``max_interval`` safety cap.  Returns
        (final latents, n_full_steps, full_mask) — the mask is the realized
        refresh PATTERN, replayable by scripts/sim_serving.py for a
        serving-level projection without the chip; n_full makes the
        quality/compute frontier directly comparable with fixed intervals
        (full_fraction 1/k)."""
        hw_deep, c_deep = _deep_shapes()

        @jax.jit
        def run(params, lat, g, ehs, pooled, tid):
            deep0 = jnp.zeros((2 * b, hw_deep, hw_deep, c_deep), dtype)
            full_f, shallow_f = _deep_step_pair(params, g, ehs, pooled, tid)

            def body(i, carry):
                lat, deep, lat_ref, age, n_full, mask = carry
                # drift vs the latent the deep features were computed FROM
                # (the last full step's INPUT), like production _note_drift
                drift = (jnp.mean((lat - lat_ref).astype(jnp.float32) ** 2)
                         / (jnp.mean(lat_ref.astype(jnp.float32) ** 2) + 1e-12))
                full = ((i < warmup) | (i == 0) | (age >= max_interval - 1)
                        | (drift > threshold))
                lat2, deep2 = jax.lax.cond(full, full_f, shallow_f,
                                           (lat, deep, i))
                lat_ref = jnp.where(full, lat, lat_ref)
                age = jnp.where(full, 0, age + 1)
                return (lat2, deep2, lat_ref, age,
                        n_full + full.astype(jnp.int32),
                        mask.at[i].set(full.astype(jnp.int32)))

            lat, _, _, _, n_full, mask = jax.lax.fori_loop(
                0, n_steps, body,
                (lat, deep0, lat, jnp.int32(0), jnp.int32(0),
                 jnp.zeros((n_steps,), jnp.int32)))
            return lat, n_full, mask

        return run

    @functools.lru_cache(maxsize=None)
    def run_deep_hybrid(threshold: float, fraction: float,
                        max_interval: int = 6, warmup: int = 0,
                        pairwise: bool = False, momentum: float = 0.0):
        """Deep x compact HYBRID (CacheConfig.deep_compact_fraction): the
        adaptive deep schedule, with SHALLOW steps additionally gating their
        block pairs at top-K row capacity ``fraction`` (full steps recompute
        everything and write the row caches through).  Mirrors production
        unet.apply's hybrid path exactly — same BlockCache, same layout.
        Returns (final latents, n_full, full_mask) like run_deep_adaptive."""
        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        cache = BlockCache(CacheConfig(enabled=True, mode="deep",
                                       deep_compact_fraction=fraction,
                                       deep_compact_pairwise=pairwise,
                                       max_hits=4))
        layout = unet.shallow_cache_layout(hw, bdy)
        state0 = {key: cache.init_rows(key, 2 * b, s, cin, cout, dtype)
                  for key, (s, cin, cout) in layout.items()}
        hw_deep, c_deep = _deep_shapes()

        @jax.jit
        def run(params, lat, g, ehs, pooled, tid):
            deep0 = jnp.zeros((2 * b, hw_deep, hw_deep, c_deep), dtype)

            def step_mode(mode):
                def f(args):
                    lat, deep, st, i = args
                    c0 = jnp.full((b,), cs[i, 0])
                    c1 = jnp.full((b,), cs[i, 1])
                    t2 = jnp.full((2 * b,), ts[i], jnp.float32)
                    lat_in = sampler.scale_model_input(
                        jnp.concatenate([lat, lat]), jnp.concatenate([c0, c0]))
                    added = {"text_embeds": pooled, "time_ids": tid}
                    out, d2, st2 = unet.apply(
                        params, lat_in, t2, ehs, added_cond=added,
                        deep_mode=mode, deep_boundary=bdy,
                        deep_state=deep if mode == "shallow" else None,
                        cache=cache, cache_state=st)
                    u, c = jnp.split(out, 2)
                    eps = u + g.reshape(-1, 1, 1, 1) * (c - u)
                    return sampler.step(lat, eps, c0, c1), d2, st2

                return f

            full_f = step_mode("full")
            shallow_f = step_mode("shallow")

            def body(i, carry):
                (lat, deep, st, lat_ref, age, n_full, mask, slope,
                 gap) = carry
                drift = (jnp.mean((lat - lat_ref).astype(jnp.float32) ** 2)
                         / (jnp.mean(lat_ref.astype(jnp.float32) ** 2) + 1e-12))
                full = ((i < warmup) | (i == 0) | (age >= max_interval - 1)
                        | (drift > threshold))
                # reuse-then-predict: shallow steps extrapolate the deep
                # features along the velocity between the last two fulls
                deep_in = jnp.where(
                    full, deep,
                    (deep.astype(jnp.float32)
                     + momentum * (age + 1).astype(jnp.float32)
                     * slope).astype(deep.dtype))
                lat2, deep2, st2 = jax.lax.cond(full, full_f, shallow_f,
                                                (lat, deep_in, st, i))
                slope = jnp.where(
                    full & (gap > 0),
                    (deep2 - deep).astype(jnp.float32)
                    / jnp.maximum(gap, 1).astype(jnp.float32),
                    slope)
                # the carried anchor stays the last FULL step's features —
                # a shallow step must not write its predicted input back
                deep_next = jnp.where(full, deep2, deep)
                gap = jnp.where(full, 1, gap + 1)
                lat_ref = jnp.where(full, lat, lat_ref)
                age = jnp.where(full, 0, age + 1)
                return (lat2, deep_next, st2, lat_ref, age,
                        n_full + full.astype(jnp.int32),
                        mask.at[i].set(full.astype(jnp.int32)), slope, gap)

            lat, _, _, _, _, n_full, mask, _, _ = jax.lax.fori_loop(
                0, n_steps, body,
                (lat, deep0, state0, lat, jnp.int32(0), jnp.int32(0),
                 jnp.zeros((n_steps,), jnp.int32),
                 jnp.zeros_like(deep0, jnp.float32), jnp.int32(0)))
            return lat, n_full, mask

        return run

    @functools.lru_cache(maxsize=None)
    def run_hybrid_rowphase(fraction: float, interval: int,
                            pairwise: bool = False):
        """Serving row-carry cadence at request phase ``phase`` (TRACED — one
        compile sweeps every phase): full at i == 0 (the admission row
        refresh: partial program / anchoring full), then at
        i == phase + m*interval.  Under composition row CARRY-OVER
        (CacheConfig.deep_row_warmup) interval expiry is BATCH-aligned, so a
        request admitted mid-interval sees its refreshes at an arbitrary
        phase of its own step clock — a row-age pattern the offline
        fixed-cadence ladder (phase 0) never measured.  Hybrid row gating
        runs on every non-full step exactly like the serving preset (fixed
        interval, no drift trigger)."""
        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        cache = BlockCache(CacheConfig(enabled=True, mode="deep",
                                       deep_compact_fraction=fraction,
                                       deep_compact_pairwise=pairwise,
                                       max_hits=4))
        layout = unet.shallow_cache_layout(hw, bdy)
        hw_deep, c_deep = _deep_shapes()

        # state0 threads as an ARGUMENT: closed over, the full-size zero
        # row state lowered as 2.35 GB of captured CONSTANTS (the r2n
        # broken-pipe class of relay failure; measured warning on the
        # first r5b rowphase launch)
        @jax.jit
        def run(params, lat, g, ehs, pooled, tid, phase, state0):
            deep0 = jnp.zeros((2 * b, hw_deep, hw_deep, c_deep), dtype)

            def step_mode(mode):
                def f(args):
                    lat, deep, st, i = args
                    c0 = jnp.full((b,), cs[i, 0])
                    c1 = jnp.full((b,), cs[i, 1])
                    t2 = jnp.full((2 * b,), ts[i], jnp.float32)
                    lat_in = sampler.scale_model_input(
                        jnp.concatenate([lat, lat]),
                        jnp.concatenate([c0, c0]))
                    added = {"text_embeds": pooled, "time_ids": tid}
                    out, d2, st2 = unet.apply(
                        params, lat_in, t2, ehs, added_cond=added,
                        deep_mode=mode, deep_boundary=bdy,
                        deep_state=deep if mode == "shallow" else None,
                        cache=cache, cache_state=st)
                    u, c = jnp.split(out, 2)
                    eps = u + g.reshape(-1, 1, 1, 1) * (c - u)
                    return sampler.step(lat, eps, c0, c1), d2, st2

                return f

            full_f = step_mode("full")
            shallow_f = step_mode("shallow")

            def body(i, carry):
                lat, deep, st, n_full, mask = carry
                full = (i == 0) | ((i >= phase)
                                   & (((i - phase) % interval) == 0))
                lat2, deep2, st2 = jax.lax.cond(full, full_f, shallow_f,
                                                (lat, deep, st, i))
                deep_next = jnp.where(full, deep2, deep)
                return (lat2, deep_next, st2,
                        n_full + full.astype(jnp.int32),
                        mask.at[i].set(full.astype(jnp.int32)))

            lat, _, _, n_full, mask = jax.lax.fori_loop(
                0, n_steps, body,
                (lat, deep0, state0, jnp.int32(0),
                 jnp.zeros((n_steps,), jnp.int32)))
            return lat, n_full, mask

        def run_wrap(params, lat, g, ehs, pooled, tid, phase):
            state0 = {key: cache.init_rows(key, 2 * b, s, cin, cout, dtype)
                      for key, (s, cin, cout) in layout.items()}
            return run(params, lat, g, ehs, pooled, tid, phase, state0)

        return run_wrap

    @functools.lru_cache(maxsize=None)
    def run_compact(fraction: float):
        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                       compact_fraction=fraction, max_hits=4))
        layout = unet.cache_layout(hw, min_level=1)
        state0 = {key: cache.init_rows(key, 2 * b, s, cin, cout, dtype)
                  for key, (s, cin, cout) in layout.items()}

        @jax.jit
        def run(params, lat, g, ehs, pooled, tid):
            def body(i, carry):
                lat, st = carry
                out, st2, _ = one_step(params, lat, i, g, ehs, pooled, tid,
                                       cache=cache, cache_state=st)
                return out, st2

            lat, _ = jax.lax.fori_loop(0, n_steps, body, (lat, state0))
            return lat

        return run

    @functools.lru_cache(maxsize=None)
    def run_cfg_reuse(interval: int):
        """CFG uncond-branch reuse: full steps run both CFG halves and cache
        the uncond prediction; skip steps run ONLY the cond half (batch b,
        not 2b) and combine with the stale cached uncond.  Candidate lever
        because full steps dominate the hybrid headline's wall clock — but
        the session-6 pairwise finding says CFG asymmetry is what the
        guidance combine amplifies, so quality gates this."""
        @jax.jit
        def run(params, lat, g, ehs, pooled, tid):
            _, ehs_c = jnp.split(ehs, 2)
            _, pooled_c = jnp.split(pooled, 2)
            _, tid_c = jnp.split(tid, 2)

            def full_f(args):
                lat, u_cache, i = args
                c0 = jnp.full((b,), cs[i, 0])
                c1 = jnp.full((b,), cs[i, 1])
                t2 = jnp.full((2 * b,), ts[i], jnp.float32)
                lat_in = sampler.scale_model_input(
                    jnp.concatenate([lat, lat]), jnp.concatenate([c0, c0]))
                added = {"text_embeds": pooled, "time_ids": tid}
                out = unet.apply(params, lat_in, t2, ehs, added_cond=added)
                u, c = jnp.split(out, 2)
                eps = u + g.reshape(-1, 1, 1, 1) * (c - u)
                return sampler.step(lat, eps, c0, c1), u

            def skip_f(args):
                lat, u_cache, i = args
                c0 = jnp.full((b,), cs[i, 0])
                c1 = jnp.full((b,), cs[i, 1])
                t1 = jnp.full((b,), ts[i], jnp.float32)
                lat_in = sampler.scale_model_input(lat, c0)
                added = {"text_embeds": pooled_c, "time_ids": tid_c}
                c = unet.apply(params, lat_in, t1, ehs_c, added_cond=added)
                eps = u_cache + g.reshape(-1, 1, 1, 1) * (c - u_cache)
                return sampler.step(lat, eps, c0, c1), u_cache

            def body(i, carry):
                lat, u_cache = carry
                return jax.lax.cond(i % interval == 0, full_f, skip_f,
                                    (lat, u_cache, i))

            u0 = jnp.zeros((b, hw, hw, 4), dtype)
            lat_f, _ = jax.lax.fori_loop(0, n_steps, body, (lat, u0))
            return lat_f

        return run

    return (run_plain, run_deep, run_compact, make_inputs, params,
            run_drift, run_deep_adaptive, run_deep_hybrid, None,
            run_cfg_reuse, run_deep_predict, run_hybrid_rowphase)


def build_mmdit_runs(tiny: bool, batch: int, res: int, n_steps: int,
                     layers: int = 0):
    """SD3 compact token cache: (run_plain, None, run_compact, make_inputs).

    ``layers`` (tiny only): deepen TINY_MMDIT to this many blocks (dual
    attention in the first half, matching SD3.5-medium's 13/24 layout) so
    span-SKIP deep-cache spans can be ranked — the 2-block tiny config
    degenerates every span choice."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from sduss_tpu.models.mmdit import SD35_MEDIUM, TINY_MMDIT, SD3Transformer2DModel
    from sduss_tpu.samplers import get_sampler

    cfg = TINY_MMDIT if tiny else SD35_MEDIUM
    if tiny and layers:
        cfg = dataclasses.replace(
            TINY_MMDIT, num_layers=layers,
            dual_attention_layers=tuple(range((layers + 1) // 2)))
    model = SD3Transformer2DModel(cfg)
    sampler = get_sampler("flow_match", shift=3.0)
    dtype = jnp.float32 if tiny else jnp.bfloat16
    b = batch
    hw = res // 8
    seq = (hw // cfg.patch_size) ** 2
    ctx_len = 64 if tiny else 384

    table = sampler.make_table(n_steps)
    ts = jnp.asarray(table.timesteps)
    cs = jnp.asarray(table.coeffs)

    if tiny:
        params = model.init(jax.random.key(0))
    else:
        from sduss_tpu.utils import random_params_bf16

        params = random_params_bf16(model)

    def make_inputs(seed: int):
        r = np.random.default_rng(seed)
        lat = jnp.asarray(r.standard_normal((b, hw, hw, cfg.in_channels)), dtype)
        ehs = jnp.asarray(
            0.3 * r.standard_normal((2 * b, ctx_len, cfg.joint_attention_dim)), dtype)
        pooled = jnp.asarray(
            0.3 * r.standard_normal((2 * b, cfg.pooled_projection_dim)), dtype)
        g = jnp.full((b,), 4.5)
        return lat, g, ehs, pooled, None

    def _plain_step(params, x, i, g, ehs, pooled):
        c0 = jnp.full((b,), cs[i, 0])
        c1 = jnp.full((b,), cs[i, 1])
        t2 = jnp.full((2 * b,), ts[i], jnp.float32)
        out = model.apply(params, jnp.concatenate([x, x]), t2, ehs, pooled)
        u, c = jnp.split(out, 2)
        v = u + g.reshape(-1, 1, 1, 1) * (c - u)
        return sampler.step(x, v.astype(x.dtype), c0, c1), v

    @jax.jit
    def run_plain(params, lat, g, ehs, pooled, _tid):
        def body(i, x):
            return _plain_step(params, x, i, g, ehs, pooled)[0]

        return jax.lax.fori_loop(0, n_steps, body, lat)

    @jax.jit
    def run_drift(params, lat, g, ehs, pooled, _tid):
        def body(i, carry):
            x, prev, acc = carry
            x2, v = _plain_step(params, x, i, g, ehs, pooled)
            rel = jnp.mean((v - prev) ** 2) / (jnp.mean(prev**2) + 1e-12)
            return x2, v, acc + rel

        x0, v0 = _plain_step(params, lat, 0, g, ehs, pooled)
        _, _, acc = jax.lax.fori_loop(
            1, n_steps, body, (x0, v0, jnp.float32(0.0)))
        return acc / max(n_steps - 1, 1)

    @functools.lru_cache(maxsize=None)
    def run_compact(fraction: float, fine: bool = False):
        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        cache = BlockCache(CacheConfig(
            enabled=True, mode="compact",
            compact_fraction=1.0 if fine else fraction,
            patch_fraction=fraction if fine else 1.0, max_hits=4))
        layout = model.token_cache_layout(seq)
        if fine:
            state0 = {key: cache.init_token_rows_fine(key, 2 * b, s, d, dtype)
                      for key, (s, d) in layout.items()}
        else:
            state0 = {key: cache.init_token_rows(key, 2 * b, s, d, dtype,
                                                 ctx_seq=ctx_len)
                      for key, (s, d) in layout.items()}

        @jax.jit
        def run(params, lat, g, ehs, pooled, _tid):
            mask = jnp.ones((2 * b, seq), bool)

            def body(i, carry):
                x, st = carry
                c0 = jnp.full((b,), cs[i, 0])
                c1 = jnp.full((b,), cs[i, 1])
                t2 = jnp.full((2 * b,), ts[i], jnp.float32)
                x2 = jnp.concatenate([x, x])
                toks = model.embed_latents(
                    params,
                    sampler.scale_model_input(x2, jnp.concatenate([c0, c0])))
                out, st = model.apply_tokens(params, toks, mask, t2, ehs,
                                             pooled, cache=cache, cache_state=st)
                out = model.unpatchify(out, hw // cfg.patch_size,
                                       hw // cfg.patch_size)
                u, c = jnp.split(out, 2)
                v = u + g.reshape(-1, 1, 1, 1) * (c - u)
                return sampler.step(x, v.astype(x.dtype), c0, c1), st

            x, _ = jax.lax.fori_loop(0, n_steps, body, (lat, state0))
            return x

        return run

    @functools.lru_cache(maxsize=None)
    def run_deep_span(lo: int, hi: int, interval: int, fine: float = 0.0,
                      adaptive: float = 0.0, cap: int = 6,
                      compact: float = 0.0, predict: float = 0.0,
                      compact_predict: float = 0.0):
        """Span-skip deep cache (mmdit.py _trunk deep_mode): full step every
        ``interval`` steps emits dx = x_at_hi - x_at_lo (+ c_at_hi for
        interior spans); shallow steps skip blocks [lo,hi) and splice it.
        ``fine`` > 0 additionally gates the computed blocks per token (the
        SD3 deep x compact hybrid); ``compact`` > 0 composes the top-K
        COMPACT token cache instead (bench_sd3.py BENCH_SD3_CACHE — the
        35.7 ms production combo).  ``adaptive`` > 0 replaces the fixed
        interval with the drift trigger (full when latent rel-MSE since the
        last full exceeds it; ``cap`` shallow-step bound) and returns
        (x, n_full).  ``predict`` > 0 = reuse-then-predict momentum on the
        SPAN delta (shallow steps splice dx + m*k*slope, slope from the
        last two fulls — pipelines/sd3.py _sd3_deep_predicted); fixed
        interval only.  ``compact_predict`` > 0 = per-ROW output
        extrapolation inside the compact gates
        (CacheConfig.compact_predict, cache/manager.py _compact_splice)."""
        use_cache = fine > 0 or compact > 0
        cache = None
        if use_cache:
            from sduss_tpu.cache.manager import BlockCache
            from sduss_tpu.config import CacheConfig

            cache = BlockCache(CacheConfig(
                enabled=True, mode="compact",
                compact_fraction=compact if compact > 0 else 1.0,
                patch_fraction=fine if fine > 0 else 1.0, max_hits=4,
                compact_predict=compact_predict))
            layout = model.token_cache_layout(seq)
            if fine > 0:
                state0 = {key: cache.init_token_rows_fine(
                              key, 2 * b, s, d, dtype)
                          for key, (s, d) in layout.items()}
            else:
                state0 = {key: cache.init_token_rows(
                              key, 2 * b, s, d, dtype, ctx_seq=ctx_len)
                          for key, (s, d) in layout.items()}
        else:
            state0 = None
        deep0 = {"dx": jnp.zeros((2 * b, seq, cfg.dim), dtype)}
        if hi < cfg.num_layers:
            deep0["c"] = jnp.zeros((2 * b, ctx_len, cfg.dim), dtype)

        @jax.jit
        def run(params, lat, g, ehs, pooled, _tid):
            mask = jnp.ones((2 * b, seq), bool)

            def step(mode):
                def f(args):
                    x, st, dp, i = args
                    c0 = jnp.full((b,), cs[i, 0])
                    c1 = jnp.full((b,), cs[i, 1])
                    t2 = jnp.full((2 * b,), ts[i], jnp.float32)
                    x2 = sampler.scale_model_input(
                        jnp.concatenate([x, x]), jnp.concatenate([c0, c0]))
                    toks = model.embed_latents(params, x2)
                    if use_cache:
                        out, st, dp = model.apply_tokens(
                            params, toks, mask, t2, ehs, pooled,
                            cache=cache, cache_state=st,
                            deep_mode=mode, deep_span=(lo, hi),
                            deep_state=dp)
                    else:
                        out, dp = model.apply_tokens(
                            params, toks, mask, t2, ehs, pooled,
                            deep_mode=mode, deep_span=(lo, hi),
                            deep_state=dp)
                    out = model.unpatchify(out, hw // cfg.patch_size,
                                           hw // cfg.patch_size)
                    u, c = jnp.split(out, 2)
                    v = u + g.reshape(-1, 1, 1, 1) * (c - u)
                    return sampler.step(x, v.astype(x.dtype), c0, c1), st, dp

                return f

            full_f, sh_f = step("full"), step("shallow")

            if adaptive > 0:
                def body(i, carry):
                    x, st, dp, lat_ref, age, n_full = carry
                    drift = (jnp.mean((x - lat_ref) ** 2)
                             / (jnp.mean(lat_ref**2) + 1e-12))
                    full = (i == 0) | (age >= cap - 1) | (drift > adaptive)
                    x2, st2, dp2 = jax.lax.cond(full, full_f, sh_f,
                                                (x, st, dp, i))
                    lat_ref = jnp.where(full, x, lat_ref)
                    age = jnp.where(full, 0, age + 1)
                    return (x2, st2, dp2, lat_ref, age,
                            n_full + full.astype(jnp.int32))

                carry = jax.lax.fori_loop(
                    0, n_steps, body,
                    (lat, state0, deep0, jnp.zeros_like(lat),
                     jnp.int32(0), jnp.int32(0)))
                return carry[0], carry[5]

            if predict > 0:
                # span reuse-then-predict: carry the inter-full velocity
                # (same structure as dp) + a have-two-fulls flag; shallow
                # steps feed the extrapolated delta but carry the RAW one
                def full_g(args):
                    x, st, dp, sl, have, i = args
                    x2, st2, dp2 = full_f((x, st, dp, i))
                    sl2 = jax.tree.map(
                        lambda n, o: jnp.where(
                            have,
                            (n.astype(jnp.float32) - o.astype(jnp.float32))
                            / interval, 0.0).astype(n.dtype),
                        dp2, dp)
                    return x2, st2, dp2, sl2, jnp.bool_(True)

                def sh_g(args):
                    x, st, dp, sl, have, i = args
                    k = (i % interval).astype(jnp.float32)
                    dp_fed = jax.tree.map(
                        lambda d, s: (d.astype(jnp.float32)
                                      + predict * k * s.astype(jnp.float32)
                                      ).astype(d.dtype), dp, sl)
                    x2, st2, _ = sh_f((x, st, dp_fed, i))
                    return x2, st2, dp, sl, have

                def body(i, carry):
                    x, st, dp, sl, have = carry
                    return jax.lax.cond(i % interval == 0, full_g, sh_g,
                                        (x, st, dp, sl, have, i))

                slope0 = jax.tree.map(jnp.zeros_like, deep0)
                x, _, _, _, _ = jax.lax.fori_loop(
                    0, n_steps, body,
                    (lat, state0, deep0, slope0, jnp.bool_(False)))
                return x

            def body(i, carry):
                x, st, dp = carry
                return jax.lax.cond(i % interval == 0, full_f, sh_f,
                                    (x, st, dp, i))

            x, _, _ = jax.lax.fori_loop(0, n_steps, body,
                                        (lat, state0, deep0))
            return x

        return run

    return (run_plain, None, run_compact, make_inputs, params, run_drift,
            None, None, run_deep_span, None, None, None)


def main():
    ap = argparse.ArgumentParser("cache quality sweep")
    ap.add_argument("--family", choices=["sdxl", "sd15", "sd3"],
                    default="sdxl")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--res", type=int, default=0, help="0 = family default")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--deep", default="2,3,4")
    ap.add_argument("--deep-adaptive", default="",
                    help="drift thresholds for adaptive deep refresh "
                         "(full step when latent rel-MSE since the last "
                         "full exceeds the threshold; sdxl only)")
    ap.add_argument("--max-interval", type=int, default=6)
    ap.add_argument("--warmup", type=int, default=3,
                    help="always-full prefix steps for the adaptive/hybrid "
                         "schedules (production deep_warmup; 3 = the "
                         "apples-to-apples default)")
    ap.add_argument("--compact", default="0.3,0.5,0.7")
    ap.add_argument("--hybrid", default="",
                    help="deep x compact hybrid row fractions (sdxl only); "
                         "each runs the adaptive schedule at "
                         "--hybrid-threshold with shallow-pair row gating")
    ap.add_argument("--hybrid-threshold", type=float, default=0.05)
    ap.add_argument("--hybrid-pairwise", action="store_true",
                    help="CFG-pair-symmetric row selection for the hybrid "
                         "rows (gate_compact_pairs)")
    ap.add_argument("--rowwarm-phases", default="",
                    help="comma phases for the serving row-carry cadence "
                         "check (hybrid fixed interval; full at step 0 then "
                         "at phase + m*interval — batch-aligned expiry "
                         "lands at arbitrary request phase under row "
                         "carry-over).  Phase is a traced scalar: one "
                         "compile sweeps all phases.")
    ap.add_argument("--rowwarm-fraction", type=float, default=0.3,
                    help="hybrid row fraction for --rowwarm-phases "
                         "(serving preset: 0.3)")
    ap.add_argument("--rowwarm-interval", type=int, default=24,
                    help="fixed deep interval for --rowwarm-phases "
                         "(serving preset: 24)")
    ap.add_argument("--hybrid-predict", type=float, default=0.0,
                    help="reuse-then-predict momentum for the hybrid's "
                         "shallow-step deep features (0 = plain reuse)")
    ap.add_argument("--deep-predict", default="",
                    help="reuse-then-predict deep refresh (sdxl only): "
                         "'interval:momentum' comma-separated, e.g. "
                         "'3:1.0,6:1.0,6:0.5' — shallow steps extrapolate "
                         "the deep features linearly instead of holding")
    ap.add_argument("--cfg-reuse", default="",
                    help="CFG uncond-reuse intervals (sdxl only): full "
                         "steps run both CFG halves; skip steps run only "
                         "the cond half against the cached uncond")
    ap.add_argument("--fine", default="0.3,0.5,0.7",
                    help="per-token fine fractions (sd3 only)")
    ap.add_argument("--sd3-deep", default="",
                    help="span-skip deep configs (sd3 only): "
                         "'lo:hi@interval' or 'lo:hi@interval@fine' "
                         "comma-separated, e.g. '13:24@3,0:13@3@0.5'")
    ap.add_argument("--unet-levels", type=int, default=0,
                    help="(sdxl tiny) 3 = 3-level tiny proxy with SDXL's "
                         "level structure so --deep-boundary bites; 4 = "
                         "SD1.5's 4-level structure (attn levels 0-2, "
                         "conv projections)")
    ap.add_argument("--deep-boundary", type=int, default=0,
                    help="(sdxl) deep-cache boundary level for deep/hybrid "
                         "runs (0 = model default, deepest-1); 1 = conv-"
                         "only shallow step (SDXL wide span)")
    ap.add_argument("--mmdit-layers", type=int, default=0,
                    help="deepen the tiny MMDiT to N blocks (dual attention "
                         "in the first half) so --sd3-deep spans can be "
                         "ranked; 0 = stock config")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    res = args.res or (256 if args.tiny else
                       512 if args.family == "sd15" else 1024)
    build = (build_mmdit_runs if args.family == "sd3"
             else build_unet_runs)
    # params threads through as an explicit jit argument: closing over the
    # full-size bundle captured it as 5.13 GB of lowered CONSTANTS (shipped
    # with the program through the relay on every compile; measured warning
    # in the r2 chip queue).
    build_kw = ({"layers": args.mmdit_layers}
                if args.family == "sd3" and args.mmdit_layers else {})
    if args.family in ("sdxl", "sd15"):
        if args.unet_levels:
            if not args.tiny:
                ap.error("--unet-levels shapes the TINY proxy only; pass "
                         "--tiny (full-size models have their real level "
                         "count)")
            build_kw["levels"] = args.unet_levels
        if args.deep_boundary:
            build_kw["boundary"] = args.deep_boundary
        build_kw["family"] = args.family
    elif args.unet_levels or args.deep_boundary:
        # These knobs only reach the SDXL UNet builders; silently echoing
        # them into the artifact for sd15/sd3 would label default-config
        # numbers with knobs that never applied (advisor r2 finding).
        ap.error("--unet-levels/--deep-boundary only apply to the UNet "
                 "families (--family sdxl/sd15)")
    (run_plain, run_deep, run_compact, make_inputs, params,
     run_drift, run_deep_adaptive, run_deep_hybrid, run_deep_span,
     run_cfg_reuse, run_deep_predict, run_hybrid_rowphase) = build(
         args.tiny, args.batch, res, args.steps, **build_kw)

    configs = []
    if run_deep is not None:
        configs += [("deep", int(v)) for v in args.deep.split(",") if v]
    if run_deep_adaptive is not None:
        configs += [("deep_adaptive", float(v))
                    for v in args.deep_adaptive.split(",") if v]
        if args.deep_adaptive:
            configs += [("deep_warmup", int(v))
                        for v in args.deep.split(",") if v]
    configs += [("compact", float(v)) for v in args.compact.split(",") if v]
    if run_deep_hybrid is not None:
        configs += [("deep_hybrid", float(v))
                    for v in args.hybrid.split(",") if v]
    if run_cfg_reuse is not None:
        configs += [("cfg_reuse", int(v))
                    for v in args.cfg_reuse.split(",") if v]
    if run_hybrid_rowphase is not None:
        configs += [("hybrid_rowphase", int(v))
                    for v in args.rowwarm_phases.split(",") if v]
    if run_deep_predict is not None:
        for spec in (s for s in args.deep_predict.split(",") if s):
            itv, m = spec.split(":")
            configs.append(("deep_predict", (int(itv), float(m))))
    if args.family == "sd3":
        configs += [("token_fine", float(v)) for v in args.fine.split(",") if v]
        for spec in (s for s in args.sd3_deep.split(",") if s):
            span, rest = spec.split("@", 1)
            lo, hi = (int(v) for v in span.split(":"))
            parts = rest.split("@")
            fine = compact = predict = cpredict = 0.0
            for p in parts[1:]:
                # "2:8@6@0.5" = fine per-token 0.5; "@c0.5" = COMPACT top-K
                # token cache 0.5 (the production bench combo); "@p0.5" =
                # span reuse-then-predict momentum; "@q0.5" = compact-row
                # reuse-then-predict momentum (CacheConfig.compact_predict)
                if p.startswith("c"):
                    compact = float(p[1:])
                elif p.startswith("p"):
                    predict = float(p[1:])
                elif p.startswith("q"):
                    cpredict = float(p[1:])
                else:
                    fine = float(p)
            if parts[0].startswith("a"):
                # adaptive drift trigger, e.g. "2:8@a0.02" or "2:8@a0.02@0.5"
                configs.append(("sd3_deep",
                                (lo, hi, 0, fine, float(parts[0][1:]), 6,
                                 compact, 0.0, cpredict)))
            else:
                configs.append(("sd3_deep",
                                (lo, hi, int(parts[0]), fine, 0.0, 6,
                                 compact, predict, cpredict)))

    # cache-off reference trajectories: one per seed, shared by all configs
    refs = {}

    def ref_for(seed, inputs):
        if seed not in refs:
            refs[seed] = np.asarray(run_plain(params, *inputs), np.float32)
        return refs[seed]

    results = []
    for kind, param in configs:
        rels, coss = [], []
        for seed in range(args.seeds):
            inputs = make_inputs(seed)
            ref = ref_for(seed, inputs)
            full_frac = None
            if kind == "deep":
                run = run_deep(param)
            elif kind == "deep_warmup":
                run = run_deep(param, 3)
            elif kind == "deep_adaptive":
                # warmup like production deep_warmup / the deep_warmup
                # rows, so full counts compare apples-to-apples
                run = run_deep_adaptive(param, args.max_interval,
                                        args.warmup)
            elif kind == "deep_hybrid":
                run = run_deep_hybrid(args.hybrid_threshold, param,
                                      args.max_interval, args.warmup,
                                      args.hybrid_pairwise,
                                      args.hybrid_predict)
            elif kind == "cfg_reuse":
                run = run_cfg_reuse(param)
            elif kind == "hybrid_rowphase":
                base_run = run_hybrid_rowphase(args.rowwarm_fraction,
                                               args.rowwarm_interval,
                                               args.hybrid_pairwise)
                run = (lambda p, *ins, _r=base_run, _ph=param:
                       _r(p, *ins, np.int32(_ph)))
            elif kind == "deep_predict":
                # warmup 3 to match the deep_warmup / adaptive rows
                run = run_deep_predict(param[0], param[1], 3)
            elif kind == "token_fine":
                run = run_compact(param, fine=True)
            elif kind == "sd3_deep":
                run = run_deep_span(*param)
            else:
                run = run_compact(param)
            got = run(params, *inputs)
            pattern = None
            if kind in ("deep_adaptive", "deep_hybrid", "hybrid_rowphase"):
                got, n_full, mask = got
                full_frac = float(np.asarray(n_full)) / args.steps
                pattern = np.asarray(mask).astype(int).tolist()
            elif kind == "sd3_deep" and isinstance(got, tuple):
                got, n_full = got
                full_frac = float(np.asarray(n_full)) / args.steps
            got = np.asarray(got, np.float32)
            rel, cos = _metrics(got, ref)
            rels.append(rel)
            coss.append(cos)
        row = {"kind": kind, "param": param,
               "rel_mse": float(np.mean(rels)), "rel_mse_max": float(np.max(rels)),
               "cosine": float(np.mean(coss))}
        if pattern is not None:
            # realized refresh pattern (last seed) for sim_serving replay
            row["full_pattern"] = pattern
        if kind == "sd3_deep":
            lo_, hi_, itv_, fine_ = param[:4]
            ada_ = param[4] if len(param) > 4 else 0.0
            comp_ = param[6] if len(param) > 6 else 0.0
            pred_ = param[7] if len(param) > 7 else 0.0
            cpred_ = param[8] if len(param) > 8 else 0.0
            tag = f"a{ada_}" if ada_ else str(itv_)
            suffix = f"@{fine_}" if fine_ else (f"@c{comp_}" if comp_ else "")
            if pred_:
                suffix += f"@p{pred_}"
            if cpred_:
                suffix += f"@q{cpred_}"
            row.update(span=[lo_, hi_], interval=itv_ or None, fine=fine_,
                       compact=comp_, adaptive=ada_ or None,
                       span_predict=pred_, compact_predict=cpred_,
                       param=f"{lo_}:{hi_}@{tag}" + suffix)
            if ada_ and full_frac is not None:
                row["full_fraction"] = round(full_frac, 4)
        if kind == "deep":
            row["full_fraction"] = round(1.0 / param, 4)
        elif kind == "cfg_reuse":
            # skip steps still run the cond half: cost fraction, not fulls
            n = args.steps
            n_full = (n + param - 1) // param
            row["cost_fraction"] = round((n_full + 0.5 * (n - n_full)) / n, 4)
        elif kind == "deep_warmup":
            w, n = 3, args.steps
            row["full_fraction"] = round(
                (w + (n - w + param - 1) // param) / n, 4)
        elif kind == "deep_predict":
            itv, m = param
            w, n = 3, args.steps
            row.update(param=f"{itv}:{m}", interval=itv, momentum=m,
                       full_fraction=round(
                           (w + (n - w + itv - 1) // itv) / n, 4))
        elif kind == "hybrid_rowphase":
            row.update(full_fraction=round(full_frac, 4), phase=param,
                       interval=args.rowwarm_interval,
                       fraction=args.rowwarm_fraction,
                       pairwise=args.hybrid_pairwise)
        elif kind in ("deep_adaptive", "deep_hybrid"):
            row["full_fraction"] = round(full_frac, 4)
            row["warmup"] = args.warmup
            if kind == "deep_hybrid":
                row["threshold"] = args.hybrid_threshold
                row["pairwise"] = args.hybrid_pairwise
                row["momentum"] = args.hybrid_predict
                row["max_interval"] = args.max_interval
        results.append(row)
        print(json.dumps(row), flush=True)

    # Context: the temporal smoothness every reuse cache exploits.  A
    # trained model's step-to-step output drift is small (the paper
    # premise; reference classifiers act at rel-drift ~0.01); RANDOM
    # weights have none, so the cache divergences above are upper bounds —
    # pessimistic by roughly the drift ratio.
    drift = float(np.asarray(run_drift(params, *make_inputs(0))))
    print(json.dumps({"stepwise_output_drift": drift}), flush=True)

    out = {"family": args.family, "tiny": args.tiny, "res": res,
           "steps": args.steps, "batch": args.batch, "seeds": args.seeds,
           "deep_boundary": args.deep_boundary or None,
           "unet_levels": args.unet_levels or None,
           "stepwise_output_drift": drift,
           "note": ("random-weight models lack trained temporal smoothness; "
                    "cache divergence here is an upper bound (see "
                    "stepwise_output_drift vs the ~0.01 rel-drift scale "
                    "trained models exhibit)"),
           "configs": results}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
