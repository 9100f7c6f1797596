"""Headline benchmark: SDXL 1024^2, 30-step CFG denoising throughput per chip.

Prints ONE JSON line:
  {"metric": "images/sec/chip (SDXL 1024^2, 30 steps)", "value": N,
   "unit": "img/s", "vs_baseline": N}

Baseline anchor (BASELINE.md): the reference's standalone SDXL 1024^2 denoising
on one H100 is 3.7 s for 50 steps (reference
sduss/worker/scheduler/configs/esymred.json:34-39), i.e. ~0.45 img/s/GPU at
30 steps, batch 1, fp16 — before continuous-batching gains. vs_baseline is
measured img/s/chip divided by that 0.45 anchor.

The default configuration enables temporal deep-block reuse at BOUNDARY 1
(the shallow step is conv-only — every transformer level above level 0 is
cached, the SDXL analog of SD3's wide span) with DRIFT-TRIGGERED refresh
(threshold 0.3, safety cap 20, warmup 1) COMPOSED with CFG-pair-symmetric
compact row gating and reuse-then-predict on the shallow steps (deep x
compact HYBRID, row fraction 0.3, pairwise selection, momentum 0.5) — the
reference's headline figures likewise run WITH its learned block cache on
(reference scripts/paper/e2e.sh:32-37 exports ESYMRED_USE_CACHE=TRUE for
the esymred/fcfs_mixed rows), so cache-on vs cache-on is the
apples-to-apples comparison.  Measured on chip (r3g/r3i ladder):
**w1/t0.3/cap30 = 2.7849 img/s at ONE full step of 30 = 6.19x the H100
anchor** (exp/bench_sdxl_bdy1_w1c30_v5e.json) vs 2.1911 at cap20
(2/30; zero-env confirm 2.1867), 1.8089 at w2/t0.25 (3/30), 1.5508 at
w3/t0.2/cap15 (4/30), 1.0199 at the round-2 default (bdy2 t0.1/cap10),
0.8752 at t0.05/cap6, 0.6475 plain adaptive, 0.5684 fixed interval 3.  Quality at FULL SDXL size on chip is FLAT across the ladder
(exp/cache_quality_sdxl_bdy1_{t02c15,w2t025,w1t03,w1c30}_full_v5e.json):
rel_mse 7.25e-5 / 9.47e-5 / 7.47e-5 / 7.93e-5 at 4/3/2/1 fulls of 30 —
all >=100x under the reference's 0.01 classifier bar
(cache_manager.py:101-191) and far below the model's own 0.0077/step
output drift; the 3-level tiny proxy's 0.00629 was an 87x over-estimate
(random tiny weights drift harder).  Decision rule: docs/DESIGN.md "Cache default
adjudication".  Pairwise selection is what
clears fraction 0.3: independent top-K picks 5 of 16 rows (odd) and
splits CFG pairs (5x the divergence).  The cache-off number is reported
alongside.

Env knobs:
  BENCH_BATCH   image batch per step (default 8; measured best on v5e)
  BENCH_DEEP    deep-reuse interval for the fixed schedule (default 3)
  BENCH_STEPS   denoise steps per timed run (default 30)
  BENCH_REPEATS timed repeats, best-of (default 3)
  BENCH_DEEP_ADAPTIVE  drift threshold for the adaptive deep schedule
                (default 0.3, the measured on-chip winner at boundary 1;
                0 reverts to the fixed BENCH_DEEP interval; BENCH_DEEP_CAP
                safety interval, default 30; BENCH_DEEP_WARMUP always-full
                prefix, default 1); reports the realized full-step count
  BENCH_DEEP_HYBRID  deep x compact hybrid row fraction (default 0.3, the
                measured on-chip winner inside the round-1 quality bound;
                0 = plain adaptive): shallow steps additionally gate their
                block pairs at top-K row capacity
                (CacheConfig.deep_compact_fraction), full steps write the
                row caches through; composes with the adaptive schedule
                above
  BENCH_DEEP_BOUNDARY  deep-cache boundary level (default 1 = cache
                everything above level 0: the shallow step becomes
                conv-only, the SDXL analog of SD3's wide span — the
                chip-confirmed headline).  0 = model default (deepest-1 =
                2 for SDXL, the round-2 configuration); values clamp into
                [1, n_levels-1].
  BENCH_HYBRID_PAIRWISE  1 (default) = CFG-pair-symmetric row selection
                (gate_compact_pairs; odd independent top-K counts split
                uncond/cond pairs and the CFG combine amplifies it);
                0 = independent rows
  BENCH_HYBRID_PREDICT  reuse-then-predict momentum (default 0.5): shallow
                steps extrapolate the deep features along the inter-full
                velocity instead of holding them (CacheConfig.deep_predict;
                tiny harness: 16% tighter divergence at the default
                schedule, exp/cache_quality_sdxl_predict_tiny.json);
                0 = plain reuse
"""

from __future__ import annotations

import json
import os
import time


def _random_params_bf16(model, seed: int = 0):
    from sduss_tpu.utils import random_params_bf16

    return random_params_bf16(model, seed)


def _deep_boundary_env():
    """BENCH_DEEP_BOUNDARY parse + clamp into [1, n_levels-1] of the LIVE
    model config — the one parse used both by build_step and the artifact
    JSON label (advisor r3: the label clamped against full SDXL's 3 levels
    while build_step clamps against the active config's level count, so
    tiny 2-level smoke runs were mislabeled)."""
    from sduss_tpu.models.unet import SDXL_UNET

    v = os.environ.get("BENCH_DEEP_BOUNDARY", "1")
    bdy = (int(v) or None) if v else None
    if bdy is not None:
        bdy = max(1, min(bdy, len(SDXL_UNET.block_out_channels) - 1))
    return bdy


def build_step_abstract(batch: int):
    """(step_fn, abstract_args) with jax.ShapeDtypeStruct arguments — for
    chip-free lowering / XLA cost analysis (scripts/sdxl_roofline.py).
    Mirrors build_step's CFG step exactly but materializes nothing."""
    import jax
    import jax.numpy as jnp

    from sduss_tpu.models.unet import SDXL_UNET, UNet2DConditionModel
    from sduss_tpu.samplers import get_sampler
    from sduss_tpu.utils import random_params_bf16

    unet = UNet2DConditionModel(SDXL_UNET)
    sampler = get_sampler("euler")
    b, hw = batch, 128
    params = jax.eval_shape(lambda: random_params_bf16(unet))
    _, pooled_dim, n_ids = unet.cfg.addition_embed
    sds = jax.ShapeDtypeStruct
    args = (params,
            sds((b, hw, hw, 4), jnp.bfloat16),
            sds((b,), jnp.float32),
            sds((b, 2), jnp.float32),
            sds((b,), jnp.float32),
            sds((b, 77, unet.cfg.cross_attention_dim), jnp.bfloat16),
            sds((b, pooled_dim), jnp.bfloat16),
            sds((b, n_ids), jnp.float32))

    def step(params, latents, t, coeffs, guidance, ehs, pooled, time_ids):
        c0, c1 = coeffs[:, 0], coeffs[:, 1]
        lat_in = jnp.concatenate([latents, latents], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        lat_in = sampler.scale_model_input(lat_in, jnp.concatenate([c0, c0]))
        added = {"text_embeds": jnp.concatenate([pooled, pooled], axis=0),
                 "time_ids": jnp.concatenate([time_ids, time_ids], axis=0)}
        out = unet.apply(params, lat_in, t2,
                         jnp.concatenate([ehs, ehs], axis=0), added_cond=added)
        uncond, text = jnp.split(out, 2, axis=0)
        eps = uncond + guidance.reshape(-1, 1, 1, 1) * (text - uncond)
        return sampler.step(latents, eps, c0, c1)

    return step, args


def build_step(batch: int):
    import jax
    import jax.numpy as jnp

    from sduss_tpu.models.unet import SDXL_UNET, UNet2DConditionModel
    from sduss_tpu.samplers import get_sampler

    unet = UNet2DConditionModel(SDXL_UNET)
    params = _random_params_bf16(unet)
    sampler = get_sampler("euler")

    b, hw = batch, 128  # 1024 px -> 128x128 latent
    # unit noise, like a real trajectory start (zeros would degenerate the
    # adaptive-deep drift metric; identical FLOPs for the fixed schedules)
    latents = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, 4),
                                jnp.bfloat16)
    t = jnp.full((b,), 500.0, jnp.float32)
    coeffs = jnp.asarray([[4.0, 3.0]] * b, jnp.float32)
    guidance = jnp.full((b,), 5.0, jnp.float32)
    # conditioning dims from the config (2048/1280/6 at full SDXL size;
    # lets the tiny-config smoke tests drive the same builders)
    _, pooled_dim, n_ids = unet.cfg.addition_embed
    ehs = jnp.zeros((b, 77, unet.cfg.cross_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((b, pooled_dim), jnp.bfloat16)
    time_ids = jnp.asarray([[1024.0, 1024.0, 0, 0, 1024.0, 1024.0][:n_ids]] * b,
                           jnp.float32)

    def one_step(params, latents, t, c0, c1, guidance, ehs, pooled, time_ids):
        lat_in = jnp.concatenate([latents, latents], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        lat_in = sampler.scale_model_input(lat_in, jnp.concatenate([c0, c0]))
        added = {"text_embeds": jnp.concatenate([pooled, pooled], axis=0),
                 "time_ids": jnp.concatenate([time_ids, time_ids], axis=0)}
        out = unet.apply(params, lat_in, t2,
                         jnp.concatenate([ehs, ehs], axis=0), added_cond=added)
        uncond, text = jnp.split(out, 2, axis=0)
        eps = uncond + guidance.reshape(-1, 1, 1, 1) * (text - uncond)
        return sampler.step(latents, eps, c0, c1)

    @jax.jit
    def step(params, latents, t, coeffs, guidance, ehs, pooled, time_ids):
        return one_step(params, latents, t, coeffs[:, 0], coeffs[:, 1],
                        guidance, ehs, pooled, time_ids)

    # BENCH_DEEP_BOUNDARY: deep-cache boundary level (default 1 — the
    # chip-confirmed headline: boundary=1 caches everything above level 0,
    # the shallow step becomes conv-only (no transformers), the SDXL analog
    # of SD3's wide span; 1.5508 img/s at t0.2/cap15,
    # /tmp->exp/bench_sdxl_bdy1_t02c15).  0 = model default (deepest-1);
    # out-of-range values clamp into [1, n_levels-1] so tiny smoke configs
    # degenerate to deepest-1 instead of crashing (a literal boundary 0
    # would never capture deep_feature and the first shallow step dies on
    # deep_state=None — advisor r2 finding).
    deep_bdy = _deep_boundary_env()

    def _deep_shapes():
        n_lv = len(unet.cfg.block_out_channels)
        bdy = deep_bdy if deep_bdy is not None else n_lv - 1
        # deep feature = h entering up block (n_lv - bdy): spatial of level
        # bdy-1, channels of the deepest cached up block's upsample conv
        return (hw // (2 ** max(bdy - 1, 0)),
                unet.cfg.block_out_channels[bdy])

    def _mk_deep_step(ts, cs, mode):
        """Shared CFG-doubled deep step (fixed AND adaptive trajectories use
        this one builder, so a fix to the step math cannot silently diverge
        the A/B)."""
        def f(params, lat, deep, i):
            t_i = jnp.full((2 * b,), ts[i], jnp.float32)
            c0 = jnp.full((b,), cs[i, 0])
            c1 = jnp.full((b,), cs[i, 1])
            lat_in = jnp.concatenate([lat, lat], axis=0)
            lat_in = sampler.scale_model_input(
                lat_in, jnp.concatenate([c0, c0]))
            added = {"text_embeds": jnp.concatenate([pooled, pooled], axis=0),
                     "time_ids": jnp.concatenate([time_ids, time_ids], axis=0)}
            out, deep2 = unet.apply(
                params, lat_in, t_i, jnp.concatenate([ehs, ehs], axis=0),
                added_cond=added, deep_mode=mode, deep_boundary=deep_bdy,
                deep_state=deep if mode == "shallow" else None)
            u, c = jnp.split(out, 2, axis=0)
            eps = u + guidance.reshape(-1, 1, 1, 1) * (c - u)
            return sampler.step(lat, eps, c0, c1), deep2

        return f

    def make_deep_trajectory(n_steps: int, interval: int):
        """Trajectory with temporal deep-block reuse (cache mode 'deep'):
        full step every `interval` steps, shallow steps reuse the deep
        feature — all inside one jit via lax.cond (static shapes)."""
        table = sampler.make_table(n_steps)
        ts = jnp.asarray(table.timesteps)
        cs = jnp.asarray(table.coeffs)
        hw_deep, c_deep = _deep_shapes()
        full_f = _mk_deep_step(ts, cs, "full")
        shallow_f = _mk_deep_step(ts, cs, "shallow")

        @jax.jit
        def run(params, latents, guidance_, ehs_, pooled_, time_ids_):
            deep0 = jnp.zeros((2 * b, hw_deep, hw_deep, c_deep), jnp.bfloat16)

            def body(i, carry):
                lat, deep = carry
                return jax.lax.cond(
                    (i % interval) == 0,
                    lambda args: full_f(params, args[0], args[1], i),
                    lambda args: shallow_f(params, args[0], args[1], i),
                    (lat, deep))

            lat, _ = jax.lax.fori_loop(0, n_steps, body, (latents, deep0))
            return lat

        return run

    def make_adaptive_deep_trajectory(n_steps: int, threshold: float,
                                      cap: int, warmup: int):
        """Deep reuse with drift-triggered refresh (CacheConfig.deep_adaptive,
        pipelines/base.py _drift_exceeds): a full step runs when the latent's
        relative MSE since the last full step exceeds ``threshold`` (or the
        ``cap`` safety interval / ``warmup`` prefix forces one).  Entirely
        in-graph; also returns the realized full-step count."""
        table = sampler.make_table(n_steps)
        ts = jnp.asarray(table.timesteps)
        cs = jnp.asarray(table.coeffs)
        hw_deep, c_deep = _deep_shapes()
        full_f = _mk_deep_step(ts, cs, "full")
        shallow_f = _mk_deep_step(ts, cs, "shallow")

        @jax.jit
        def run(params, latents, guidance_, ehs_, pooled_, time_ids_):
            deep0 = jnp.zeros((2 * b, hw_deep, hw_deep, c_deep), jnp.bfloat16)

            def body(i, carry):
                lat, deep, lat_ref, age, n_full = carry
                # drift vs the last full step's INPUT latent (what the deep
                # features were computed from; matches production
                # _note_drift and the calibration harness)
                drift = (jnp.mean((lat - lat_ref).astype(jnp.float32) ** 2)
                         / (jnp.mean(lat_ref.astype(jnp.float32) ** 2) + 1e-12))
                full = ((i < warmup) | (age >= cap - 1) | (drift > threshold))
                lat2, deep2 = jax.lax.cond(
                    full,
                    lambda args: full_f(params, args[0], args[1], i),
                    lambda args: shallow_f(params, args[0], args[1], i),
                    (lat, deep))
                lat_ref = jnp.where(full, lat, lat_ref)
                age = jnp.where(full, 0, age + 1)
                return (lat2, deep2, lat_ref, age,
                        n_full + full.astype(jnp.int32))

            lat, _, _, _, n_full = jax.lax.fori_loop(
                0, n_steps, body,
                (latents, deep0, latents, jnp.int32(0), jnp.int32(0)))
            return lat, n_full

        return run

    def make_hybrid_trajectory(n_steps: int, threshold: float, cap: int,
                               warmup: int, fraction: float,
                               pairwise: bool = False,
                               momentum: float = 0.0):
        """Adaptive deep refresh x compact row gating on shallow steps
        (CacheConfig.deep_compact_fraction): SHALLOW steps recompute only
        the fraction*rows most-drifted CFG rows of each shallow block pair
        and splice cached outputs for the rest; FULL steps recompute
        everything and write the row caches through.  Returns
        (final latents, n_full) like the adaptive trajectory."""
        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        cache = BlockCache(CacheConfig(enabled=True, mode="deep",
                                       deep_compact_fraction=fraction,
                                       deep_compact_pairwise=pairwise,
                                       max_hits=4))
        layout = unet.shallow_cache_layout(hw, deep_bdy)

        def mk_state0():
            # built INSIDE the jit trace: zeros lower to XLA broadcasts, not
            # multi-GB lowered constants shipped through the relay compile
            return {key: cache.init_rows(key, 2 * b, s, cin, cout,
                                         jnp.bfloat16)
                    for key, (s, cin, cout) in layout.items()}

        table = sampler.make_table(n_steps)
        ts = jnp.asarray(table.timesteps)
        cs = jnp.asarray(table.coeffs)
        hw_deep, c_deep = _deep_shapes()

        def mk(mode):
            def f(params, lat, deep, st, i):
                t_i = jnp.full((2 * b,), ts[i], jnp.float32)
                c0 = jnp.full((b,), cs[i, 0])
                c1 = jnp.full((b,), cs[i, 1])
                lat_in = jnp.concatenate([lat, lat], axis=0)
                lat_in = sampler.scale_model_input(
                    lat_in, jnp.concatenate([c0, c0]))
                added = {"text_embeds": jnp.concatenate([pooled, pooled], axis=0),
                         "time_ids": jnp.concatenate([time_ids, time_ids], axis=0)}
                out, deep2, st2 = unet.apply(
                    params, lat_in, t_i, jnp.concatenate([ehs, ehs], axis=0),
                    added_cond=added, deep_mode=mode, deep_boundary=deep_bdy,
                    deep_state=deep if mode == "shallow" else None,
                    cache=cache, cache_state=st)
                u, c = jnp.split(out, 2, axis=0)
                eps = u + guidance.reshape(-1, 1, 1, 1) * (c - u)
                return sampler.step(lat, eps, c0, c1), deep2, st2

            return f

        full_f = mk("full")
        shallow_f = mk("shallow")

        @jax.jit
        def run(params, latents, guidance_, ehs_, pooled_, time_ids_):
            deep0 = jnp.zeros((2 * b, hw_deep, hw_deep, c_deep), jnp.bfloat16)

            def body(i, carry):
                lat, deep, st, lat_ref, age, n_full, slope, gap = carry
                drift = (jnp.mean((lat - lat_ref).astype(jnp.float32) ** 2)
                         / (jnp.mean(lat_ref.astype(jnp.float32) ** 2) + 1e-12))
                full = ((i < warmup) | (age >= cap - 1) | (drift > threshold))
                # reuse-then-predict (CacheConfig.deep_predict): shallow
                # steps extrapolate the deep features along the inter-full
                # velocity instead of holding them frozen
                deep_in = jnp.where(
                    full, deep,
                    (deep.astype(jnp.float32)
                     + momentum * (age + 1).astype(jnp.float32)
                     * slope.astype(jnp.float32)).astype(deep.dtype))
                lat2, deep2, st2 = jax.lax.cond(
                    full,
                    lambda args: full_f(params, *args),
                    lambda args: shallow_f(params, *args),
                    (lat, deep_in, st, i))
                slope = jnp.where(
                    full & (gap > 0),
                    ((deep2.astype(jnp.float32) - deep.astype(jnp.float32))
                     / jnp.maximum(gap, 1).astype(jnp.float32)
                     ).astype(slope.dtype),
                    slope)
                deep_next = jnp.where(full, deep2, deep)
                gap = jnp.where(full, 1, gap + 1)
                lat_ref = jnp.where(full, lat, lat_ref)
                age = jnp.where(full, 0, age + 1)
                return (lat2, deep_next, st2, lat_ref, age,
                        n_full + full.astype(jnp.int32), slope, gap)

            lat, _, _, _, _, n_full, _, _ = jax.lax.fori_loop(
                0, n_steps, body,
                (latents, deep0, mk_state0(), latents, jnp.int32(0),
                 jnp.int32(0), jnp.zeros_like(deep0), jnp.int32(0)))
            return lat, n_full

        return run

    def make_compact_trajectory(n_steps: int, fraction: float):
        """Trajectory with the compact top-K block cache (mode 'compact'):
        every gated (resnet+attention) pair recomputes only the
        fraction*rows most-drifted image rows each step; cache state rides
        the fori_loop carry."""
        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                       compact_fraction=fraction, max_hits=4))
        layout = unet.cache_layout(hw, min_level=1)

        def mk_state0():
            return {key: cache.init_rows(key, 2 * b, s, cin, cout,
                                         jnp.bfloat16)
                    for key, (s, cin, cout) in layout.items()}

        table = sampler.make_table(n_steps)
        ts = jnp.asarray(table.timesteps)
        cs = jnp.asarray(table.coeffs)

        @jax.jit
        def run(params, latents, guidance_, ehs_, pooled_, time_ids_):
            def body(i, carry):
                lat, st = carry
                t_i = jnp.full((2 * b,), ts[i], jnp.float32)
                c0 = jnp.full((b,), cs[i, 0])
                c1 = jnp.full((b,), cs[i, 1])
                lat_in = jnp.concatenate([lat, lat], axis=0)
                lat_in = sampler.scale_model_input(
                    lat_in, jnp.concatenate([c0, c0]))
                added = {"text_embeds": jnp.concatenate([pooled_, pooled_], axis=0),
                         "time_ids": jnp.concatenate([time_ids_, time_ids_], axis=0)}
                out, st2 = unet.apply(
                    params, lat_in, t_i, jnp.concatenate([ehs_, ehs_], axis=0),
                    added_cond=added, cache=cache, cache_state=st)
                u, c = jnp.split(out, 2, axis=0)
                eps = u + guidance_.reshape(-1, 1, 1, 1) * (c - u)
                return sampler.step(lat, eps, c0, c1), st2

            lat, _ = jax.lax.fori_loop(0, n_steps, body,
                                       (latents, mk_state0()))
            return lat

        return run

    def make_trajectory(n_steps: int):
        """Full n-step denoise in ONE jit (offline batched generation,
        BASELINE config 2) — per-step timesteps/sigmas from a real Euler
        table, scanned with lax.fori_loop.  One dispatch per trajectory:
        isolates device throughput from the per-call relay overhead
        (~250 ms/dispatch via the axon tunnel, scripts/bench_attn.py)."""
        table = sampler.make_table(n_steps)
        ts = jnp.asarray(table.timesteps)           # (n,)
        cs = jnp.asarray(table.coeffs)              # (n, 2)

        @jax.jit
        def run(params, latents, guidance, ehs, pooled, time_ids):
            def body(i, lat):
                t_i = jnp.full((lat.shape[0],), ts[i], jnp.float32)
                c0 = jnp.full((lat.shape[0],), cs[i, 0])
                c1 = jnp.full((lat.shape[0],), cs[i, 1])
                return one_step(params, lat, t_i, c0, c1, guidance, ehs,
                                pooled, time_ids)

            return jax.lax.fori_loop(0, n_steps, body, latents)

        return run

    args = (params, latents, t, coeffs, guidance, ehs, pooled, time_ids)
    return (step, make_trajectory, make_deep_trajectory,
            make_compact_trajectory, make_adaptive_deep_trajectory,
            make_hybrid_trajectory, args)


def main() -> None:
    import jax

    # Persistent compilation cache: full-size SDXL compiles take ~15-20 min
    # through the axon relay; cache hits make re-benching cheap.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/root/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    n_steps = int(os.environ.get("BENCH_STEPS", "30"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    forced = os.environ.get("BENCH_BATCH")
    # batch 8 measured best on v5e (BENCH logs: b1 0.195, b4 0.200, b8 0.226
    # img/s); keep the default run single-config so one compile (~20 min via
    # the relay, cached afterwards) bounds driver time.
    batches = [int(forced)] if forced else [8]

    import jax
    import numpy as np

    mode = os.environ.get("BENCH_MODE", "scan")  # scan | per_step
    best_ips, best_b = 0.0, 0
    for b in batches:
        try:
            (step, make_trajectory, make_deep_trajectory,
             make_compact_trajectory, make_adaptive_deep_trajectory,
             make_hybrid_trajectory, args) = build_step(b)
            (params, latents, t, coeffs, guidance, ehs, pooled, time_ids) = args
            deep_interval = int(os.environ.get("BENCH_DEEP", "3"))
            compact_frac = float(os.environ.get("BENCH_COMPACT", "0"))
            adaptive_thresh = float(os.environ.get("BENCH_DEEP_ADAPTIVE", "0.3"))
            hybrid_frac = float(os.environ.get("BENCH_DEEP_HYBRID", "0.3"))
            n_full = None
            if mode == "scan":
                adaptive = ((adaptive_thresh > 0 or hybrid_frac > 0)
                            and compact_frac <= 0)
                if hybrid_frac > 0 and compact_frac <= 0:
                    run = make_hybrid_trajectory(
                        n_steps, adaptive_thresh or 0.05,
                        cap=int(os.environ.get("BENCH_DEEP_CAP", "30")),
                        warmup=int(os.environ.get("BENCH_DEEP_WARMUP", "1")),
                        fraction=hybrid_frac,
                        pairwise=os.environ.get("BENCH_HYBRID_PAIRWISE",
                                                "1") == "1",
                        momentum=float(os.environ.get("BENCH_HYBRID_PREDICT",
                                                      "0.5")))
                elif adaptive:
                    run = make_adaptive_deep_trajectory(
                        n_steps, adaptive_thresh,
                        cap=int(os.environ.get("BENCH_DEEP_CAP", "30")),
                        warmup=int(os.environ.get("BENCH_DEEP_WARMUP", "1")))
                elif compact_frac > 0:
                    run = make_compact_trajectory(n_steps, compact_frac)
                else:
                    run = (make_deep_trajectory(n_steps, deep_interval)
                           if deep_interval > 1 else make_trajectory(n_steps))
                out = run(params, latents, guidance, ehs, pooled, time_ids)
                # device_get forces real completion — on the experimental
                # axon relay backend block_until_ready can return before the
                # remote execution finishes (inflates throughput ~30x).
                np.asarray(out[0] if adaptive else out)
                best_t = float("inf")
                nf = None
                for _ in range(repeats):
                    t0 = time.perf_counter()
                    out = run(params, latents, guidance, ehs, pooled, time_ids)
                    if adaptive:
                        out, nf = out  # fetched AFTER timing (relay RTT
                        # would bias the adaptive side of the A/B)
                    checksum = float(np.asarray(out).astype(np.float32).sum())
                    best_t = min(best_t, time.perf_counter() - t0)
                if adaptive:
                    n_full = int(np.asarray(nf))
            else:
                latents = step(params, latents, t, coeffs, guidance, ehs,
                               pooled, time_ids)
                np.asarray(latents)
                best_t = float("inf")
                for _ in range(repeats):
                    lat = latents
                    t0 = time.perf_counter()
                    for _ in range(n_steps):
                        lat = step(params, lat, t, coeffs, guidance, ehs,
                                   pooled, time_ids)
                    checksum = float(np.asarray(lat).astype(np.float32).sum())
                    best_t = min(best_t, time.perf_counter() - t0)
            ips = b / (best_t * (30.0 / n_steps))  # normalize to 30 steps
            extra = (f", full_steps={n_full}/{n_steps}"
                     if n_full is not None else "")
            print(f"# batch={b} mode={mode}: {best_t:.3f}s/{n_steps} steps -> "
                  f"{ips:.4f} img/s (30-step), checksum={checksum:.3e}"
                  f"{extra}", flush=True)
            if ips > best_ips:
                best_ips, best_b = ips, b
            del step, args, latents, params
            import gc

            gc.collect()
        except Exception as e:
            print(f"# batch={b} failed: {type(e).__name__}: {e}", flush=True)
            continue

    baseline = 0.45  # img/s/chip, H100 30-step anchor (BASELINE.md)
    deep = int(os.environ.get("BENCH_DEEP", "3"))
    print(json.dumps({
        "metric": "images/sec/chip (SDXL 1024^2, 30 steps)",
        "value": round(best_ips, 4),
        "unit": "img/s",
        "vs_baseline": round(best_ips / baseline, 4),
        "batch": best_b,
        "deep_reuse_interval": deep if mode == "scan" else 0,
        "deep_adaptive_threshold": float(
            os.environ.get("BENCH_DEEP_ADAPTIVE", "0.3")),
        "deep_cap": int(os.environ.get("BENCH_DEEP_CAP", "30")),
        "compact_fraction": float(os.environ.get("BENCH_COMPACT", "0")),
        "hybrid_fraction": float(os.environ.get("BENCH_DEEP_HYBRID", "0.3")),
        "hybrid_pairwise": os.environ.get("BENCH_HYBRID_PAIRWISE", "1") == "1",
        "hybrid_predict": float(os.environ.get("BENCH_HYBRID_PREDICT", "0.5")),
        # the SAME parse+clamp build_step used (int("") once crashed the
        # final print AFTER a multi-hour run; a duplicated clamp constant
        # mislabeled tiny-config artifacts — advisor r3)
        "deep_boundary": _deep_boundary_env(),
        "cache_off_img_s": 0.3218,  # measured same config (fused attention), BENCH logs
    }))


if __name__ == "__main__":
    main()
