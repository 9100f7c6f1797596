"""SD3.5-medium MMDiT 1024^2 step latency on the real chip (BASELINE config 3).

Reference anchor: 65 ms/step at 1024^2 batch 1 on H100
(reference policy/ESyMReD.py:30-42)."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from sduss_tpu.models.mmdit import SD35_MEDIUM, SD3Transformer2DModel
    from sduss_tpu.samplers import get_sampler
    from sduss_tpu.utils import random_params

    model = SD3Transformer2DModel(SD35_MEDIUM)
    params = random_params(model, dtype=jnp.bfloat16)
    sampler = get_sampler("flow_match", shift=3.0)
    b = int(os.environ.get("BENCH_SD3_BATCH", "1"))
    # shapes derive from the model config so the smoke test can swap in
    # TINY_MMDIT (tests/test_bench_sd3_smoke.py); chip default = 1024^2
    hw = int(os.environ.get("BENCH_SD3_HW", "128"))
    # 10 realizes interval-3-ish schedules; long-interval spans (the dense
    # wide-span ladder, interval 8-16) need the full 30-step production
    # schedule to hit their true full fraction — set BENCH_SD3_STEPS=30
    # 30 = the standard trajectory everywhere else (bench.py, serving,
    # the H100 anchors).  With amortized caches the per-step number
    # DEPENDS on trajectory length (interval 30 over 10 steps = 1 full
    # per 10 = 33.8 ms; over 30 steps = 19.7 ms) — a 10-step default
    # silently under-reported the wide-span default 1.9x.
    n_steps = int(os.environ.get("BENCH_SD3_STEPS", "30"))
    table = sampler.make_table(n_steps)
    ts = jnp.asarray(table.timesteps)
    cs = jnp.asarray(table.coeffs)

    lat = jnp.zeros((b, hw, hw, model.cfg.in_channels), jnp.bfloat16)
    # context padded 333 -> 384 so the joint sequence (4096+384=4480) is
    # 128-aligned and the flash kernel can engage (set BENCH_SD3_CTX=333 for
    # the unaligned/dense variant)
    ctx_len = int(os.environ.get("BENCH_SD3_CTX", "384"))
    ehs = jnp.zeros((2 * b, ctx_len, model.cfg.joint_attention_dim),
                    jnp.bfloat16)
    pooled = jnp.zeros((2 * b, model.cfg.pooled_projection_dim), jnp.bfloat16)
    g = jnp.full((b,), 4.5)

    # BENCH_SD3_CACHE=0.5 -> compact top-K token cache at that fraction
    # (request-granular rows); BENCH_SD3_FINE=0.5 -> per-TOKEN delta-skip
    # compaction instead (gate_tokens_fine — the b1-meaningful granularity);
    # BENCH_SD3_FINE_STALE_KV=1 -> unselected tokens splice the previous
    # step's K/V (CacheConfig.fine_stale_kv) — one sync step primes the
    # state OUTSIDE the timed loop, so ms_per_step is the steady stale cost.
    # BENCH_SD3_DEEP="lo:hi" -> SPAN-SKIP deep cache (mmdit.py _trunk
    # deep_mode): full step every BENCH_SD3_DEEP_INTERVAL (default 3) steps
    # emits the span's residual delta; shallow steps skip blocks [lo,hi) and
    # splice it.  Composes with CACHE/FINE (the SD3 deep x compact hybrid).
    # BENCH_SD3_DEEP_ADAPTIVE=0.05 -> drift-triggered refresh instead of the
    # fixed interval (full when the latent rel-MSE since the last full step
    # exceeds the threshold; BENCH_SD3_DEEP_CAP shallow-step safety cap) —
    # the same in-graph trigger as bench.py's SDXL adaptive trajectory.
    # DEFAULT = DENSE WIDE SPAN 1:24 @ interval 30 (ONE full step per
    # 30-step trajectory), token gates OFF: 19.7 ms/step = 3.34x the H100
    # anchor (chip ladder exp/bench_sd3_v5e_span124_i{6,8,12,16,20,30}
    # .json: 47.8/40.6/33.6/26.7/27.2/19.7 ms, consistent with dense full
    # 230 ms + 12.2 ms shallow).  Quality at the real 24-block depth
    # (3 seeds): @30 rel_mse 0.00165 — 6x under the reference classifier
    # bar (0.01, cache_manager.py:101-191); the curve is flat through the
    # ladder (@16 0.0008, @20 0.00056, @24 0.00077,
    # exp/cache_quality_sd3_span{wide,long}_tiny.json); every gated combo
    # (compact rows, fine tokens) is dominated by the pure dense span on
    # both axes — the @6+compact cliff was CFG-row alternation in
    # gate_compact, not span staleness.  Conservative points:
    # BENCH_SD3_DEEP_INTERVAL=16 = 26.7 ms (2.43x) at 0.0008;
    # =12 = 33.6 ms (1.93x) at 0.00053.  Decision rule:
    # docs/DESIGN.md "Cache default adjudication".
    # BENCH_SD3_DEEP= (empty) reverts to dense; the old combo remains
    # BENCH_SD3_DEEP=2:24 BENCH_SD3_DEEP_INTERVAL=3 BENCH_SD3_CACHE=0.5.
    deep_env = os.environ.get("BENCH_SD3_DEEP", "1:24")
    deep_span = (tuple(int(v) for v in deep_env.split(":"))
                 if deep_env else None)
    if deep_span is not None:
        # Clamp the default span to the model depth (TINY_MMDIT smoke runs
        # have 2 blocks); an empty clamped span = dense.
        lo, hi = deep_span
        hi = min(hi, model.cfg.num_layers)
        deep_span = (lo, hi) if lo < hi else None
    frac = float(os.environ.get("BENCH_SD3_CACHE", "0"))
    fine = float(os.environ.get("BENCH_SD3_FINE", "0"))
    stale_kv = (fine > 0
                and os.environ.get("BENCH_SD3_FINE_STALE_KV", "0") == "1")
    deep_interval = int(os.environ.get("BENCH_SD3_DEEP_INTERVAL", "30"))
    deep_adaptive = float(os.environ.get("BENCH_SD3_DEEP_ADAPTIVE", "0"))
    deep_cap = int(os.environ.get("BENCH_SD3_DEEP_CAP", "6"))
    prime = None
    use_cache = frac > 0 or fine > 0
    cache = None
    seq = (hw // 2) ** 2
    if deep_span is not None and stale_kv:
        raise SystemExit("BENCH_SD3_DEEP does not compose with "
                         "BENCH_SD3_FINE_STALE_KV (stale-KV lost on chip, "
                         "exp/bench_sd3_v5e_r2n_fine_stale.json)")
    if use_cache:
        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        cache = BlockCache(CacheConfig(
            enabled=True, mode="compact",
            compact_fraction=frac if frac > 0 else 1.0,
            patch_fraction=fine if fine > 0 else 1.0,
            fine_stale_kv=stale_kv,
            max_hits=4))
        layout = model.token_cache_layout(seq)

        def mk_state0():
            """Initial cache state, built INSIDE the jit trace: the zeros
            lower to XLA broadcasts.  Built eagerly (outside) they were
            captured as 5.1 GB of lowered CONSTANTS — the remote_compile
            payload broke the relay pipe (r2n legs 1-2)."""
            if fine > 0:
                dual = set(model.cfg.dual_attention_layers)

                def kv_pairs(key):
                    if not stale_kv:
                        return 0
                    return 2 if int(key.removeprefix("block")) in dual else 1

                return {key: cache.init_token_rows_fine(
                            key, 2 * b, s, d, jnp.bfloat16,
                            kv_pairs=kv_pairs(key))
                        for key, (s, d) in layout.items()}
            return {key: cache.init_token_rows(key, 2 * b, s, d,
                                               jnp.bfloat16, ctx_seq=ctx_len)
                    for key, (s, d) in layout.items()}
    else:
        def mk_state0():
            return None

    mask0 = jnp.ones((2 * b, seq), bool)

    def mk_deep0():
        """Zero deep state (built in-trace); step 0 is always FULL under
        i % interval == 0, so the zeros are never consumed."""
        if deep_span is None:
            return None
        d = {"dx": jnp.zeros((2 * b, seq, model.cfg.dim), jnp.bfloat16)}
        if deep_span[1] < model.cfg.num_layers:
            d["c"] = jnp.zeros((2 * b, ctx_len, model.cfg.dim), jnp.bfloat16)
        return d

    def make_step(deep_mode, kv_flag, params):
        # params is threaded EXPLICITLY: resolved from main()'s scope it
        # is a concrete 5.1 GB pytree and lowers as jit constants (the
        # r2n cached legs broke the relay compile that way)
        def step(i, x, st, dp):
            c0 = jnp.full((b,), cs[i, 0])
            c1 = jnp.full((b,), cs[i, 1])
            t2 = jnp.full((2 * b,), ts[i], jnp.float32)
            x2 = sampler.scale_model_input(
                jnp.concatenate([x, x]), jnp.concatenate([c0, c0]))
            kw = ({} if deep_mode is None else
                  dict(deep_mode=deep_mode, deep_span=deep_span,
                       deep_state=dp))
            if use_cache:
                toks = model.embed_latents(params, x2)
                res = model.apply_tokens(params, toks, mask0, t2, ehs,
                                         pooled, cache=cache, cache_state=st,
                                         fine_kv_stale=kv_flag, **kw)
                if deep_mode is not None:
                    out, st, dp = res
                else:
                    out, st = res
                out = model.unpatchify(out, hw // 2, hw // 2)
            else:
                res = model.apply(params, x2, t2, ehs, pooled, **kw)
                if deep_mode is not None:
                    out, dp = res
                else:
                    out = res
            u, c = jnp.split(out, 2)
            v = u + g.reshape(-1, 1, 1, 1) * (c - u)
            return sampler.step(x, v.astype(x.dtype), c0, c1), st, dp

        return step

    def make_body(kv_flag, params, itv=None):
        if deep_span is not None:
            full_s = make_step("full", kv_flag, params)
            sh_s = make_step("shallow", kv_flag, params)

            if deep_adaptive > 0:
                # carry: (x, st, dp, lat_ref, age, n_full); full when the
                # latent's rel-MSE vs the last full step's input exceeds the
                # threshold (or the cap elapses)
                def body(i, carry):
                    x, st, dp, lat_ref, age, n_full = carry
                    drift = (jnp.mean((x - lat_ref) ** 2)
                             / (jnp.mean(lat_ref**2) + 1e-12))
                    full = (i == 0) | (age >= deep_cap - 1) | \
                        (drift > deep_adaptive)
                    x2, st2, dp2 = jax.lax.cond(
                        full, lambda a: full_s(i, *a),
                        lambda a: sh_s(i, *a), (x, st, dp))
                    lat_ref = jnp.where(full, x, lat_ref)
                    age = jnp.where(full, 0, age + 1)
                    return (x2, st2, dp2, lat_ref, age,
                            n_full + full.astype(jnp.int32))
            else:
                # itv is a TRACED scalar (threaded through run's signature)
                # so every interval in a ladder shares one compiled program
                # — a relay recompile is 15-25 min per leg otherwise
                def body(i, carry):
                    return jax.lax.cond(i % itv == 0,
                                        lambda a: full_s(i, *a),
                                        lambda a: sh_s(i, *a),
                                        carry)
        else:
            plain = make_step(None, kv_flag, params)

            def body(i, carry):
                return plain(i, *carry)

        return body

    if stale_kv:
        @jax.jit
        def prime(params, lat, g, ehs, pooled):
            return make_body(False, params, jnp.int32(deep_interval))(
                0, (lat, mk_state0(), mk_deep0()))

        @jax.jit
        def run(params, carry0, g, ehs, pooled, itv):
            x, _, _ = jax.lax.fori_loop(
                1, n_steps, make_body(True, params, itv), carry0)
            return x
    else:
        adaptive = deep_span is not None and deep_adaptive > 0

        @jax.jit
        def run(params, lat, g, ehs, pooled, itv):
            carry0 = (lat, mk_state0(), mk_deep0())
            if adaptive:
                carry0 += (jnp.zeros_like(lat), jnp.int32(0), jnp.int32(0))
            carry = jax.lax.fori_loop(
                0, n_steps, make_body(False, params, itv), carry0)
            if adaptive:
                return carry[0], carry[5]
            return carry[0]

    if prime is not None:
        arg0 = prime(params, lat, g, ehs, pooled)  # sync step, untimed
        denom = n_steps - 1
    else:
        arg0 = lat
        denom = n_steps

    def force(out):
        if isinstance(out, tuple):
            np.asarray(out[0])
            return out
        np.asarray(out)
        return out

    # untimed warmup forces arg0 AND compiles run, so timed repeats measure
    # only the steady (stale) steps
    itv = jnp.int32(deep_interval)
    out = force(run(params, arg0, g, ehs, pooled, itv))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = force(run(params, arg0, g, ehs, pooled, itv))
        best = min(best, time.perf_counter() - t0)
    ms = best / denom * 1e3
    n_full = int(np.asarray(out[1])) if isinstance(out, tuple) else None
    print(json.dumps({
        "metric": "SD3.5-medium 1024^2 CFG step latency",
        "batch": b, "ms_per_step": round(ms, 1),
        "compact_cache_fraction": frac,
        "token_fine_fraction": fine,
        "fine_stale_kv": stale_kv,
        "deep_span": list(deep_span) if deep_span else None,
        "deep_interval": (None if deep_span is None or deep_adaptive > 0
                          else deep_interval),
        "deep_adaptive_threshold": deep_adaptive or None,
        "n_full": n_full, "n_steps": n_steps,
        "h100_anchor_ms": 65.0,
        "vs_anchor": round(65.0 / ms * b, 3),
    }))


if __name__ == "__main__":
    main()
