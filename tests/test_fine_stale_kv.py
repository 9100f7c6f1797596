"""Stale-KV splice for the per-token fine cache (CacheConfig.fine_stale_kv).

Motivated on chip: the SD3 compact/fine step saturates ~118 ms at ANY gate
fraction because to_k/to_v and the full-sequence norm/modulation passes
don't scale with the gate (exp/bench_sd3_v5e_r2_compact35.json).  With
fine_stale_kv, unselected tokens splice the previous step's K/V rows —
DistriFuser's displaced staleness (reference distrifuser/modules/pp/attn.py
:110-200) applied temporally per token.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sduss_tpu.cache.manager import BlockCache
from sduss_tpu.config import CacheConfig
from sduss_tpu.models.mmdit import TINY_MMDIT, SD3Transformer2DModel


@pytest.fixture(scope="module")
def setup():
    model = SD3Transformer2DModel(TINY_MMDIT)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    b, hw = 2, 16
    lat = jnp.asarray(rng.standard_normal((b, hw, hw, 4)), jnp.float32)
    ehs = jnp.asarray(rng.standard_normal((b, 9, 32)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((b, 32)), jnp.float32)
    return model, params, lat, ehs, pooled


def _state0(model, cache, b, seq, kv=True):
    dual = set(model.cfg.dual_attention_layers)

    def pairs(i):
        if not kv:
            return 0
        return 2 if i in dual else 1

    return {f"block{i}": cache.init_token_rows_fine(
                f"block{i}", b, seq, model.cfg.dim, jnp.float32,
                kv_pairs=pairs(i))
            for i in range(model.cfg.num_layers)}


def _run(model, params, lat, ehs, pooled, *, fraction, stale_kv,
         steps=4):
    """Denoise-like trajectory threading the fine cache; first step always
    runs the sync program (full K/V), later steps the stale one."""
    cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                   patch_fraction=fraction,
                                   fine_stale_kv=stale_kv, max_hits=8))
    b, hw = lat.shape[0], lat.shape[1]
    seq = (hw // model.cfg.patch_size) ** 2
    st = _state0(model, cache, b, seq, kv=stale_kv)
    x = lat
    outs = []
    for i in range(steps):
        t = jnp.full((b,), 400.0 + 100.0 * i)
        kv_flag = stale_kv and i > 0
        out, st = model.apply(params, x, t, ehs, pooled, cache=cache,
                              cache_state=st, fine_kv_stale=kv_flag)
        x = x - 0.1 * out
        outs.append(np.asarray(x, np.float32))
    return outs, st


def _run_dense(model, params, lat, ehs, pooled, steps=4):
    b = lat.shape[0]
    x = lat
    outs = []
    for i in range(steps):
        t = jnp.full((b,), 400.0 + 100.0 * i)
        out = model.apply(params, x, t, ehs, pooled)
        x = x - 0.1 * out
        outs.append(np.asarray(x, np.float32))
    return outs


class TestFineStaleKV:
    def test_exact_at_full_fraction(self, setup):
        """Every token refreshed every step (k_t == seq at fraction 0.999,
        which still routes to the FINE path — 1.0 means request-granular
        compact) => the stale splice holds only fresh rows: trajectories
        match the dense path exactly."""
        model, params, lat, ehs, pooled = setup
        ref = _run_dense(model, params, lat, ehs, pooled)
        got, st = _run(model, params, lat, ehs, pooled, fraction=0.999,
                       stale_kv=True)
        for a, b_ in zip(ref, got):
            np.testing.assert_allclose(a, b_, rtol=2e-4, atol=2e-4)

    def test_sync_program_matches_plain_fine(self, setup):
        """With kv state but kv_stale=False (the sync program) the gated
        compute is EXACTLY the plain fine path (K/V computed full)."""
        model, params, lat, ehs, pooled = setup
        a, _ = _run(model, params, lat, ehs, pooled, fraction=0.5,
                    stale_kv=False)
        # plain fine (no kv in state at all)
        cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                       patch_fraction=0.5, max_hits=8))
        b, hw = lat.shape[0], lat.shape[1]
        seq = (hw // model.cfg.patch_size) ** 2
        st = _state0(model, cache, b, seq, kv=False)
        x = lat
        outs = []
        for i in range(4):
            t = jnp.full((b,), 400.0 + 100.0 * i)
            out, st = model.apply(params, x, t, ehs, pooled, cache=cache,
                                  cache_state=st)
            x = x - 0.1 * out
            outs.append(np.asarray(x, np.float32))
        for u, v in zip(a, outs):
            np.testing.assert_allclose(u, v, rtol=1e-5, atol=1e-5)

    def test_stale_close_to_plain_fine(self, setup):
        """Stale K/V at fraction 0.5 stays near the plain fine trajectory
        (the staleness error is bounded by the gate's own drift control)."""
        model, params, lat, ehs, pooled = setup
        a, sta = _run(model, params, lat, ehs, pooled, fraction=0.5,
                      stale_kv=True)
        b_, _ = _run(model, params, lat, ehs, pooled, fraction=0.5,
                     stale_kv=False)
        ref = np.asarray(b_[-1])
        err = float(np.mean((np.asarray(a[-1]) - ref) ** 2)
                    / (np.mean(ref ** 2) + 1e-8))
        assert np.isfinite(np.asarray(a[-1])).all()
        assert err < 0.05, err
        # KV rows were emitted and carried
        first = sta["block0"]
        assert {"k", "v", "k2", "v2"} <= set(first)
        assert float(jnp.abs(first["k"]).max()) > 0

    def test_state_structure_stable_for_jit_carry(self, setup):
        """sync and stale programs consume and emit the SAME state pytree
        structure (jit/fori_loop carry compatibility)."""
        model, params, lat, ehs, pooled = setup
        cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                       patch_fraction=0.5,
                                       fine_stale_kv=True, max_hits=8))
        b, hw = lat.shape[0], lat.shape[1]
        seq = (hw // model.cfg.patch_size) ** 2
        st0 = _state0(model, cache, b, seq, kv=True)
        t = jnp.full((b,), 500.0)
        _, st1 = model.apply(params, lat, t, ehs, pooled, cache=cache,
                             cache_state=st0, fine_kv_stale=False)
        _, st2 = model.apply(params, lat, t, ehs, pooled, cache=cache,
                             cache_state=st1, fine_kv_stale=True)
        assert (jax.tree_util.tree_structure(st0)
                == jax.tree_util.tree_structure(st1)
                == jax.tree_util.tree_structure(st2))


class TestFineStaleKVServing:
    def test_sd3_pipeline_serving(self):
        """Offline sd3 generation with fine_stale_kv mints the sync AND the
        stale trunk programs and produces finite images."""
        from sduss_tpu.config import Config, ModelConfig
        from sduss_tpu.entrypoints.offline import DiffusionPipeline

        c = Config()
        c.model = ModelConfig(model="sd3", test_tiny=True, dtype="float32")
        c.cache.enabled = True
        c.cache.mode = "compact"
        c.cache.patch_fraction = 0.5
        c.cache.fine_stale_kv = True
        pipe = DiffusionPipeline(config=c)
        outs = pipe.generate(["a"], resolution=256, num_inference_steps=3,
                             seed=4)
        assert np.isfinite(outs[0].image.astype(np.float32)).all()
        p = pipe.engine.workers[0].pipeline
        # the stale trunk may be minted by the background warm daemon
        # (warm-key routing serves dense until it lands) — join it first
        th = getattr(p, "_mixed_warm_thread", None)
        if th is not None:
            th.join(timeout=120)
        keys = [k for k in p._fns if isinstance(k, tuple)
                and k[0] == "sd3_mixed"]
        # trunk_key = ("sd3_mixed", s_pad, bb, has_cache, sync, kv_stale,
        # deep_mode) — kv_stale is slot 5 (the span-skip deep mode was
        # appended later and made k[-1] read deep_mode instead)
        stale_flags = {k[5] for k in keys}
        assert stale_flags == {False, True}
