"""Displaced patch parallelism tests on the virtual 8-device CPU mesh.

Checks the reference DistriFuser rebuild (sduss_tpu/parallel/displaced.py):
sync mode is EXACT vs the unsharded forward; stale (displaced) mode stays
close after warmup (activation drift per diffusion step is small — the
property the reference exploits, distrifuser pp/attn.py:110-200).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sduss_tpu.models.unet import TINY_UNET, UNet2DConditionModel
from sduss_tpu.parallel.displaced import DisplacedPatchRunner, ShardContext
from sduss_tpu.parallel.mesh import make_mesh
from sduss_tpu.samplers import get_sampler


@pytest.fixture(scope="module")
def setup():
    unet = UNet2DConditionModel(TINY_UNET)
    params = unet.init(jax.random.key(0))
    b, h = 1, 32
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((b, h, h, 4)), jnp.float32)
    ehs = jnp.asarray(rng.standard_normal((2 * b, 7, 32)), jnp.float32)

    def model_fn(params, x_in, t2, ctx):
        return unet.apply(params, x_in, t2, ehs, ctx=ctx)

    return unet, params, latents, model_fn


class TestDisplaced:
    def test_sync_mode_matches_dense(self, setup):
        unet, params, latents, model_fn = setup
        mesh = make_mesh(sp=8)
        sampler = get_sampler("euler")
        runner = DisplacedPatchRunner(model_fn, mesh, sampler, warmup_steps=10**9)
        table = sampler.make_table(3)
        out_sharded = np.asarray(
            runner.denoise(params, latents, table, guidance=5.0), np.float32)

        # dense reference trajectory
        table2 = sampler.make_table(3)
        lat = latents
        for _ in range(3):
            c0 = jnp.full((1,), float(table2.coeffs[table2.step, 0]))
            c1 = jnp.full((1,), float(table2.coeffs[table2.step, 1]))
            t2 = jnp.full((2,), table2.current_timestep(), jnp.float32)
            x_in = sampler.scale_model_input(
                jnp.concatenate([lat, lat]), jnp.concatenate([c0, c0]))
            out = model_fn(params, x_in, t2, None)
            u, c = jnp.split(out, 2)
            eps = u + 5.0 * (c - u)
            lat = sampler.step(lat, eps, c0, c1)
            table2.advance()
        np.testing.assert_allclose(out_sharded, np.asarray(lat, np.float32),
                                   atol=2e-4, rtol=2e-3)

    def test_displaced_mode_close_after_warmup(self, setup):
        unet, params, latents, model_fn = setup
        mesh = make_mesh(sp=4)
        sampler = get_sampler("euler")

        table_sync = sampler.make_table(6)
        sync_runner = DisplacedPatchRunner(model_fn, mesh, sampler,
                                           warmup_steps=10**9)
        ref = np.asarray(sync_runner.denoise(params, latents, table_sync, 5.0),
                         np.float32)

        table = sampler.make_table(6)
        runner = DisplacedPatchRunner(model_fn, mesh, sampler, warmup_steps=2)
        out = np.asarray(runner.denoise(params, latents, table, 5.0), np.float32)

        assert np.isfinite(out).all()
        # displaced result tracks the exact trajectory (loose tolerance: the
        # staleness error is bounded by per-step activation drift)
        err = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-6)
        assert err < 0.35, f"relative drift too large: {err}"

    def test_group_norm_exact_across_shards(self):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from sduss_tpu.models import layers as L

        mesh = make_mesh(sp=8)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 16, 8, 8)), jnp.float32)
        p = {"scale": jnp.asarray(rng.standard_normal(8), jnp.float32),
             "bias": jnp.asarray(rng.standard_normal(8), jnp.float32)}

        def local(p, x):
            ctx = ShardContext()
            return ctx.group_norm(p, x, groups=4, eps=1e-5, act="silu", lvl=0)

        fn = shard_map(local, mesh=mesh,
                       in_specs=(P(), P(None, "sp", None, None)),
                       out_specs=P(None, "sp", None, None))
        got = np.asarray(fn(p, x))
        want = np.asarray(L.group_norm(p, x, num_groups=4, eps=1e-5, act="silu"))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_conv_halo_exact(self):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from sduss_tpu.models import layers as L

        mesh = make_mesh(sp=8)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 32, 8, 4)), jnp.float32)
        p = {"kernel": jnp.asarray(rng.standard_normal((3, 3, 4, 6)) * 0.1,
                                   jnp.float32),
             "bias": jnp.zeros((6,), jnp.float32)}

        for stride in (1, 2):
            def local(p, x, stride=stride):
                return ShardContext().conv(p, x, lvl=0, stride=stride)

            fn = shard_map(local, mesh=mesh,
                           in_specs=(P(), P(None, "sp", None, None)),
                           out_specs=P(None, "sp", None, None))
            got = np.asarray(fn(p, x))
            want = np.asarray(L.conv2d(p, x, stride=stride))
            np.testing.assert_allclose(got, want, atol=1e-5,
                                       err_msg=f"stride={stride}")


class TestDisplacedSD3:
    @pytest.fixture(scope="class")
    def sd3_setup(self):
        from sduss_tpu.models.mmdit import TINY_MMDIT, SD3Transformer2DModel

        model = SD3Transformer2DModel(TINY_MMDIT)
        params = model.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        b, h = 1, 16
        latents = jnp.asarray(rng.standard_normal((b, h, h, 4)), jnp.float32)
        ehs = jnp.asarray(rng.standard_normal((2 * b, 9, 32)), jnp.float32)
        pooled = jnp.asarray(rng.standard_normal((2 * b, 32)), jnp.float32)

        def model_fn(params, x_in, t2, ctx):
            return model.apply(params, x_in, t2, ehs, pooled, ctx=ctx)

        return model, params, latents, model_fn

    def test_sd3_sync_matches_dense(self, sd3_setup):
        from sduss_tpu.parallel.displaced import (DisplacedPatchRunner,
                                                  MMDiTShardContext)

        model, params, latents, model_fn = sd3_setup
        mesh = make_mesh(sp=4)
        sampler = get_sampler("flow_match")
        runner = DisplacedPatchRunner(model_fn, mesh, sampler,
                                      warmup_steps=10**9,
                                      ctx_cls=MMDiTShardContext)
        table = sampler.make_table(3)
        got = np.asarray(runner.denoise(params, latents, table, 4.5),
                         np.float32)

        table2 = sampler.make_table(3)
        lat = latents
        for _ in range(3):
            c0 = jnp.full((1,), float(table2.coeffs[table2.step, 0]))
            c1 = jnp.full((1,), float(table2.coeffs[table2.step, 1]))
            t2 = jnp.full((2,), table2.current_timestep(), jnp.float32)
            out = model_fn(params, jnp.concatenate([lat, lat]), t2, None)
            u, c = jnp.split(out, 2)
            eps = u + 4.5 * (c - u)
            lat = sampler.step(lat, eps, c0, c1)
            table2.advance()
        np.testing.assert_allclose(got, np.asarray(lat, np.float32),
                                   atol=2e-4, rtol=2e-3)

    def _fine_setup(self, sd3_setup, fraction):
        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        model, params, latents, model_fn = sd3_setup
        # mirror the fixture's rng stream (latents drawn first there)
        rng = np.random.default_rng(0)
        b, h = 1, 16
        rng.standard_normal((b, h, h, 4))
        ehs = jnp.asarray(rng.standard_normal((2 * b, 9, 32)), jnp.float32)
        pooled = jnp.asarray(rng.standard_normal((2 * b, 32)), jnp.float32)
        cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                       patch_fraction=fraction, max_hits=2))

        def cached_fn(params, x_in, t2, ctx, cache_state):
            return model.apply(params, x_in, t2, ehs, pooled, ctx=ctx,
                               cache=cache, cache_state=cache_state)

        seq = (h // 2) * (h // 2)
        state0 = {f"block{i}": cache.init_token_rows_fine(
                      f"block{i}", 2 * b, seq, model.cfg.dim, jnp.float32)
                  for i in range(model.cfg.num_layers)}
        return cached_fn, state0

    def test_sd3_fine_cache_composes_with_displaced_exact(self, sd3_setup):
        """Per-token fine gate x displaced-SP, sync mode, fraction ~1.0
        (every local token selected): EXACTLY the uncached sync run — the
        gated-query path must not change the KV exchange or the math
        (docs/DESIGN.md 'the compact gate runs per shard')."""
        from sduss_tpu.parallel.displaced import (DisplacedPatchRunner,
                                                  MMDiTShardContext)

        model, params, latents, model_fn = sd3_setup
        mesh = make_mesh(sp=4)
        sampler = get_sampler("flow_match")
        ref = np.asarray(
            DisplacedPatchRunner(model_fn, mesh, sampler,
                                 warmup_steps=10**9,
                                 ctx_cls=MMDiTShardContext)
            .denoise(params, latents, sampler.make_table(3), 4.5),
            np.float32)

        cached_fn, state0 = self._fine_setup(sd3_setup, fraction=0.9999)
        runner = DisplacedPatchRunner(cached_fn, mesh, sampler,
                                      warmup_steps=10**9,
                                      ctx_cls=MMDiTShardContext)
        got, state = runner.denoise(params, latents, sampler.make_table(3),
                                    4.5, cache_state=state0)
        np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                                   atol=2e-4, rtol=2e-3)
        # all tokens recomputed every step -> hits pinned at 0
        assert int(np.asarray(state["block0"]["hits"]).max()) == 0

    def test_sd3_fine_cache_displaced_partial_fraction(self, sd3_setup):
        """fraction 0.5 per shard, displaced mode: finite output, per-shard
        top-k state updates (some tokens recomputed, some aging)."""
        from sduss_tpu.parallel.displaced import (DisplacedPatchRunner,
                                                  MMDiTShardContext)

        model, params, latents, model_fn = sd3_setup
        mesh = make_mesh(sp=4)
        sampler = get_sampler("flow_match")
        ref = np.asarray(
            DisplacedPatchRunner(model_fn, mesh, sampler,
                                 warmup_steps=10**9,
                                 ctx_cls=MMDiTShardContext)
            .denoise(params, latents, sampler.make_table(4), 4.5),
            np.float32)
        cached_fn, state0 = self._fine_setup(sd3_setup, fraction=0.5)
        runner = DisplacedPatchRunner(cached_fn, mesh, sampler,
                                      warmup_steps=2,
                                      ctx_cls=MMDiTShardContext)
        got, state = runner.denoise(params, latents, sampler.make_table(4),
                                    4.5, cache_state=state0)
        got = np.asarray(got, np.float32)
        assert np.isfinite(got).all()
        hits = np.asarray(state["block1"]["hits"])
        assert hits.min() == 0 and hits.max() > 0  # top-k really gated
        err = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-6)
        assert err < 0.6, f"fine x displaced drifted too far: {err}"

    def test_sd3_displaced_close_after_warmup(self, sd3_setup):
        from sduss_tpu.parallel.displaced import (DisplacedPatchRunner,
                                                  MMDiTShardContext)

        model, params, latents, model_fn = sd3_setup
        mesh = make_mesh(sp=4)
        sampler = get_sampler("flow_match")

        sync = DisplacedPatchRunner(model_fn, mesh, sampler,
                                    warmup_steps=10**9,
                                    ctx_cls=MMDiTShardContext)
        ref = np.asarray(sync.denoise(params, latents, sampler.make_table(6),
                                      4.5), np.float32)
        disp = DisplacedPatchRunner(model_fn, mesh, sampler, warmup_steps=2,
                                    ctx_cls=MMDiTShardContext)
        out = np.asarray(disp.denoise(params, latents, sampler.make_table(6),
                                      4.5), np.float32)
        assert np.isfinite(out).all()
        err = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-6)
        assert err < 0.35, f"relative drift too large: {err}"
