"""Ring attention (exact sequence-parallel) vs dense reference on the CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from sduss_tpu.ops.attention import _dense_masked
from sduss_tpu.parallel.ring import ring_attention


def _mesh(n=4, name="sp"):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, (name,))


def test_ring_matches_dense():
    heads, dm, b, s = 2, 128, 2, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    scale = 1.0 / math.sqrt(dm // heads)
    ref = _dense_masked(q, k, v, heads, None, scale)

    mesh = _mesh(4)
    fn = shard_map(
        lambda q, k, v: ring_attention(q, k, v, heads, "sp"),
        mesh=mesh,
        in_specs=(P(None, "sp", None),) * 3,
        out_specs=P(None, "sp", None),
    )
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_stats_with_extra_context_block():
    """Ring over the latent shard + one local combine for replicated context
    == dense over the concatenated sequence (the MMDiTShardContext path)."""
    from sduss_tpu.parallel.ring import (_partial_dense, combine_partials,
                                         ring_attention)

    heads, dm, b, s_lat, s_ctx = 2, 128, 1, 64, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, s_lat, dm)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s_lat, dm)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s_lat, dm)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, s_ctx, dm)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, s_ctx, dm)), jnp.float32)
    scale = 1.0 / math.sqrt(dm // heads)
    ref = _dense_masked(q, jnp.concatenate([k, kc], 1),
                        jnp.concatenate([v, vc], 1), heads, None, scale)

    mesh = _mesh(4)

    def local(q, k, v, kc, vc):
        o1, m1, l1 = ring_attention(q, k, v, heads, "sp", return_stats=True)
        o2, m2, l2 = _partial_dense(q, kc, vc, heads, scale)
        return combine_partials(o1, m1, l1, o2, m2, l2, q.dtype)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "sp", None), P(None, "sp", None), P(None, "sp", None),
                  P(None, None, None), P(None, None, None)),
        out_specs=P(None, "sp", None),
    )
    out = fn(q, k, v, kc, vc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_mmdit_shard_ctx_ring_mode():
    """MMDiTShardContext(kv_mode='ring') == gather mode on a joint sequence."""
    from sduss_tpu.parallel.displaced import MMDiTShardContext

    heads, hd, b, s_lat, s_ctx = 2, 32, 1, 32, 8
    dm = heads * hd
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, s_lat + s_ctx, heads, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s_lat + s_ctx, heads, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s_lat + s_ctx, heads, hd)), jnp.float32)

    mesh = _mesh(4)
    outs = {}
    for mode in ("gather", "ring"):
        def local(q, k, v, mode=mode):
            # per-shard joint sequence: local latent rows + full context
            ctx = MMDiTShardContext(axis="sp", stale=False, kv_mode=mode)
            return ctx.mmdit_attention(q, k, v, s_lat // 4)

        def split(x):
            # build the per-shard joint layout: shard latents, replicate ctx
            lat, c = x[:, :s_lat], x[:, s_lat:]
            return lat, c

        qs, qc = split(q)
        ks, kc = split(k)
        vs, vc = split(v)

        def wrapped(qs, qc, ks, kc, vs, vc, mode=mode):
            qj = jnp.concatenate([qs, qc], axis=1)
            kj = jnp.concatenate([ks, kc], axis=1)
            vj = jnp.concatenate([vs, vc], axis=1)
            ctx = MMDiTShardContext(axis="sp", stale=False, kv_mode=mode)
            return ctx.mmdit_attention(qj, kj, vj, qs.shape[1])

        fn = shard_map(
            wrapped, mesh=mesh,
            in_specs=(P(None, "sp"), P(None,), P(None, "sp"), P(None,),
                      P(None, "sp"), P(None,)),
            out_specs=P(None, "sp", None),
        )
        outs[mode] = np.asarray(fn(qs, qc, ks, kc, vs, vc))
    np.testing.assert_allclose(outs["ring"], outs["gather"],
                               atol=2e-5, rtol=2e-5)


def test_mmdit_shard_ctx_ring_gated_queries():
    """Ring mode with GATED queries (per-token fine cache): query length
    diverges from key length, so the context-KV reshape must use the KEY
    count — the query-length form crashed ('cannot reshape (1, s_ctx, ...)
    into (1, q_len - s_lat, ...)')."""
    from sduss_tpu.parallel.displaced import MMDiTShardContext

    heads, hd, b, s_lat, s_ctx, k_t = 2, 32, 1, 32, 8, 3
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, s_lat + s_ctx, heads, hd)),
                    jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s_lat + s_ctx, heads, hd)),
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s_lat + s_ctx, heads, hd)),
                    jnp.float32)
    mesh = _mesh(4)
    outs = {}
    for mode in ("gather", "ring"):
        def wrapped(qs, qc, ks, kc, vs, vc, mode=mode):
            # gate local latent queries to k_t rows; keys stay full
            qj = jnp.concatenate([qs[:, :k_t], qc], axis=1)
            kj = jnp.concatenate([ks, kc], axis=1)
            vj = jnp.concatenate([vs, vc], axis=1)
            ctx = MMDiTShardContext(axis="sp", stale=False, kv_mode=mode)
            return ctx.mmdit_attention(qj, kj, vj, ks.shape[1])

        fn = shard_map(
            wrapped, mesh=mesh,
            in_specs=(P(None, "sp"), P(None,), P(None, "sp"), P(None,),
                      P(None, "sp"), P(None,)),
            out_specs=P(None, "sp", None),
        )
        outs[mode] = np.asarray(fn(
            q[:, :s_lat], q[:, s_lat:], k[:, :s_lat], k[:, s_lat:],
            v[:, :s_lat], v[:, s_lat:]))
    np.testing.assert_allclose(outs["ring"], outs["gather"],
                               atol=2e-5, rtol=2e-5)
