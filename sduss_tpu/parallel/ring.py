"""Ring attention: exact sequence-parallel attention over ICI.

The reference has no CP/ring/Ulysses machinery (SURVEY.md section 2.9); its
inter-GPU sequence axis is DistriFuser's displaced patch parallelism with
STALE all-gathered KV (distrifuser modules/pp/attn.py:110-200).  This module
adds the exact TPU-native alternative (SURVEY.md section 5 long-context):
KV shards rotate around the mesh ring via ``lax.ppermute`` while each chip
accumulates its queries' partial attention with online-softmax statistics —
communication overlaps compute, no staleness, O(seq/n) peak memory.

Designed to run INSIDE ``shard_map`` with the sequence axis sharded on
``axis_name``; `sduss_tpu.parallel.displaced.MMDiTShardContext` uses it when
``kv_mode="ring"``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def _partial_dense(q, k, v, num_heads: int, scale: float):
    """Local-block attention returning UNNORMALIZED stats.

    q (B, Lq, D_model); k/v (B, Lk_local, D_model).
    Returns o_hat (B, Lq, D_model) = sum_j p_ij v_j with p = exp(s - m),
    m (B, H, Lq) row max, l (B, H, Lq) = sum_j p_ij.
    """
    b, lq, dm = q.shape
    lk = k.shape[1]
    hd = dm // num_heads
    qh = q.reshape(b, lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1)                                # (B,H,Lq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)                                # (B,H,Lq)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), vh,
                   preferred_element_type=jnp.float32)     # unnormalized
    return o, m, l


def _merge(o1, m1, l1, o2, m2, l2):
    """Online-softmax merge of two UNNORMALIZED partials."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)[..., None]
    a2 = jnp.exp(m2 - m)[..., None]
    o = o1 * a1 + o2 * a2
    l = l1 * jnp.exp(m1 - m) + l2 * jnp.exp(m2 - m)
    return o, m, l


def finalize_partial(o, m, l, dtype):
    """Normalize an unnormalized partial -> (B, Lq, D_model)."""
    inv = jnp.where(l == 0.0, 1.0, 1.0 / l)[..., None]     # (B,H,Lq,1)
    out = (o * inv).astype(dtype)                           # (B,H,Lq,hd)
    b_, h, lq, hd = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b_, lq, h * hd)


def combine_partials(o1, m1, l1, o2, m2, l2, dtype):
    """Merge two unnormalized partials and normalize."""
    o, m, l = _merge(o1, m1, l1, o2, m2, l2)
    return finalize_partial(o, m, l, dtype)


def ring_attention(q, k, v, num_heads: int, axis_name: str,
                   scale: Optional[float] = None, return_stats: bool = False):
    """Exact MHA with KV sharded on ``axis_name`` (call inside shard_map).

    Each device holds q for its own sequence shard and the KV shard it
    started with; after n-1 ``ppermute`` rotations every device has attended
    to the full sequence.  Online-softmax combine keeps the result exact.
    With ``return_stats`` the UNNORMALIZED (o, m, l) partials are returned so
    the caller can fold in extra local keys (e.g. replicated text context)
    before normalizing.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1] // num_heads)
    n = jax.lax.axis_size(axis_name)  # static mesh-axis size
    perm = [(i, (i + 1) % n) for i in range(n)]

    o, m, l = _partial_dense(q, k, v, num_heads, scale)
    for _ in range(n - 1):
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        o2, m2, l2 = _partial_dense(q, k, v, num_heads, scale)
        o, m, l = _merge(o, m, l, o2, m2, l2)

    if return_stats:
        return o, m, l
    return finalize_partial(o, m, l, q.dtype)
