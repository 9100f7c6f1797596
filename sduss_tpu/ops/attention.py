"""Attention backends for the patch pipeline.

* ``masked_attention`` — batched MHA with an optional key-validity mask,
  replacing the reference's per-image xformers regrouping
  (sduss/model_executor/modules/attention.py:112-232).
* On TPU with long sequences it dispatches to the Pallas flash-attention
  kernel (jax.experimental.pallas.ops.tpu.flash_attention) using segment IDs
  to express the padded-slot mask; elsewhere (CPU tests, short sequences) it
  runs the plain XLA einsum path.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

# Sequence length above which the flash kernel pays off (and dense logits
# would start to dominate HBM).
_FLASH_MIN_SEQ = 1024


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    import os

    # The custom kernel (ops/flash.py) is the TPU default for long
    # sequences: XLA dense attention is HBM-bound on f32 logits and the
    # stock Pallas kernel is grid-overhead-bound at diffusion shapes (both
    # measured ~15x off matmul-bound at SD3's S=4480/d=64 on v5e).
    # SDUSS_DISABLE_FLASH=1 kills it everywhere (dense fallback);
    # SDUSS_STOCK_FLASH=1 swaps in the generic jax.experimental kernel for
    # A/B comparison.
    if os.environ.get("SDUSS_DISABLE_FLASH") == "1":
        return False
    return jax.default_backend() == "tpu"


def _dense_masked(q, k, v, num_heads: int, kv_token_mask, scale: float):
    b, lq, d = q.shape
    lk = k.shape[1]
    hd = d // num_heads
    qh = q.reshape(b, lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32,
                        precision=None) * scale
    if kv_token_mask is not None:
        logits = jnp.where(kv_token_mask[:, None, None, :], logits,
                           jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh, preferred_element_type=jnp.float32,
                     precision=None).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, d)


def _flash_masked(q, k, v, num_heads: int, kv_token_mask, scale: float):
    import os

    if os.environ.get("SDUSS_STOCK_FLASH") != "1":
        from sduss_tpu.ops.flash import flash_mha

        return flash_mha(q, k, v, num_heads, scale, kv_mask=kv_token_mask)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    b, lq, d = q.shape
    lk = k.shape[1]
    hd = d // num_heads
    qh = q.reshape(b, lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    segment_ids = None
    if kv_token_mask is not None:
        # Real tokens segment 1, padded slots segment 0 on the kv side; all
        # queries segment 1 => padded keys are excluded everywhere.
        kv_seg = kv_token_mask.astype(jnp.int32)
        q_seg = jnp.ones((b, lq), jnp.int32)
        segment_ids = SegmentIds(q=q_seg, kv=kv_seg)
    out = flash_attention(qh, kh, vh, segment_ids=segment_ids, sm_scale=scale)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, d)


def masked_attention(q, k, v, num_heads: int, kv_token_mask=None,
                     scale: Optional[float] = None, prefer_flash: bool = False):
    """MHA over (B, L, D) with optional (B, Lk) boolean key mask.

    ``prefer_flash``: use the flash kernel whenever shapes allow (callers
    whose dense logits would not fit HBM, e.g. grouped patch attention).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1] // num_heads)
    lq = q.shape[1]
    # The custom kernel (ops/flash.py) wins at every measured in-model shape
    # except one isolated case (S=4096, BH=160: XLA's own fusion hit 69 TF/s
    # vs the kernel's 53 in a microbenchmark) — but XLA's attention fusion
    # is unreliable inside larger programs (at SD3 b4 it materialized the
    # f32[8,24,4096,4096] logits, 12 GB -> OOM), so dense is NEVER routed
    # for long sequences, regardless of KV size: flash_mha picks its own
    # VMEM strategy (two-pass under its score-tile budget, online-softmax
    # beyond), and a Mosaic compile error at an absurd KV is strictly
    # better than silently materializing O(S^2) f32 logits in HBM.
    # Short-KV attention (cross-attention over 77 text tokens) is
    # overhead-bound in the kernel's per-(head, q-tile) grid — dense XLA is
    # faster there; the kernel needs a long KV axis to amortize.
    # ``prefer_flash`` (grouped patch attention) asks that dense logits
    # never be materialized at HBM-dangerous sizes — satisfied here for ALL
    # callers, since every long sequence routes to the kernel; below the
    # minimums dense logits are small by construction, and the measured
    # routing (profiles fitted with it) keeps those shapes dense.
    if _flash_available() and lq >= _FLASH_MIN_SEQ and k.shape[1] >= 512:
        import os

        # Model-layout fused variant (no Q/K/V/O head transposes) is the
        # DEFAULT for the aligned unmasked case at SDXL/SD1.5 scales:
        # measured 1.15x at l2, tie at l1, +10.2% on the cache-off SDXL
        # full step (0.2921 -> 0.3218 img/s; exp/bench_fused_attn_v5e.json).
        # Gate on the whole-row K size: the kernel holds full-D K/V rows
        # plus f32 scores in VMEM, and at SD3's (4096, 1536) dual shape the
        # real demand was 115 MB (>100 MB scoped limit -> compile OOM in
        # the full model), so SD3-scale rows stay on the head-transposed
        # kernel.  SDUSS_FUSED_ATTN=0 reverts everywhere.
        k_row_bytes = k.shape[1] * q.shape[-1] * 2
        if os.environ.get("SDUSS_FUSED_ATTN") != "0" \
                and kv_token_mask is None and k_row_bytes <= 6 * 2**20:
            from sduss_tpu.ops.flash import flash_mha_fused

            return flash_mha_fused(q, k, v, num_heads, scale)
        return _flash_masked(q, k, v, num_heads, kv_token_mask, scale)
    # Short-KV cross-attention (77 text tokens) stays DENSE: the measured
    # XLA path is ~60% of its bandwidth floor, and both the flash grid and
    # a dedicated no-transpose kernel (ops/flash.py flash_cross_short) came
    # in 0.8-0.9x of dense on chip (exp/bench_cross_kernel_v5e.json) — the
    # per-head small matmuls don't amortize.
    return _dense_masked(q, k, v, num_heads, kv_token_mask, scale)
