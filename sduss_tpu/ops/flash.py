"""Shape-tuned Pallas flash attention for diffusion workloads.

Why a custom kernel: the diffusion attention shapes (SDXL: H=10/20, S=4096,
d=64; SD3.5-medium joint attention: H=24, S=4480, d=64) defeat both stock
paths on TPU:

* XLA dense attention materializes f32 logits in HBM (3.8 GB per SD3 op,
  ~19 GB of traffic with the multi-pass softmax) — measured 52 ms/op on v5e.
* The generic Pallas flash kernel
  (jax.experimental.pallas.ops.tpu.flash_attention) spends its time on grid
  overhead: at S=4608/d=64 its (batch, head, q, kv) grid is ~3.9k cells of
  ~0.5 us of MXU work each — measured 37 ms/op, ~15x off matmul-bound.

This kernel restructures the computation so per-cell work is large:

* grid = (B*H, S/q_block) only; the ENTIRE per-head K and V (S x 64 bf16,
  ~0.6 MB each at S=4608) are block-mapped into VMEM once per head and
  reused across q tiles (Pallas elides re-DMA when the block index is
  unchanged between consecutive cells).
* the kv loop runs INSIDE the kernel as a fori_loop with the online-softmax
  statistics (m, l, unnormalized acc) carried as values — no scratch
  semantics, no per-kv-tile grid cells.
* padding is handled statically: tiles entirely beyond ``kv_len`` are never
  executed, only the single ragged tile applies a mask, and normalization
  happens once at the end.

Replaces the reference's xformers attention calls
(sduss/model_executor/modules/attention.py:112-232) on the TPU hot path.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)
# Softmax in base 2: fold log2(e) into the query scale and use exp2 —
# exp lowers to exp2*mul on the VPU anyway, and d=64 attention is
# VPU-bound on v5e (the score tile is S_q x S_k while the matmuls only
# half-fill the 128-lane MXU at hd=64), so every elided VPU op counts.
_LOG2E = 1.4426950408889634


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _mha_kernel_2pass(bias_ref, q_ref, k_ref, v_ref, o_ref, *, hd: int,
                      nh: int, hb: int, pipe: bool = False):
    """One cell = one (batch*head, q_tile); full K/V resident in VMEM.

    Two-pass softmax instead of online: the whole (block_q, S) score tile
    fits in VMEM at diffusion sequence lengths, so one max pass + one exp
    beat the online variant's ~3x VPU traffic.  q arrives pre-scaled.

    The softmax normalizer rides the PV matmul for free: V is augmented
    outside with a ones column at index ``hd`` and lane-padded to 128 — the
    MXU processes 128 output lanes whether the payload is 64 or 128 wide, so
    ``p @ [V | 1]`` yields the output AND the row sums in one pass (this
    removed a row-sum matmul that cost as much as PV itself).
    ``bias_ref`` (B, S) f32 additive rows: 0 at real keys, -0.7*f32max at
    padding (precomputed outside; also carries runtime kv masks).  The full
    array rides in VMEM and the kernel picks its batch row — Mosaic rejects
    (1, S) blocks of a (B, S) array when B > 1 (sublane dim must divide 8 or
    equal the array's).

    ``pipe``: software-pipeline the unrolled heads — issue head h+1's QK
    matmul before head h's softmax so the MXU pass and the VPU
    max/exp2/cast passes of different heads can overlap (the serial
    QK→softmax→PV chain per head otherwise leaves the MXU idle during
    softmax; measured residual ~1.4 ms/op at the SD3 joint shape vs the
    d=64 MXU ceiling).  Keeps two score tiles live instead of one — the
    hb-selection VMEM budget in flash_mha already reserves hb tiles.
    """
    i = pl.program_id(0)

    # ``hb`` heads per grid cell (static unroll): short sequences are
    # per-cell-overhead-bound (~4 us/cell at S=1024), so one cell amortizes
    # DMA/setup over several heads.
    def qk(h):
        s = jax.lax.dot_general(
            q_ref[h], k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (block_q, S)
        row = (i * hb + h) // nh
        return s + bias_ref[pl.ds(row, 1), :]          # (1, S) broadcast

    def sm_pv(h, s):
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m).astype(v_ref.dtype)        # bf16 weights (base-2)
        av = jax.lax.dot(p, v_ref[h], preferred_element_type=jnp.float32)
        acc, l = av[:, :hd], av[:, hd : hd + 1]
        o_ref[h] = (acc * (1.0 / jnp.maximum(l, 1e-30))).astype(o_ref.dtype)

    if pipe and hb > 1:
        s_prev = qk(0)
        for h in range(1, hb):
            s_next = qk(h)
            sm_pv(h - 1, s_prev)
            s_prev = s_next
        sm_pv(hb - 1, s_prev)
    else:
        for h in range(hb):
            sm_pv(h, qk(h))


def _mha_kernel_2pass_nobias(q_ref, k_ref, v_ref, o_ref, *, hd: int, hb: int,
                             pipe: bool = False, sdtype=jnp.float32):
    """Two-pass variant with no key padding/mask (kv_len == kv_pad):
    skips the bias add entirely — the common aligned SDXL self-attention.
    ``pipe`` as in _mha_kernel_2pass.

    ``sdtype``: score-tile dtype.  bfloat16 halves the bytes of every
    softmax VPU pass (the binding resource at short-S shapes — see
    _mha_fused_kernel) at ~8-bit-mantissa logit precision; opt-in via
    SDUSS_ATTN_BF16_SCORES until quality is bounded.  The MXU still
    accumulates f32 — Mosaic rejects bf16 matmul accumulators ('tpu.matmul'
    verification error, exp/bench_attn_pipe chip run) — the cast happens on
    the score tile after the contraction."""
    def qk(h):
        s = jax.lax.dot_general(
            q_ref[h], k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return s.astype(sdtype)

    def sm_pv(h, s):
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m).astype(v_ref.dtype)
        av = jax.lax.dot(p, v_ref[h], preferred_element_type=jnp.float32)
        acc, l = av[:, :hd], av[:, hd : hd + 1]
        o_ref[h] = (acc * (1.0 / jnp.maximum(l, 1e-30))).astype(o_ref.dtype)

    if pipe and hb > 1:
        s_prev = qk(0)
        for h in range(1, hb):
            s_next = qk(h)
            sm_pv(h - 1, s_prev)
            s_prev = s_next
        sm_pv(hb - 1, s_prev)
    else:
        for h in range(hb):
            sm_pv(h, qk(h))


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_kv: int,
                kv_len: int, kv_pad: int):
    """One cell = one (batch*head, q_tile). kv loop inside.

    q_ref: (1, block_q, d); k_ref/v_ref: (1, kv_pad, d); o_ref like q_ref.
    ``kv_len`` real keys; keys in [kv_len, kv_pad) are padding.
    """
    q = q_ref[0]  # (block_q, d)
    block_q, d = q.shape

    n_full, rem = divmod(kv_len, block_kv)

    def tile_update(kt_start, carry, masked_width):
        m_prev, l_prev, acc_prev = carry
        k = k_ref[0, pl.ds(kt_start, block_kv), :]  # (block_kv, d)
        v = v_ref[0, pl.ds(kt_start, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * _LOG2E)
        if masked_width is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < masked_width, s, _NEG)
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_next = acc_prev * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_next, l_next, acc_next

    carry = (jnp.full((block_q, 1), -jnp.inf, jnp.float32),
             jnp.zeros((block_q, 1), jnp.float32),
             jnp.zeros((block_q, d), jnp.float32))

    if n_full:
        carry = jax.lax.fori_loop(
            0, n_full,
            lambda i, c: tile_update(i * block_kv, c, None),
            carry)
    if rem:
        # One ragged tile covering [n_full*block_kv, kv_len); kv_pad is
        # sized so this tile exists in the padded buffer.
        carry = tile_update(n_full * block_kv, carry, rem)

    m, l, acc = carry
    inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0] = (acc * inv).astype(o_ref.dtype)


def _mha_kernel_masked(mask_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       block_kv: int, kv_pad: int, nh: int):
    """Online-softmax variant with runtime (B, kv_pad) int32 key validity."""
    q = q_ref[0]
    block_q, d = q.shape
    n_tiles = kv_pad // block_kv
    row = pl.program_id(0) // nh

    def tile_update(i, carry):
        m_prev, l_prev, acc_prev = carry
        kt = i * block_kv
        k = k_ref[0, pl.ds(kt, block_kv), :]
        v = v_ref[0, pl.ds(kt, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * _LOG2E)
        valid = mask_ref[pl.ds(row, 1), pl.ds(kt, block_kv)]
        s = jnp.where(valid > 0, s, _NEG)
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_next = acc_prev * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_next, l_next, acc_next

    carry = (jnp.full((block_q, 1), -jnp.inf, jnp.float32),
             jnp.zeros((block_q, 1), jnp.float32),
             jnp.zeros((block_q, d), jnp.float32))
    carry = jax.lax.fori_loop(0, n_tiles, tile_update, carry)
    m, l, acc = carry
    inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0] = (acc * inv).astype(o_ref.dtype)


def _cross_short_kernel(q_ref, k_ref, v_ref, o_ref, *, nh: int, hd: int,
                        kv_len: int, kv_pad: int):
    """One cell = one (batch row, q tile); ALL heads' tiny K/V in VMEM.

    Layout experiment: q/o stay in model layout (B, Lq, D) — no per-head
    Q/O transpose; heads are lane slices of the q tile; K/V pre-transposed
    outside (tiny at 77 tokens).  MEASURED SLOWER than dense XLA on v5e
    (0.8-0.9x, exp/bench_cross_kernel_v5e.json): the 2*H tiny per-head
    matmuls + lane-slice relayouts don't amortize, while XLA's dense path
    already runs at ~60% of its bandwidth floor.  Kept (with tests) as the
    documented result of the reference's PatchCrossAttention special-path
    (modules/attention.py:52-110) exploration — NOT routed by the
    dispatcher (ops/attention.py).
    """
    q = q_ref[0]                                     # (bq, D) pre-scaled
    for h in range(nh):
        qh = q[:, h * hd : (h + 1) * hd]             # lane slice (bq, hd)
        kh = k_ref[0, pl.ds(h * kv_pad, kv_pad), :]  # (kv_pad, hd)
        vh = v_ref[0, pl.ds(h * kv_pad, kv_pad), :]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # (bq, kv_pad)
        if kv_len != kv_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(vh.dtype), vh,
                        preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd : (h + 1) * hd] = \
            (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _mha_fused_kernel(q_ref, k_ref, v_ref, o_ref, *, nh: int, hd: int,
                      kv_len: int, kv_pad: int, pipe: bool = False,
                      sdtype=jnp.float32):
    """Model-layout self-attention: one cell = one (batch row, q tile).

    q/k/v/o all stay in (B, L, D) model layout — the four per-head
    reshape+transposes of the standard path (each a full HBM round trip;
    ~0.7 ms of the 2.45 ms SDXL-l2 call) never happen.  Heads are lane
    slices taken in VMEM; the per-head QK/PV matmuls are large enough at
    self-attention KV lengths (>=1024) to amortize the slice relayouts —
    unlike the 77-token cross case where the same structure lost to dense
    (see _cross_short_kernel).

    Softmax is two-pass, and the row sum rides the PV matmul: the V lane
    slice gains a ones column IN VMEM (cheap — an (S, hd+1) copy vs the
    (bq, S) f32 sum pass it replaces, ~8x fewer bytes at bq=512) and the
    MXU pads N=hd+1 to 128 output lanes regardless, so ``p @ [V | 1]``
    yields output and normalizer in one pass.  Short-S shapes are
    VPU-bound (l2: softmax VPU time ~ MXU time and they don't overlap —
    measured 40 vs the 77 TF/s the VPU-light l1 shape reaches,
    exp/bench_attn_pipe_v5e.json), so every elided full-tile pass counts.

    ``pipe``: software-pipeline heads — issue head h+1's QK matmul before
    head h's softmax so MXU and VPU passes of adjacent heads can overlap
    (see _mha_kernel_2pass).
    """
    q = q_ref[0]                                     # (bq, D) pre-scaled

    def qk(h):
        qh = q[:, h * hd : (h + 1) * hd]
        kh = k_ref[0][:, h * hd : (h + 1) * hd]      # (kv_pad, hd)
        # f32 MXU accumulation always (Mosaic rejects bf16 matmul
        # accumulators); sdtype only shrinks the resident score tile
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # (bq, kv_pad)
        if kv_len != kv_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG)
        return s.astype(sdtype)

    def sm_pv(h, s):
        vh = v_ref[0][:, h * hd : (h + 1) * hd]
        v_aug = jnp.concatenate(
            [vh, jnp.ones((vh.shape[0], 1), vh.dtype)], axis=1)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        av = jax.lax.dot(p.astype(vh.dtype), v_aug,
                         preferred_element_type=jnp.float32)
        o, l = av[:, :hd], av[:, hd : hd + 1]
        o_ref[0, :, h * hd : (h + 1) * hd] = \
            (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    if pipe and nh > 1:
        s_prev = qk(0)
        for h in range(1, nh):
            s_next = qk(h)
            sm_pv(h - 1, s_prev)
            s_prev = s_next
        sm_pv(nh - 1, s_prev)
    else:
        for h in range(nh):
            sm_pv(h, qk(h))


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "block_q", "interpret",
                     "pipeline", "bf16_scores"))
def flash_mha_fused(q, k, v, num_heads: int, scale: float,
                    block_q: int = 512, interpret: bool = False,
                    pipeline: Optional[bool] = None,
                    bf16_scores: Optional[bool] = None):
    """Self-attention over (B, L, D) with zero head transposes.

    Aligned/unmasked only (the dense-path hot case); the grouped/masked
    patch paths use flash_mha.  Requires the whole-row K/V (full D) plus the
    f32 score tile to fit VMEM — the caller (ops/attention.py) checks.
    """
    b, lq, dm = q.shape
    lk = k.shape[1]
    hd = dm // num_heads
    kv_pad = _ceil_to(lk, 128)
    block_q = min(block_q, _ceil_to(lq, 128))
    lq_pad = _ceil_to(lq, block_q)

    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    if lq_pad != lq:
        qs = jnp.pad(qs, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if kv_pad != lk:
        k = jnp.pad(k, ((0, 0), (0, kv_pad - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kv_pad - lk), (0, 0)))

    grid = (b, lq_pad // block_q)
    pipe = (os.environ.get("SDUSS_ATTN_PIPE", "0") == "1"
            if pipeline is None else pipeline)
    qo_spec = pl.BlockSpec((1, block_q, dm), lambda i, j: (i, j, 0))
    kv_spec = pl.BlockSpec((1, kv_pad, dm), lambda i, j: (i, 0, 0))
    bf16s = (os.environ.get("SDUSS_ATTN_BF16_SCORES", "0") == "1"
             if bf16_scores is None else bf16_scores)
    kernel = functools.partial(_mha_fused_kernel, nh=num_heads, hd=hd,
                               kv_len=lk, kv_pad=kv_pad, pipe=pipe,
                               sdtype=jnp.bfloat16 if bf16s else jnp.float32)
    out = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[qo_spec, kv_spec, kv_spec],
        out_specs=qo_spec,
        out_shape=jax.ShapeDtypeStruct((b, lq_pad, dm), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(qs, k, v)
    return out[:, :lq, :]


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "block_q", "interpret"))
def flash_cross_short(q, k, v, num_heads: int, scale: float,
                      block_q: int = 1024, interpret: bool = False):
    """Cross-attention for SHORT key sequences (text conditioning, Lk<=256).

    q: (B, Lq, D); k/v: (B, Lk, D).  No mask support — the text KV is
    uniform per row (the reference's PatchCrossAttention case,
    sduss/model_executor/modules/attention.py:52-110).
    """
    b, lq, dm = q.shape
    lk = k.shape[1]
    hd = dm // num_heads
    kv_pad = _ceil_to(lk, 128)
    block_q = min(block_q, _ceil_to(lq, 128))
    lq_pad = _ceil_to(lq, block_q)

    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    if lq_pad != lq:
        qs = jnp.pad(qs, ((0, 0), (0, lq_pad - lq), (0, 0)))

    def kv_heads(x):
        # (B, Lk, D) -> (B, H*kv_pad, hd); tiny, transpose cost negligible
        x = x.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
        if kv_pad != lk:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, kv_pad - lk), (0, 0)))
        return x.reshape(b, num_heads * kv_pad, hd)

    kh, vh = kv_heads(k), kv_heads(v)
    grid = (b, lq_pad // block_q)
    qo_spec = pl.BlockSpec((1, block_q, dm), lambda i, j: (i, j, 0))
    kv_spec = pl.BlockSpec((1, num_heads * kv_pad, hd), lambda i, j: (i, 0, 0))
    kernel = functools.partial(_cross_short_kernel, nh=num_heads, hd=hd,
                               kv_len=lk, kv_pad=kv_pad)
    out = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[qo_spec, kv_spec, kv_spec],
        out_specs=qo_spec,
        out_shape=jax.ShapeDtypeStruct((b, lq_pad, dm), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(qs, kh, vh)
    return out[:, :lq, :]


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "block_q", "block_kv", "kv_len",
                     "interpret", "force_online", "heads_per_cell",
                     "pipeline", "bf16_scores"))
def flash_mha(q, k, v, num_heads: int, scale: float,
              kv_mask: Optional[jax.Array] = None,
              kv_len: Optional[int] = None,
              block_q: int = 512, block_kv: int = 512,
              interpret: bool = False, force_online: bool = False,
              heads_per_cell: Optional[int] = None,
              pipeline: Optional[bool] = None,
              bf16_scores: Optional[bool] = None):
    """Fused MHA over (B, Lq, D_model) tensors.

    * ``kv_mask`` (B, Lk) bool/int: runtime key-validity (mixed-token
      batches).  Mutually exclusive with ``kv_len``.
    * ``kv_len``: static count of real keys (uniform batches); keys beyond
      it are padding introduced here for alignment.

    Sequence dims are padded to block multiples internally; padded QUERY
    rows produce garbage rows that the caller's reshape slices off.
    """
    b, lq, dm = q.shape
    lk = k.shape[1]
    hd = dm // num_heads
    if kv_len is None and kv_mask is None:
        kv_len = lk

    block_q = min(block_q, _ceil_to(lq, 128))
    block_kv = min(block_kv, _ceil_to(lk, 128))
    lq_pad = _ceil_to(lq, block_q)
    # Two-pass K/V live whole in VMEM, so they need only LANE (128)
    # alignment — block_kv alignment there minted pad columns that forced
    # the bias kernel at otherwise-aligned shapes (SD3 joint 4480 is
    # 35x128: padding it to 4608 cost a full-tile bias VPU pass, 54.3 vs
    # the nobias kernel's 76.7 TF/s at SDXL l1; exp/bench_attn_pipe_v5e
    # .json).  The online kernel keeps block_kv alignment for its kv loop.
    lk_pad = _ceil_to(lk, 128)

    def heads(x, l, l_pad):
        x = x.reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
        x = x.reshape(b * num_heads, l, hd)
        if l_pad != l:
            x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        return x

    bh = b * num_heads

    # Two-pass kernel wants the (block_q, lk_pad) f32 score tile + bf16 copy
    # + K/V (double-buffered) in VMEM; shrink block_q until it fits the
    # budget, falling back to the online-softmax kernel for very long kv.
    budget = 48 * 2**20
    kv_bytes = 4 * lk_pad * hd * 2
    bq = block_q
    while bq > 128 and bq * lk_pad * 6 + kv_bytes > budget:
        bq //= 2
    two_pass = bq * lk_pad * 6 + kv_bytes <= budget and not force_online
    block_q = bq if two_pass else block_q
    if not two_pass:
        lk_pad = _ceil_to(lk, block_kv)
    lq_pad = _ceil_to(lq, block_q)
    qh = heads(q, lq, lq_pad)
    kh = heads(k, lk, lk_pad)
    vh = heads(v, lk, lk_pad)
    grid = (bh, lq_pad // block_q)

    q_spec = pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0))
    kv_spec = pl.BlockSpec((1, lk_pad, hd), lambda i, j: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((bh, lq_pad, hd), q.dtype)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=64 * 2**20)

    if two_pass:
        if kv_mask is not None:
            valid = kv_mask.astype(jnp.float32)
            if lk_pad != lk:
                valid = jnp.pad(valid, ((0, 0), (0, lk_pad - lk)))
            bias = (1.0 - valid) * _NEG
        else:
            col = jnp.arange(lk_pad)[None, :]
            bias = jnp.broadcast_to(
                jnp.where(col < kv_len, 0.0, _NEG).astype(jnp.float32),
                (b, lk_pad))
        # full (B, S) bias in VMEM; the kernel picks its row (a (1, S) block
        # of a (B>1, S) array violates Mosaic's sublane-divisibility rule)
        bias_spec = pl.BlockSpec((b, lk_pad), lambda i, j: (0, 0))
        # scale folds into q (fused into the head transpose by XLA); V gains
        # a ones column at ``hd`` for the in-matmul row sums (free while
        # hd % 128 != 0; our models all use hd=64)
        qs = (qh.astype(jnp.float32) * (scale * _LOG2E)).astype(qh.dtype)
        vpad = _ceil_to(hd + 1, 128)
        vh_aug = jnp.concatenate(
            [vh, jnp.ones((bh, lk_pad, 1), vh.dtype),
             jnp.zeros((bh, lk_pad, vpad - hd - 1), vh.dtype)], axis=-1)
        # heads per cell: short sequences are cell-overhead-bound.  Cap
        # tuned on chip (exp/bench_attn_sweep_v5e.json): hb*lk_pad <= 4096
        # picks hb=4 at S=1024 (2.20 ms vs 3.34 at hb=2 for SDXL l2);
        # allowing one doubling whenever lk_pad alone exceeds the cap picks
        # hb=2 at S=4096/4608 (SD3 joint 4.80 -> 4.53 ms).
        if heads_per_cell is not None:
            hb = heads_per_cell
            # raise (not assert: stripped under -O) BEFORE the pallas call:
            # a bad hb otherwise surfaces as a Mosaic compile failure —
            # 15-25 min wasted through the relay
            if bh % hb != 0:
                raise ValueError(f"heads_per_cell {hb} must divide B*H {bh}")
            need = hb * (block_q * lk_pad * 6 + lk_pad * (hd + vpad) * 4)
            if need > 64 * 2**20:  # the pallas_call vmem_limit_bytes
                raise ValueError(
                    f"heads_per_cell {hb} needs ~{need >> 20} MiB VMEM "
                    f"(kernel limit 64 MiB); use a smaller hb")
        else:
            hb = 1
            hb_cap = max(4096, 2 * lk_pad)
            while (bh % (hb * 2) == 0 and (hb * 2) * lk_pad <= hb_cap
                   and (hb * 2) * (block_q * lk_pad * 6
                                   + lk_pad * (hd + vpad) * 4) <= budget):
                hb *= 2
        grid = (bh // hb, lq_pad // block_q)
        # Head software-pipelining (overlap head h+1's QK matmul with head
        # h's softmax VPU passes); default from SDUSS_ATTN_PIPE until the
        # on-chip sweep settles a routing rule.
        pipe = (os.environ.get("SDUSS_ATTN_PIPE", "0") == "1"
                if pipeline is None else pipeline)
        qo_spec = pl.BlockSpec((hb, block_q, hd), lambda i, j: (i, j, 0))
        k_spec = pl.BlockSpec((hb, lk_pad, hd), lambda i, j: (i, 0, 0))
        v_aug_spec = pl.BlockSpec((hb, lk_pad, vpad), lambda i, j: (i, 0, 0))
        if kv_mask is None and kv_len == lk_pad:
            # aligned, unmasked: no bias input at all
            bf16s = (os.environ.get("SDUSS_ATTN_BF16_SCORES", "0") == "1"
                     if bf16_scores is None else bf16_scores)
            sdtype = jnp.bfloat16 if bf16s else jnp.float32
            kernel = functools.partial(_mha_kernel_2pass_nobias, hd=hd, hb=hb,
                                       pipe=pipe, sdtype=sdtype)
            out = pl.pallas_call(
                kernel, grid=grid,
                in_specs=[qo_spec, k_spec, v_aug_spec],
                out_specs=qo_spec, out_shape=out_shape,
                compiler_params=params, interpret=interpret,
            )(qs, kh, vh_aug)
        else:
            kernel = functools.partial(_mha_kernel_2pass, hd=hd, nh=num_heads,
                                       hb=hb, pipe=pipe)
            out = pl.pallas_call(
                kernel, grid=grid,
                in_specs=[bias_spec, qo_spec, k_spec, v_aug_spec],
                out_specs=qo_spec, out_shape=out_shape,
                compiler_params=params, interpret=interpret,
            )(bias, qs, kh, vh_aug)
    elif kv_mask is not None:
        mask = kv_mask.astype(jnp.int32)
        if lk_pad != lk:
            mask = jnp.pad(mask, ((0, 0), (0, lk_pad - lk)))
        mask_spec = pl.BlockSpec((b, lk_pad), lambda i, j: (0, 0))
        kernel = functools.partial(_mha_kernel_masked, scale=scale,
                                   block_kv=block_kv, kv_pad=lk_pad,
                                   nh=num_heads)
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[mask_spec, q_spec, kv_spec, kv_spec],
            out_specs=q_spec, out_shape=out_shape,
            compiler_params=params, interpret=interpret,
        )(mask, qh, kh, vh)
    else:
        kernel = functools.partial(_mha_kernel, scale=scale,
                                   block_kv=block_kv, kv_len=kv_len,
                                   kv_pad=lk_pad)
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec, out_shape=out_shape,
            compiler_params=params, interpret=interpret,
        )(qh, kh, vh)

    out = out.reshape(b, num_heads, lq_pad, hd)[:, :, :lq, :]
    return out.transpose(0, 2, 1, 3).reshape(b, lq, dm)
