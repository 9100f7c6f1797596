"""Functional NN primitives over plain param pytrees (dicts of jnp arrays).

Design: models are pure functions ``apply(params, ...)`` — no framework module
state — so they jit/shard/vmap cleanly and weight loading is a mechanical
name-mapping from HF safetensors.  Layout is TPU-idiomatic: NHWC activations,
HWIO conv kernels, (in, out) matmul kernels; matmuls run in bfloat16 on the
MXU with float32 accumulation.

Replaces the reference's torch module wrappers under
sduss/model_executor/modules/ (resnet.py, attention.py, groupnorm.py) with
pure-JAX equivalents; the patch-batched variants live in sduss_tpu/ops/.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# Matmul/conv precision. None = backend default: bf16 inputs run single-pass
# on the MXU (the fast path the whole stack is designed around — activations
# and weights are bf16 in serving). Stages that need full float32 math (VAE
# decode) wrap their calls in ``jax.default_matmul_precision("highest")``
# instead of forcing every matmul in the network onto the slow multi-pass MXU
# path.
MATMUL_PRECISION: Optional[jax.lax.Precision] = None


def linear_init(rng, in_dim: int, out_dim: int, dtype=jnp.float32, bias: bool = True):
    k1, _ = jax.random.split(rng)
    scale = 1.0 / math.sqrt(in_dim)
    p = {"kernel": jax.random.uniform(k1, (in_dim, out_dim), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def linear(p, x):
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32,
                precision=MATMUL_PRECISION)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv_init(rng, in_ch: int, out_ch: int, kernel: int, dtype=jnp.float32, bias: bool = True):
    k1, _ = jax.random.split(rng)
    fan_in = in_ch * kernel * kernel
    scale = 1.0 / math.sqrt(fan_in)
    p = {"kernel": jax.random.uniform(k1, (kernel, kernel, in_ch, out_ch), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def conv2d(p, x, stride: int = 1, padding="SAME"):
    """NHWC conv with HWIO kernel.

    ``padding``: "SAME"/"VALID", an int (symmetric both spatial dims), or an
    explicit [(ph_lo, ph_hi), (pw_lo, pw_hi)] list (used by the sharded
    spatial path where H halos are exchanged manually).
    For stride > 1, "SAME" is replaced by explicit symmetric (k-1)//2 padding
    to match torch Conv2d(padding=1) window placement (XLA SAME would pad
    bottom/right only, shifting every window by one).
    """
    if padding == "SAME" and stride != 1:
        padding = (p["kernel"].shape[0] - 1) // 2
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=MATMUL_PRECISION,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm_init(channels: int, dtype=jnp.float32):
    return {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)}


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-5, act: Optional[str] = None):
    """GroupNorm over an NHWC (or N...C) tensor; statistics in float32.

    Stats come from f32-accumulated reductions read straight off the input
    (no materialized f32 copy — the x.astype(f32)-then-mean/var form made
    XLA keep a full f32 temp and cost 4.5 ms at SDXL level0 b16; this form
    is reduction + one fused normalize pass).  Same E[x^2]-E[x]^2 moments as
    the fused patch kernel (ops/gn_halo.py).
    """
    orig_dtype = x.dtype
    shape = x.shape
    c = shape[-1]
    g = num_groups
    xg = x.reshape(shape[0], -1, g, c // g)
    n = xg.shape[1] * xg.shape[3]
    s1 = jnp.sum(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(xg.astype(jnp.float32)), axis=(1, 3), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    scale = p["scale"].astype(jnp.float32).reshape(1, 1, g, c // g)
    bias = p["bias"].astype(jnp.float32).reshape(1, 1, g, c // g)
    a = rstd * scale
    b = bias - mean * a
    y = xg.astype(jnp.float32) * a + b
    if act == "silu":
        y = jax.nn.silu(y)
    elif act is not None:
        raise ValueError(act)
    return y.reshape(shape).astype(orig_dtype)


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p, x, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    return y.astype(x.dtype)


def attention(q, k, v, num_heads: int, mask=None, scale: Optional[float] = None, bias=None):
    """Multi-head attention over (B, L, D) tensors.

    Plain XLA path (einsum + softmax); the Pallas flash path with segment IDs
    for patch-group attention lives in sduss_tpu/ops/attention.py.
    """
    b, lq, d = q.shape
    lk = k.shape[1]
    hd = d // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    qh = q.reshape(b, lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32,
                        precision=MATMUL_PRECISION) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh, preferred_element_type=jnp.float32,
                     precision=MATMUL_PRECISION).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, d)


def attention_blocked(q, k, v, num_heads: int, block_q: int = 1024,
                      scale: Optional[float] = None):
    """Exact attention with query-row blocking (``lax.map`` over q tiles).

    Bounds the live logits to (block_q, L) f32 instead of materializing the
    full (L, L) score matrix — the VAE's 16k-token single-head mid
    attention (d=512, too wide for the flash kernels' full-KV-in-VMEM
    layout) would otherwise stage ~1 GB of f32 logits per image through
    HBM.  Identical math to :func:`attention` (no mask/bias support).
    """
    b, lq, d = q.shape
    lk = k.shape[1]
    hd = d // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    if lq <= block_q:
        return attention(q, k, v, num_heads, scale=scale)
    pad = (-lq) % block_q
    if pad:
        q = jnp.concatenate(
            [q, jnp.zeros((b, pad, d), q.dtype)], axis=1)
    nb = q.shape[1] // block_q
    kh = k.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    qh = (q.reshape(b, nb, block_q, num_heads, hd)
          .transpose(1, 0, 3, 2, 4))  # (nb, b, h, block_q, hd)

    def one_block(qb):
        logits = jnp.einsum("bhqd,bhkd->bhqk", qb, kh,
                            preferred_element_type=jnp.float32,
                            precision=MATMUL_PRECISION) * scale
        w = jax.nn.softmax(logits, axis=-1).astype(qb.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", w, vh,
                          preferred_element_type=jnp.float32,
                          precision=MATMUL_PRECISION).astype(qb.dtype)

    out = jax.lax.map(one_block, qh)  # (nb, b, h, block_q, hd)
    out = out.transpose(1, 0, 3, 2, 4).reshape(b, nb * block_q, d)
    return out[:, :lq]


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True, downscale_freq_shift: float = 0.0,
                       scale: float = 1.0):
    """Sinusoidal timestep embedding, (B,) -> (B, dim), float32.

    Matches diffusers.embeddings.get_timestep_embedding semantics; SD UNets use
    flip_sin_to_cos=True, downscale_freq_shift=0.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / (half - downscale_freq_shift)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = scale * jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


def geglu(p, x):
    """GEGLU feed-forward gate: proj to 2*inner, gelu on half, multiply."""
    h = linear(p, x)
    a, g = jnp.split(h, 2, axis=-1)
    return a * jax.nn.gelu(g.astype(jnp.float32), approximate=False).astype(x.dtype)


def quick_gelu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def nearest_upsample_2x(x):
    """NHWC nearest-neighbor 2x upsample."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def normal_init(rng, shape, std: float = 0.02, dtype=jnp.float32):
    return jax.random.normal(rng, shape, dtype) * std
