"""Fused per-image GroupNorm + SiLU + halo write — the Pallas TPU rebuild of
the reference's only native kernel (norm_silu_concat.cu:41-438: Welford
moments + NormSiluConcatCUDAKernel normalize/SiLU/halo-fill).

Two phases, mirroring the CUDA kernel's structure:

1. **Moments** (XLA): per-image mean/rstd across that image's patches via
   ``segment_sum`` over the patch->image map (exact, bandwidth-bound — XLA
   already emits an efficient tree reduction; no kernel needed).
2. **Normalize + SiLU + halo** (Pallas): one pass over the patch batch that
   writes the conv-ready (P, s+2, s+2, C) buffer: center = normalized patch,
   1-cell border = normalized edge rows/cols/corners of the 4+4 neighbor
   patches (DMA'd straight from HBM — only edges move, ~(4s+4)/s^2 read
   amplification instead of the 9x of gathering whole neighbor patches).
   This fuses what the unfused path does in three materialized steps
   (normalize+scale+act, neighbor gather, concat) into one VMEM-resident
   pass, eliminating two full HBM round-trips of the activation tensor.

Boundary patches (neighbor = -1) get zero halos, matching the reference's
zero padding at image borders.

Falls back to the pure-jnp composition (ops/patch_ctx.py group_norm +
ops/patching.haloed) off-TPU; ``interpret=True`` testing on CPU keeps the
kernel itself under test everywhere (tests/test_gn_halo.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _moments(x, image_id, n_images: int, groups: int):
    """Per-image (mean, rstd) across patches: (I, G) float32 each."""
    pp, s, _, c = x.shape
    g = groups
    xf = x.astype(jnp.float32).reshape(pp, s * s, g, c // g)
    psum = xf.sum(axis=(1, 3))
    psq = (xf * xf).sum(axis=(1, 3))
    sums = jax.ops.segment_sum(psum, image_id, num_segments=n_images)
    sqs = jax.ops.segment_sum(psq, image_id, num_segments=n_images)
    cnt = jax.ops.segment_sum(
        jnp.full((pp,), float(s * s * (c // g)), jnp.float32),
        image_id, num_segments=n_images)
    cnt = jnp.maximum(cnt, 1.0)[:, None]
    mean = sums / cnt
    var = jnp.maximum(sqs / cnt - mean * mean, 0.0)
    return mean, var


def _kernel(image_id_ref, neighbors_ref, x_ref, mean_ref, rstd_ref,
            scale_ref, bias_ref, out_ref, center, up, down, left, right,
            corners, sems, *, s, c, groups, act):
    """Mosaic constraints shape this kernel (all hit on real hardware):
    DMA destinations must start tile-aligned, so each edge strip lands in
    its own origin-aligned scratch buffer and the haloed tile is assembled
    with vector concats; normalization vectors are per-channel (the group
    reshape is an unsupported shape cast in Mosaic)."""
    p = pl.program_id(0)
    img = image_id_ref[p]
    sl = slice(None)

    nbs = [neighbors_ref[p, k] for k in range(8)]
    # (buffer, src slice within the neighbor patch) per strip.  Mosaic only
    # allows DMA slicing on the untiled ROW dim; column strips come from
    # whole-patch copies (left/right) or row copies (corners from diagonal
    # neighbors' boundary rows), with the column extracted in VMEM.
    plan = [
        (up, (slice(s - 1, s), sl, sl)),        # up: its last row
        (down, (slice(0, 1), sl, sl)),          # down: its first row
        (left, (sl, sl, sl)),                   # left: whole patch
        (right, (sl, sl, sl)),                  # right: whole patch
        (corners.at[0], (slice(s - 1, s), sl, sl)),  # ul: its last row
        (corners.at[1], (slice(s - 1, s), sl, sl)),  # ur: its last row
        (corners.at[2], (slice(0, 1), sl, sl)),      # dl: its first row
        (corners.at[3], (slice(0, 1), sl, sl)),      # dr: its first row
    ]

    def dma(i):
        if i == 0:
            return pltpu.make_async_copy(x_ref.at[p], center, sems.at[0])
        buf, src = plan[i - 1]
        nb = jnp.maximum(nbs[i - 1], 0)
        return pltpu.make_async_copy(x_ref.at[(nb,) + src], buf, sems.at[i])

    for i in range(9):
        dma(i).start()
    for i in range(9):
        dma(i).wait()

    cen = center[...]
    u, d = up[...], down[...]                    # (1, s, C)
    l = left[:, s - 1 : s, :]                    # (s, 1, C) last col
    r_ = right[:, 0:1, :]                        # (s, 1, C) first col
    ul = corners[0, :, s - 1 : s, :]             # (1, 1, C)
    ur = corners[1, :, 0:1, :]
    dl = corners[2, :, s - 1 : s, :]
    dr = corners[3, :, 0:1, :]

    top = jnp.concatenate([ul, u, ur], axis=1)       # (1, s+2, C)
    mid = jnp.concatenate([l, cen, r_], axis=1)      # (s, s+2, C)
    bot = jnp.concatenate([dl, d, dr], axis=1)
    v = jnp.concatenate([top, mid, bot], axis=0).astype(jnp.float32)

    m = mean_ref[pl.ds(img, 1), :].reshape(1, 1, c)
    rs = rstd_ref[pl.ds(img, 1), :].reshape(1, 1, c)
    y = (v - m) * rs
    y = y * scale_ref[0].reshape(1, 1, c) + bias_ref[0].reshape(1, 1, c)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)

    # Image-border halos are zero AFTER normalization (matching the unfused
    # composition: normalize, then gather with zero fill at -1 neighbors).
    def flag(nb, rows, cols):
        return jnp.broadcast_to(
            jnp.where(nb >= 0, 1.0, 0.0).astype(jnp.float32).reshape(1, 1, 1),
            (rows, cols, 1))

    one = jnp.ones((s, s, 1), jnp.float32)
    mask_top = jnp.concatenate(
        [flag(nbs[4], 1, 1), flag(nbs[0], 1, s), flag(nbs[5], 1, 1)], axis=1)
    mask_mid = jnp.concatenate(
        [flag(nbs[2], s, 1), one, flag(nbs[3], s, 1)], axis=1)
    mask_bot = jnp.concatenate(
        [flag(nbs[6], 1, 1), flag(nbs[1], 1, s), flag(nbs[7], 1, 1)], axis=1)
    mask = jnp.concatenate([mask_top, mask_mid, mask_bot], axis=0)
    out_ref[0] = (y * mask).astype(out_ref.dtype)


def gn_silu_halo_pallas(x, image_id, neighbors, mean, rstd, scale, bias,
                        act: Optional[str] = "silu", interpret: bool = False):
    """x (P,s,s,C) + per-image stats -> normalized haloed (P,s+2,s+2,C)."""
    pp, s, _, c_logical = x.shape
    groups = mean.shape[1]
    cpg = c_logical // groups
    # group -> channel expansion outside the kernel (Mosaic can't reshape
    # (rows, C) into (rows, G, C/G) inside)
    mean_c = jnp.repeat(mean, cpg, axis=1)
    rstd_c = jnp.repeat(rstd, cpg, axis=1)
    # Mosaic requires DMA slices 128-aligned on the lane (channel) dim; pad
    # C up (e.g. SDXL level-0's 320 -> 384) and slice back after.
    c = ((c_logical + 127) // 128) * 128
    if c != c_logical:
        padc = [(0, 0)] * 3 + [(0, c - c_logical)]
        x = jnp.pad(x, padc)
        mean_c = jnp.pad(mean_c, [(0, 0), (0, c - c_logical)])
        rstd_c = jnp.pad(rstd_c, [(0, 0), (0, c - c_logical)])
        scale = jnp.pad(scale, [(0, c - c_logical)])
        bias = jnp.pad(bias, [(0, c - c_logical)])

    kernel = functools.partial(_kernel, s=s, c=c, groups=groups, act=act)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mean (I, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rstd (I, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale (1, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (1, C)
        ],
        out_specs=pl.BlockSpec((1, s + 2, s + 2, c),
                               lambda p, *_: (p, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((s, s, c), x.dtype),      # center
            pltpu.VMEM((1, s, c), x.dtype),      # up row
            pltpu.VMEM((1, s, c), x.dtype),      # down row
            pltpu.VMEM((s, s, c), x.dtype),      # left neighbor (whole patch)
            pltpu.VMEM((s, s, c), x.dtype),      # right neighbor (whole patch)
            pltpu.VMEM((4, 1, s, c), x.dtype),   # diagonal boundary rows
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pp, s + 2, s + 2, c), x.dtype),
        interpret=interpret,
    )(jnp.asarray(image_id), jnp.asarray(neighbors), x,
      mean_c, rstd_c, scale.reshape(1, c), bias.reshape(1, c))
    if c != c_logical:
        out = out[..., :c_logical]
    return out


@functools.lru_cache(maxsize=1)
def pallas_supported() -> bool:
    import os

    if os.environ.get("SDUSS_DISABLE_FUSED_GN") == "1":
        return False
    return jax.default_backend() == "tpu"


def gn_silu_haloed(p, x, image_id, neighbors, n_images: int, groups: int,
                   eps: float, act: Optional[str] = "silu",
                   force_pallas: Optional[bool] = None):
    """Public fused op: moments (XLA) + normalize/act/halo (Pallas).

    Off-TPU falls back to the identical-semantics jnp composition.
    """
    mean, var = _moments(x, image_id, n_images, groups)
    rstd = jax.lax.rsqrt(var + eps)
    use_pallas = pallas_supported() if force_pallas is None else force_pallas
    scale = p["scale"].astype(jnp.float32)
    bias = p["bias"].astype(jnp.float32)
    if use_pallas:
        return gn_silu_halo_pallas(x, image_id, neighbors, mean, rstd,
                                   scale, bias, act,
                                   interpret=jax.default_backend() != "tpu")
    # jnp fallback: normalize then gather halos (two passes)
    from sduss_tpu.ops.patching import haloed

    pp, s, _, c = x.shape
    cpg = c // groups
    xf = x.astype(jnp.float32).reshape(pp, s, s, groups, cpg)
    m = mean[image_id].reshape(pp, 1, 1, groups, 1)
    r = rstd[image_id].reshape(pp, 1, 1, groups, 1)
    y = (xf - m) * r
    y = y.reshape(pp, s, s, c) * scale + bias
    if act == "silu":
        y = jax.nn.silu(y)
    y = y.astype(x.dtype)
    return haloed(y, jnp.asarray(neighbors))
