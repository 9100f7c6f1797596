"""Mixed-resolution patch batching: static layouts + index metadata.

The reference slices latents of different resolutions into fixed 32x32-cell
patches with a 1-px halo and concatenates them on the batch axis so one UNet
forward serves a 512/768/1024 mixture (sduss/model_executor/modules/unet.py:
104-202 split_sample/concat_sample, padding_idx/patch_map index tensors).

TPU rebuild: all metadata is precomputed host-side per batch COMPOSITION
(multiset of per-image patch grids) and cached; the device sees only
static-shaped arrays:

  image_id     (P,)    patch -> image index
  neighbors    (P, 8)  patch -> [up, down, left, right, ul, ur, dl, dr], -1 = edge
  group_gather (I*max_pp,)  group row -> patch index (-1 = padded slot)
  patch_pos    (P,)    patch -> flat group row (image_id * max_pp + position)
  kv_mask      (I, max_pp)  which group slots hold real patches

P is padded to a patch-count bucket and I to an image-count bucket, so the
XLA compile cache is keyed by (P_bucket, I_bucket, max_pp) — independent of
the exact resolution mixture (SURVEY.md section 7, hard part 3).

Halo exchange includes the 4 diagonal neighbors (the reference's CUDA kernel
tracks only 4 — corners here are exact, not approximated).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PatchMeta:
    """Device-ready metadata for one (padded) patch batch composition."""

    patch_cells: int            # latent cells per patch side (256px / 8 = 32)
    grids: Tuple[int, ...]      # per real image: patches per side
    n_patches: int              # real patches
    n_images: int               # real images
    p_pad: int                  # padded patch count
    i_pad: int                  # padded image count
    max_pp: int                 # max patches per image (padded slot width)

    image_id: np.ndarray        # (p_pad,) int32
    neighbors: np.ndarray       # (p_pad, 8) int32
    group_gather: np.ndarray    # (i_pad * max_pp,) int32
    patch_pos: np.ndarray       # (p_pad,) int32
    kv_mask: np.ndarray         # (i_pad, max_pp) bool

    # Per-resolution-class grouped attention (cuts the cross-class padding
    # that made the mixed path ~2.5x two dense groups: a 512^2 image's 4
    # patches were padded to the 1024^2 class's 16 slots).  One entry per
    # distinct patch-grid side g, largest class first:
    #   class_info    ((g, i_pad_class), ...)          -- static, in compile_key
    #   class_gather  (i_pad_class * g*g,) -> patch    -- -1 = padded slot
    #   class_pos     (p_pad,) -> row in class group   -- 0 for non-members
    #   class_member  (p_pad,) bool
    #   class_kv      (i_pad_class, g*g) bool
    class_info: Tuple[Tuple[int, int], ...] = ()
    class_gather: Tuple[np.ndarray, ...] = ()
    class_pos: Tuple[np.ndarray, ...] = ()
    class_member: Tuple[np.ndarray, ...] = ()
    class_kv: Tuple[np.ndarray, ...] = ()

    @property
    def compile_key(self) -> Tuple:
        return (self.patch_cells, self.p_pad, self.i_pad, self.max_pp,
                self.class_info)


def _bucket(value: int, buckets: Sequence[int]) -> int:
    """Round up to a bucket; values beyond the largest bucket stay EXACT.

    Inside patch metadata, counts legitimately exceed the admission buckets
    even though real request counts never do: the dummy image slot adds one
    on a full-ceiling batch, and CFG doubling doubles a class's slot count
    (a 5+3 mixed batch doubles the 5-class to 10 > buckets[-1]=8).  Exact
    oversize values mint at most a handful of extra compile keys at the
    batch ceiling; raising here crashed full-ceiling mixed batches
    mid-serving.  Request-count validation stays strict in
    config.bucket_for."""
    for b in buckets:
        if value <= b:
            return b
    return value


def _class_arrays(slot_grid: dict, image_id: np.ndarray, patch_pos: np.ndarray,
                  max_pp: int, image_buckets: Sequence[int]):
    """Per-resolution-class grouped-attention index arrays.

    ``slot_grid``: image slot -> patch-grid side g (real slots only; dummy /
    pad slots absent).  Patches of pad slots are members of no class (their
    rows stay zero; they are discarded at merge).
    """
    p_pad = image_id.shape[0]
    pos_in_img = patch_pos - image_id * max_pp
    classes = sorted({g for g in slot_grid.values()}, reverse=True)
    info, gathers, poss, members, kvs = [], [], [], [], []
    for g in classes:
        slots = [s for s, gg in slot_grid.items() if gg == g]
        ipc = _bucket(len(slots), image_buckets)
        local = {s: i for i, s in enumerate(slots)}
        member = np.isin(image_id, slots)
        member &= pos_in_img < g * g
        local_img = np.asarray([local.get(s, 0) for s in range(image_id.max() + 1)],
                               np.int32)
        cpos = np.where(member, local_img[image_id] * g * g + pos_in_img, 0)
        gather = np.full((ipc * g * g,), -1, np.int32)
        gather[cpos[member]] = np.nonzero(member)[0].astype(np.int32)
        kv = np.zeros((ipc, g * g), bool)
        kv.reshape(-1)[cpos[member]] = True
        info.append((g, ipc))
        gathers.append(gather)
        poss.append(cpos.astype(np.int32))
        members.append(member)
        kvs.append(kv)
    return (tuple(info), tuple(gathers), tuple(poss), tuple(members),
            tuple(kvs))


@functools.lru_cache(maxsize=256)
def build_meta(grids: Tuple[int, ...], patch_cells: int,
               patch_buckets: Tuple[int, ...],
               image_buckets: Tuple[int, ...]) -> PatchMeta:
    """Build metadata for a composition given as per-image patch-grid sides."""
    n_images = len(grids)
    n_patches = int(sum(g * g for g in grids))
    p_pad = _bucket(n_patches, patch_buckets)
    # Reserve a dummy image slot when patch padding exists so padded patches
    # never pollute a real image's statistics.
    need_dummy = p_pad > n_patches
    i_pad = _bucket(n_images + (1 if need_dummy else 0), image_buckets)
    max_pp = max(g * g for g in grids)

    from sduss_tpu.native import build_patch_meta_native

    slot_grid = {i: g for i, g in enumerate(grids)}

    native = build_patch_meta_native(np.asarray(grids, np.int32),
                                     p_pad, i_pad, max_pp)
    if native is not None:
        image_id, neighbors, group_gather, patch_pos, kv_mask = native
        ci, cg, cp, cm, ck = _class_arrays(slot_grid, image_id, patch_pos,
                                           max_pp, image_buckets)
        return PatchMeta(
            patch_cells=patch_cells, grids=grids, n_patches=n_patches,
            n_images=n_images, p_pad=p_pad, i_pad=i_pad, max_pp=max_pp,
            image_id=image_id, neighbors=neighbors, group_gather=group_gather,
            patch_pos=patch_pos, kv_mask=kv_mask, class_info=ci,
            class_gather=cg, class_pos=cp, class_member=cm, class_kv=ck)

    # pure-Python fallback (identical layout; tests/test_native.py)
    image_id = np.full((p_pad,), i_pad - 1, np.int32)
    neighbors = np.full((p_pad, 8), -1, np.int32)
    patch_pos = np.zeros((p_pad,), np.int32)
    group_gather = np.full((i_pad * max_pp,), -1, np.int32)
    kv_mask = np.zeros((i_pad, max_pp), bool)

    base = 0
    for img, g in enumerate(grids):
        for i in range(g):
            for j in range(g):
                p = base + i * g + j
                image_id[p] = img
                pos = i * g + j
                patch_pos[p] = img * max_pp + pos
                group_gather[img * max_pp + pos] = p
                kv_mask[img, pos] = True

                def nb(di, dj):
                    ii, jj = i + di, j + dj
                    if 0 <= ii < g and 0 <= jj < g:
                        return base + ii * g + jj
                    return -1

                neighbors[p] = [nb(-1, 0), nb(1, 0), nb(0, -1), nb(0, 1),
                                nb(-1, -1), nb(-1, 1), nb(1, -1), nb(1, 1)]
        base += g * g

    # Padded patches point at the dummy image's first group slot (their
    # attention output is garbage but isolated).
    if need_dummy:
        patch_pos[n_patches:] = (i_pad - 1) * max_pp

    ci, cg, cp, cm, ck = _class_arrays(slot_grid, image_id, patch_pos,
                                       max_pp, image_buckets)
    return PatchMeta(
        patch_cells=patch_cells, grids=grids, n_patches=n_patches,
        n_images=n_images, p_pad=p_pad, i_pad=i_pad, max_pp=max_pp,
        image_id=image_id, neighbors=neighbors, group_gather=group_gather,
        patch_pos=patch_pos, kv_mask=kv_mask, class_info=ci,
        class_gather=cg, class_pos=cp, class_member=cm, class_kv=ck)


@functools.lru_cache(maxsize=256)
def compact_submeta(patch_cells: int,
                    class_info: Tuple[Tuple[int, int], ...],
                    fraction: float, even: bool = False):
    """Static sub-composition for image-granular compact recompute.

    For cache mode "compact" on the patch path: each step recomputes the
    ``round(ipc * fraction)`` most-drifted IMAGES of every resolution class
    (gathered with all their patches), the rest keep cached block outputs.
    The sub-batch is a CANONICAL composition — per-class capacities are
    static, so its PatchMeta (and every index array) is a compile-time
    constant; only the gather/scatter row indices are runtime values.

    Returns (sub_meta, caps) where ``caps[ci]`` is the image capacity of
    class ci and sub_meta's grids are ordered class-major (largest class
    first), matching the concatenation order of the per-class gathers.
    """
    caps = [max(1, int(round(ipc * fraction))) for (_, ipc) in class_info]
    if even:
        # CFG-pair-coherent capacities (deep x compact hybrid on the
        # doubled meta): with symmetrized pair scores an EVEN cap selects
        # both halves of each chosen image together
        caps = [min(ipc, c + (c % 2)) for (_, ipc), c in zip(class_info, caps)]
    grids: List[int] = []
    for (g, _), c in zip(class_info, caps):
        grids += [g] * c
    n_p = sum(g * g for g in grids)
    # exact-fit buckets: the sub batch needs no padding of its own
    sub = build_meta(tuple(grids), patch_cells, (n_p,), (len(grids),))
    return sub, tuple(caps)


@functools.lru_cache(maxsize=256)
def double_meta(grids: Tuple[int, ...], patch_cells: int,
                patch_buckets: Tuple[int, ...],
                image_buckets: Tuple[int, ...]) -> PatchMeta:
    """Metadata for the CFG-doubled batch: [uncond block | cond block].

    The doubled arrays are derived so patch p and p + p_pad belong to image
    slots i and i + i_pad respectively.
    """
    m = build_meta(grids, patch_cells, patch_buckets, image_buckets)
    off_p, off_i = m.p_pad, m.i_pad
    image_id = np.concatenate([m.image_id, m.image_id + off_i])
    neighbors = np.concatenate([
        m.neighbors,
        np.where(m.neighbors >= 0, m.neighbors + off_p, -1)])
    patch_pos = np.concatenate([m.patch_pos, m.patch_pos + off_i * m.max_pp])
    group_gather = np.concatenate([
        m.group_gather,
        np.where(m.group_gather >= 0, m.group_gather + off_p, -1)])
    kv_mask = np.concatenate([m.kv_mask, m.kv_mask])
    slot_grid = {i: g for i, g in enumerate(grids)}
    slot_grid.update({off_i + i: g for i, g in enumerate(grids)})
    ci, cg, cp, cm, ck = _class_arrays(slot_grid, image_id, patch_pos,
                                       m.max_pp, image_buckets)
    return PatchMeta(
        # grids doubled too, preserving the dataclass invariant
        # (one entry per image slot half: sum(g*g) == n_patches/... holds
        # per half and in total)
        patch_cells=m.patch_cells, grids=m.grids + m.grids,
        n_patches=2 * m.n_patches,
        n_images=2 * m.n_images, p_pad=2 * m.p_pad, i_pad=2 * m.i_pad,
        max_pp=m.max_pp, image_id=image_id, neighbors=neighbors,
        group_gather=group_gather, patch_pos=patch_pos, kv_mask=kv_mask,
        class_info=ci, class_gather=cg, class_pos=cp, class_member=cm,
        class_kv=ck)


# ---------------------------------------------------------------------------
# Latent <-> patch-batch reshapes (pure jnp; cheap, per-request).
# ---------------------------------------------------------------------------


def split_latent(lat: jnp.ndarray, patch_cells: int) -> jnp.ndarray:
    """(1, h, h, C) -> (g*g, s, s, C) raster-ordered patches."""
    if lat.shape[0] != 1:
        raise ValueError(f"split_latent takes one image, got batch "
                         f"{lat.shape[0]}")
    _, h, w, c = lat.shape
    s = patch_cells
    g = h // s
    x = lat[0].reshape(g, s, g, s, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(g * g, s, s, c)


def merge_patches(patches: jnp.ndarray, grid: int) -> jnp.ndarray:
    """(g*g, s, s, C) -> (1, g*s, g*s, C)."""
    n, s, _, c = patches.shape
    x = patches.reshape(grid, grid, s, s, c).transpose(0, 2, 1, 3, 4)
    return x.reshape(1, grid * s, grid * s, c)


def haloed(x: jnp.ndarray, neighbors: jnp.ndarray) -> jnp.ndarray:
    """Add a 1-cell halo from the 8 neighbor patches: (P,s,s,C)->(P,s+2,s+2,C).

    Exact replacement for the reference's halo machinery (padding_idx +
    NormSiluConcat CUDA kernel, norm_silu_concat.cu:87-246) as pure gathers —
    XLA fuses the slice into the gather so only edge rows/cols move.
    """

    def take(idx, sl):
        rows = x[jnp.clip(idx, 0)][sl]
        valid = (idx >= 0).reshape((-1,) + (1,) * (rows.ndim - 1))
        return jnp.where(valid, rows, 0)

    s = x.shape[1]
    up = take(neighbors[:, 0], np.s_[:, s - 1 : s, :, :])
    down = take(neighbors[:, 1], np.s_[:, 0:1, :, :])
    left = take(neighbors[:, 2], np.s_[:, :, s - 1 : s, :])
    right = take(neighbors[:, 3], np.s_[:, :, 0:1, :])
    ul = take(neighbors[:, 4], np.s_[:, s - 1 : s, s - 1 : s, :])
    ur = take(neighbors[:, 5], np.s_[:, s - 1 : s, 0:1, :])
    dl = take(neighbors[:, 6], np.s_[:, 0:1, s - 1 : s, :])
    dr = take(neighbors[:, 7], np.s_[:, 0:1, 0:1, :])

    top = jnp.concatenate([ul, up, ur], axis=2)        # (P, 1, s+2, C)
    mid = jnp.concatenate([left, x, right], axis=2)    # (P, s, s+2, C)
    bot = jnp.concatenate([dl, down, dr], axis=2)      # (P, 1, s+2, C)
    return jnp.concatenate([top, mid, bot], axis=1)


def enumerate_mixed_compositions(
        res_to_grid: Dict[int, int], max_batch: int,
        patch_buckets: Sequence[int],
        image_buckets: Sequence[int]) -> List[Dict[int, int]]:
    """One representative composition per REACHABLE mixed compile key.

    The patched step's jit key is ``PatchMeta.compile_key`` — entirely a
    function of bucketed counts, so the infinite composition space folds
    into a small finite key set.  Prewarm warms exactly this set; listing
    compositions by hand under-covers (measured: the r2l mixed serving run
    prewarmed {512:2,1024:2} and {512:4,1024:4}, then a 512:1+1024:1
    admission minted TWO cold keys mid-pass — ~150 s each through the
    relay — and aborted 10/12 requests, exp/serving_sdxl_mixed_v5e_r2.json).

    ``res_to_grid``: resolution -> patch-grid side g for PATCHABLE
    resolutions (hw % cells == 0; the caller filters).  Enumerates every
    multiset with >=2 distinct resolutions and total count <= max_batch
    (a superset of what any admission policy can form), keyed by
    (build_meta.compile_key, double_meta.compile_key) — the PAIR, because
    the step closure bakes in both metas' statics and the doubled meta can
    bucket differently for compositions whose single metas collide
    (pipelines/base.py denoise_step_mixed jit_key).
    """
    reps: Dict[Tuple, Dict[int, int]] = {}
    res_list = sorted(res_to_grid)
    if len(res_list) < 2 or max_batch < 2:
        return []

    def rec(i: int, left: int, counts: List[int]):
        if i == len(res_list):
            if sum(1 for c in counts if c) >= 2:
                # grids ordered like denoise_step_mixed: requests sorted
                # by resolution ascending
                grids = tuple(g for res, c in zip(res_list, counts)
                              for g in [res_to_grid[res]] * c)
                key = (build_meta(grids, 0, tuple(patch_buckets),
                                  tuple(image_buckets)).compile_key
                       + double_meta(grids, 0, tuple(patch_buckets),
                                     tuple(image_buckets)).compile_key)
                if key not in reps:
                    reps[key] = {res: c for res, c in zip(res_list, counts)
                                 if c}
            return
        for c in range(0, left + 1):
            rec(i + 1, left - c, counts + [c])

    rec(0, max_batch, [])
    return list(reps.values())
