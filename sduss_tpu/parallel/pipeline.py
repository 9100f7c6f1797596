"""Inference pipeline parallelism (PP) for the MMDiT trunk.

Reference parity: the reference creates pipeline-parallel process groups but
never executes through them (sduss/model_executor/parallel_state.py — groups
initialized, no send/recv path; PP stays dormant).  This module is a WORKING
TPU-native realization.

Design (TPU-first, not a port):
- Stage ``s`` holds a contiguous block span of the trunk — stage 0 also the
  embedding prelude, the last stage the projection head — with its params
  pinned to its own device (``jax.device_put`` at construction).
- A denoise forward splits the CFG-doubled batch into microbatches; each
  microbatch flows stage 0 -> S-1, with activations moved by
  ``jax.device_put`` between stages (ICI transfers on real chips).
- There is NO hand-written pipeline schedule: JAX dispatch is asynchronous,
  so stage s working on microbatch m overlaps stage s-1 on microbatch m+1
  the moment both are enqueued — the GPipe steady state falls out of the
  dispatch queue.  (The same property the serving engine bounds with
  max_inflight_steps; here the depth is n_micro, naturally bounded.)

When to use which parallel axis (see docs/DESIGN.md):
- TP / SP / displaced-SP (GSPMD + shard_map) cut the LATENCY of one step.
- DP replicates for throughput and costs full-model HBM per replica.
- PP shards WEIGHT residency (~1/S of the trunk per device) at near-DP
  throughput once n_micro >= n_stages fills the pipe — the axis that
  matters when the denoiser no longer fits next to its KV/cache state
  (e.g. SD3.5-large-class trunks on 16 GB v5e chips).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp


def split_spans(n_blocks: int, n_stages: int) -> List[tuple]:
    """Balanced contiguous [lo, hi) spans (sizes differ by at most one;
    floor-based bounds put the larger spans first, so no early stage is
    smaller than a later one)."""
    if not 1 <= n_stages <= n_blocks:
        raise ValueError(f"need 1 <= n_stages <= {n_blocks}, got {n_stages}")
    big = n_blocks - n_stages * (n_blocks // n_stages)
    sizes = [n_blocks // n_stages + (1 if i < big else 0)
             for i in range(n_stages)]
    bounds = [0]
    for sz in sizes:
        bounds.append(bounds[-1] + sz)
    return [(bounds[i], bounds[i + 1]) for i in range(n_stages)]


class MMDiTStagePipeline:
    """GPipe-style pipeline over the MMDiT for one denoise forward.

    ``devices``: one device per stage (order = stage order).
    ``n_micro``: microbatches per forward; default min(batch, n_stages).
    Numerics are EXACTLY the single-device ``model.apply`` (same block
    math, same dtypes — only placement differs); tests/test_pp.py pins
    equality on the virtual CPU mesh.
    """

    def __init__(self, model, params=None, devices: Sequence[Any] = (),
                 n_micro: Optional[int] = None, stage_params_fn=None):
        """``params``: one materialized pytree to slice per stage — fine
        when the trunk fits wherever it currently lives.  For trunks that
        must NEVER exist in one place (the class's residency point), pass
        ``stage_params_fn(stage, lo, hi) -> subtree`` instead: called once
        per stage with its block span, it returns that stage's complete
        subtree ({"blocks": [...]}, plus the embedding/prelude entries on
        stage 0 and norm_out_proj/proj_out on the last) and may stream it
        straight from storage; the pipeline device_puts it to the stage
        device and the full trunk is never resident anywhere."""
        if (params is None) == (stage_params_fn is None):
            raise ValueError("pass exactly one of params / stage_params_fn")
        self.model = model
        self.devices = list(devices)
        self.n_stages = len(self.devices)
        self.n_micro = n_micro
        self.spans = split_spans(model.cfg.num_layers, self.n_stages)

        head_keys = ("norm_out_proj", "proj_out")
        self.stage_params = []
        for s, (lo, hi) in enumerate(self.spans):
            if stage_params_fn is not None:
                sub = stage_params_fn(s, lo, hi)
            else:
                blocks = params["blocks"]
                prelude_keys = tuple(k for k in params
                                     if k not in ("blocks",) + head_keys)
                sub = {"blocks": list(blocks[lo:hi])}
                if s == 0:
                    for k in prelude_keys:
                        sub[k] = params[k]
                if s == self.n_stages - 1:
                    for k in head_keys:
                        sub[k] = params[k]
            self.stage_params.append(jax.device_put(sub, self.devices[s]))

        m = self.model

        def first_fn(p, latents, t, ehs, pooled):
            x, c, temb = m.prelude(p, latents, t, ehs, pooled)
            x, c = m.trunk_blocks(p, x, c, temb, start=self.spans[0][0])
            return x, c, temb

        def mid_fn(start):
            def fn(p, x, c, temb):
                return m.trunk_blocks(p, x, c, temb, start=start) + (temb,)
            return fn

        def last_fn(p, x, c, temb):
            x, _ = m.trunk_blocks(p, x, c, temb,
                                  start=self.spans[-1][0])
            return m.head(p, x, temb)

        if self.n_stages == 1:
            def solo_fn(p, latents, t, ehs, pooled):
                x, c, temb = m.prelude(p, latents, t, ehs, pooled)
                x, c = m.trunk_blocks(p, x, c, temb, start=0)
                return m.head(p, x, temb)

            self.stage_fns = [jax.jit(solo_fn)]
        else:
            self.stage_fns = [jax.jit(first_fn)]
            self.stage_fns += [jax.jit(mid_fn(self.spans[s][0]))
                               for s in range(1, self.n_stages - 1)]
            self.stage_fns.append(jax.jit(last_fn))

    def __call__(self, latents, timesteps, encoder_hidden_states,
                 pooled_projections):
        """(B,H,W,C) -> (B,H,W,C) velocity prediction, batch-microbatched
        through the stage pipeline."""
        cfg = self.model.cfg
        b, hh, ww, _ = latents.shape
        hp, wp = hh // cfg.patch_size, ww // cfg.patch_size
        n_micro = self.n_micro or min(b, self.n_stages)
        n_micro = max(1, min(n_micro, b))
        idx = [round(i * b / n_micro) for i in range(n_micro + 1)]

        outs = []
        for i in range(n_micro):
            lo, hi = idx[i], idx[i + 1]
            if lo == hi:
                continue
            args = jax.device_put(
                (latents[lo:hi], timesteps[lo:hi],
                 encoder_hidden_states[lo:hi], pooled_projections[lo:hi]),
                self.devices[0])
            a = self.stage_fns[0](self.stage_params[0], *args)
            for s in range(1, self.n_stages):
                a = jax.device_put(a, self.devices[s])
                a = self.stage_fns[s](self.stage_params[s], *a)
            outs.append(a)
        tokens = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
        return self.model.unpatchify(tokens, hp, wp)
