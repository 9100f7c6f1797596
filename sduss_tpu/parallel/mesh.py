"""Device mesh construction for multi-chip serving.

Replaces the reference's NCCL world + Megatron-style group bookkeeping
(sduss/model_executor/parallel_utils/parallel_state.py:17-166,
worker/runner/_model_runner.py:324-350) with a jax.sharding.Mesh: axes

  dp — data parallel (request-level scale-out; the reference's only working axis)
  tp — tensor parallel (attention heads / FF channels)
  sp — spatial parallel (latent rows; displaced patch parallelism analog)

Collectives are XLA-inserted over ICI; there is no process group to manage.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = dp * tp * sp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Latents (B, H, W, C): batch over dp, latent rows over sp."""
    return NamedSharding(mesh, P("dp", "sp", None, None))


def image_rows_sharding(mesh: Mesh) -> NamedSharding:
    """Per-image arrays (B, ...): batch over dp."""
    return NamedSharding(mesh, P("dp"))
