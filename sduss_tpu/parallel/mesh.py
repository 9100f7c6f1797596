"""Device mesh construction for multi-chip serving.

Replaces the reference's NCCL world + Megatron-style group bookkeeping
(sduss/model_executor/parallel_utils/parallel_state.py:17-166,
worker/runner/_model_runner.py:324-350) with a jax.sharding.Mesh: axes

  dp — data parallel (request-level scale-out; the reference's only working axis)
  tp — tensor parallel (attention heads / FF channels)
  sp — spatial parallel (latent rows; displaced patch parallelism analog)
  pp — pipeline-stage parallel (SCAFFOLD: the reference defines PP groups but
       never initializes or uses them, parallel_state.py:62-71 + the
       commented-out call at _model_runner.py:358-359; mirrored here as an
       optional mesh axis + stage helper so a stage-partitioned denoiser can
       adopt it without re-plumbing — diffusion serving favors sp/tp for
       latency, see docs/DESIGN.md)

Collectives are XLA-inserted over ICI; there is no process group to manage.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, sp: int = 1, pp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = dp * tp * sp * pp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if pp > 1:
        arr = np.asarray(devices[:n]).reshape(dp, pp, sp, tp)
        return Mesh(arr, axis_names=("dp", "pp", "sp", "tp"))
    arr = np.asarray(devices[:n]).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def pp_stage_params(params_stages: Sequence, mesh: Mesh):
    """PP scaffold: place each stage's param subtree on its pp slice.

    Mirrors the reference's dormant pipeline groups (parallel_state.py:62-71):
    stage i's params live on mesh['pp'] index i; activations cross stages via
    jax.lax.ppermute on the 'pp' axis.  No model in this repo is
    stage-partitioned yet (matching the reference, which never used PP).
    """
    if "pp" not in mesh.axis_names:
        raise ValueError("mesh has no 'pp' axis")
    n = mesh.shape["pp"]
    if len(params_stages) != n:
        raise ValueError(f"{len(params_stages)} stages for pp={n}")
    import jax

    placed = []
    for i, sub in enumerate(params_stages):
        devs = mesh.devices.reshape(mesh.shape["dp"], n, -1)[:, i]
        placed.append(jax.tree.map(
            lambda a: jax.device_put(a, devs.reshape(-1)[0]), sub))
    return placed


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Latents (B, H, W, C): batch over dp, latent rows over sp."""
    return NamedSharding(mesh, P("dp", "sp", None, None))


def image_rows_sharding(mesh: Mesh) -> NamedSharding:
    """Per-image arrays (B, ...): batch over dp."""
    return NamedSharding(mesh, P("dp"))
