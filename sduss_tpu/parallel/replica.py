"""Per-replica placement: one device, or an (sp x tp) sub-mesh.

The reference's DP workers are OS processes pinned to one GPU each
(worker/runner/model_runner.py:29-30 CUDA_VISIBLE_DEVICES); TP/PP never ship
(config.py:106-108).  Here a DP replica owns a slice of the global device
list: a single chip, or a sub-mesh over which the denoiser's params are
TP-sharded and the latent rows SP-sharded — GSPMD inserts the collectives
inside the replica's jitted stage functions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sduss_tpu.parallel.sharding import unet_param_shardings


class ReplicaPlacement:
    def __init__(self, devices: Sequence, sp: int = 1, tp: int = 1):
        n = sp * tp
        if len(devices) < n:
            raise ValueError(f"replica needs {n} devices, got {len(devices)}")
        if n == 1:
            self.device = devices[0]
            self.mesh: Optional[Mesh] = None
        else:
            self.device = None
            self.mesh = Mesh(np.asarray(devices[:n]).reshape(sp, tp),
                             axis_names=("sp", "tp"))

    # -- placement -------------------------------------------------------------

    def put_params(self, params: dict, denoiser_key: str) -> dict:
        if self.mesh is None:
            return jax.device_put(params, self.device)
        out = {}
        for name, tree in params.items():
            if name == denoiser_key:
                sh = unet_param_shardings(tree, self.mesh)
                out[name] = jax.tree.map(jax.device_put, tree, sh)
            else:
                rep = NamedSharding(self.mesh, P())
                out[name] = jax.tree.map(lambda x: jax.device_put(x, rep), tree)
        return out

    def put_latents(self, lat):
        if self.mesh is None:
            return jax.device_put(lat, self.device)
        # latent rows over 'sp' (GSPMD conv halos + attention gathers)
        return jax.device_put(
            lat, NamedSharding(self.mesh, P(None, "sp", None, None)))

    def put_replicated(self, x):
        if self.mesh is None:
            return jax.device_put(x, self.device)
        return jax.device_put(x, NamedSharding(self.mesh, P()))


def build_placements(dp: int, sp: int, tp: int,
                     devices: Optional[Sequence] = None) -> list:
    if devices is None:
        devices = jax.devices()
    per = sp * tp
    need = dp * per
    if len(devices) < need:
        raise ValueError(f"need {need} devices for dp={dp} sp={sp} tp={tp}, "
                         f"have {len(devices)}")
    return [ReplicaPlacement(devices[r * per : (r + 1) * per], sp, tp)
            for r in range(dp)]
