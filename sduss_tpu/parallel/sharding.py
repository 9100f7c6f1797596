"""Parameter/activation sharding rules (tensor parallel + spatial parallel).

The reference scaffolds TP but gates it off (sduss/config.py:106-108); its
working multi-GPU latency path is DistriFuser's displaced patch parallelism
(distrifuser/modules/pp/). TPU-native equivalents:

* TP: Megatron-style column/row sharding of attention and FF kernels,
  expressed purely as NamedShardings — XLA inserts the all-reduces
  (vs. reference communication_op.py:9-50 manual NCCL calls).
* SP: latent spatial rows sharded over the mesh 'sp' axis; XLA's SPMD
  partitioner inserts halo exchanges for convolutions and collective
  gathers for attention automatically (the GSPMD analog of DistriFuser's
  hand-written halo/KV comm manager, distrifuser/utils.py:119-214).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def unet_param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Sharding pytree for UNet params: attention/FF kernels over 'tp'.

    Column-parallel: to_q/to_k/to_v, ff_geglu (output dim sharded).
    Row-parallel: to_out, ff_out (input dim sharded) -> XLA all-reduces the
    partial sums.  Everything else (convs, norms, embeddings) replicated.
    """

    def rule(path, leaf) -> NamedSharding:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        names = [k for k in keys if isinstance(k, str)]
        if leaf.ndim == 2:
            if any(n in ("to_q", "to_k", "to_v", "ff_geglu") for n in names) \
                    and names[-1] == "kernel":
                return _ns(mesh, None, "tp")
            if any(n in ("to_out", "ff_out") for n in names) and names[-1] == "kernel":
                return _ns(mesh, "tp", None)
        if leaf.ndim == 1 and any(n in ("to_out", "ff_out") for n in names) \
                and names[-1] == "bias":
            return _ns(mesh)  # bias replicated, added once after all-reduce
        return _ns(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


def place_params(params, shardings):
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)
