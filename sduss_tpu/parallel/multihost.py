"""Multi-host initialization for pod-scale serving.

The reference is single-node only (8xH100; SLURM single-node launchers,
scripts/slurm/*.slurm) with an NCCL world over tcp://localhost
(worker/runner/_model_runner.py:324-350).  On TPU pods, process bootstrap is
``jax.distributed.initialize`` + the runtime's own topology discovery; after
that, ``jax.devices()`` spans the pod and every mesh/sharding in this package
works unchanged (DP replicas over hosts, sp/tp sub-meshes within ICI
domains).

Usage (one engine process per host)::

    from sduss_tpu.parallel.multihost import initialize
    initialize()                       # TPU pod: args auto-discovered
    initialize("10.0.0.1:1234", 4, 0)  # explicit coordinator (CPU/GPU test)
"""

from __future__ import annotations

from typing import Optional

from sduss_tpu.logger import init_logger

logger = init_logger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    logger.info("multi-host initialized: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def local_replica_devices(dp_per_host: int):
    """Device slices for this host's DP replicas (pod-scale DP layout:
    replicas never span hosts; sp/tp sub-meshes stay within a host's ICI)."""
    import jax

    devs = jax.local_devices()
    per = max(len(devs) // dp_per_host, 1)
    return [devs[i * per : (i + 1) * per] for i in range(dp_per_host)]
