"""sduss_tpu — a TPU-native online serving framework for text-to-image diffusion.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ``MiRaCLeXeoN/sduss``
("Mixfusion" / ESyMReD): SLO-aware continuous batching of mixed-resolution
text-to-image requests (SD-1.5, SDXL-base, SD-3.5-medium) with a three-stage
request lifecycle (text encode -> iteration-scheduled denoising -> VAE decode),
learned per-step latency prediction, per-block learned caching, and multi-chip
parallelism over a ``jax.sharding.Mesh``.

Unlike the reference (a 4-deep torch.multiprocessing process tree over NCCL),
this framework is a single-controller asyncio program: each data-parallel
replica is a TPU device (or mesh slice), stages execute as pre-compiled jitted
functions, and collectives are XLA ops over ICI.
"""

__version__ = "0.1.0"

from sduss_tpu.config import (  # noqa: F401
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
)
