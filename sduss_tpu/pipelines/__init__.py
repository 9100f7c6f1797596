"""Pipeline registry (reference diffusers/pipelines/__init__.py:21-30)."""

from __future__ import annotations

from sduss_tpu.config import Config
from sduss_tpu.models.loader import load_bundle
from sduss_tpu.models.registry import ModelBundle
from sduss_tpu.pipelines.base import BasePipeline  # noqa: F401
from sduss_tpu.pipelines.sd import StableDiffusionPipeline
from sduss_tpu.pipelines.sd3 import StableDiffusion3Pipeline
from sduss_tpu.pipelines.sdxl import StableDiffusionXLPipeline

PIPELINES = {
    "sd15": StableDiffusionPipeline,
    "sdxl": StableDiffusionXLPipeline,
    "sd3": StableDiffusion3Pipeline,
}


def get_pipeline_cls(family: str):
    try:
        return PIPELINES[family]
    except KeyError:
        raise ValueError(f"unknown family {family!r}; available: {sorted(PIPELINES)}") from None


def _resolve_encoders_on_host(config: Config) -> bool:
    """Resolve ModelConfig.encoders_on_host == "auto" to a bool.

    Spill the text encoders to host memory iff the analytic bundle size
    (bf16 serving dtype, fp32 force-upcast VAE) exceeds SPILL_FRACTION of
    the accelerator's reported memory.  No weights are materialized — the
    decision must precede generation/loading so spilled encoders are
    created host-side (registry.init_random host_roles).  CPU backends and
    tiny test configs resolve False (memory is not the constraint there).
    """
    import jax

    dev = jax.local_devices()[0]
    if dev.platform == "cpu" or config.model.test_tiny:
        return False
    try:
        limit = (dev.memory_stats() or {}).get("bytes_limit")
    except Exception:
        limit = None
    if not limit:
        # v5e HBM as the conservative default for any accelerator that
        # doesn't report memory_stats (the axon relay's device may expose a
        # non-"tpu" platform string; guessing small only costs host-side
        # text encoding, guessing large OOMs a 16 GB chip).
        limit = 16 * 1024**3
    import jax.numpy as jnp

    from sduss_tpu.models.registry import ModelBundle

    probe = ModelBundle(config.model.family, tiny=config.model.test_tiny)
    dtype = jnp.bfloat16 if config.model.dtype == "bfloat16" else None
    return probe.param_bytes(dtype) > config.model.SPILL_FRACTION * limit


def build_pipeline(config: Config, device=None, bundle: ModelBundle | None = None) -> BasePipeline:
    """Load weights (or random-init) and construct the family pipeline."""
    family = config.model.family
    if config.model.encoders_on_host == "auto":
        config.model.encoders_on_host = _resolve_encoders_on_host(config)
    if bundle is None:
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if config.model.dtype == "bfloat16" else None
        bundle = load_bundle(
            family,
            snapshot=config.model.model_path
            or (config.model.model if config.model.model and
                __import__("os").path.isdir(config.model.model) else None),
            tiny=config.model.test_tiny,
            dtype=dtype,
            seed=config.model.seed,
            host_roles=(BasePipeline.ENCODER_ROLES
                        if config.model.encoders_on_host else ()),
        )
    return get_pipeline_cls(family)(bundle, config, device=device)
