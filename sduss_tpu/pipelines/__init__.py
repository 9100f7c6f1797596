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


def build_pipeline(config: Config, device=None, bundle: ModelBundle | None = None) -> BasePipeline:
    """Load weights (or random-init) and construct the family pipeline."""
    family = config.model.family
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
