"""Sampler registry."""

from __future__ import annotations

from typing import Any

from sduss_tpu.samplers.base import (  # noqa: F401
    Sampler,
    SamplerTable,
    gather_coeffs,
    gather_timesteps,
)
from sduss_tpu.samplers.ddim import DDIMSampler
from sduss_tpu.samplers.euler import EulerDiscreteSampler
from sduss_tpu.samplers.flow_match import FlowMatchEulerSampler
from sduss_tpu.samplers.pndm import PNDMSampler

_REGISTRY = {
    "euler": EulerDiscreteSampler,
    "flow_match": FlowMatchEulerSampler,
    "ddim": DDIMSampler,
    "pndm": PNDMSampler,
}


def get_sampler(name: str, **kwargs: Any) -> Sampler:
    try:
        return _REGISTRY[name](**kwargs)
    except KeyError:
        raise ValueError(f"unknown sampler {name!r}; available: {sorted(_REGISTRY)}") from None


def sampler_for_family(family: str, **kwargs: Any) -> Sampler:
    """Default sampler per model family (matching each family's HF config)."""
    if family == "sd3":
        return FlowMatchEulerSampler(**kwargs)
    return EulerDiscreteSampler(**kwargs)
