"""Model-family registry: configs + random-init constructors per family.

Mirrors the reference pipeline registries
(sduss/model_executor/diffusers/pipelines/__init__.py:21-30) keyed by family
name instead of HF pipeline class.  Tiny variants exist for every family so
the full serving stack is testable on CPU without weights.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax

from sduss_tpu.models import clip as clip_mod
from sduss_tpu.models import mmdit as mmdit_mod
from sduss_tpu.models import t5 as t5_mod
from sduss_tpu.models import unet as unet_mod
from sduss_tpu.models import vae as vae_mod


@dataclasses.dataclass(frozen=True)
class FamilySpec:
    family: str
    latent_channels: int
    vae_scale: int  # pixels per latent cell
    default_sampler: str
    sampler_kwargs: dict
    default_steps: int
    default_guidance: float
    resolutions: Tuple[int, ...]
    # text encoder roles, in order
    text_encoders: Tuple[str, ...]


SPECS: Dict[str, FamilySpec] = {
    "sd15": FamilySpec(
        family="sd15", latent_channels=4, vae_scale=8,
        default_sampler="euler", sampler_kwargs={}, default_steps=50,
        default_guidance=7.5, resolutions=(256, 512, 768),
        text_encoders=("clip_l",),
    ),
    "sdxl": FamilySpec(
        family="sdxl", latent_channels=4, vae_scale=8,
        default_sampler="euler", sampler_kwargs={}, default_steps=50,
        default_guidance=5.0, resolutions=(512, 768, 1024),
        text_encoders=("clip_l", "clip_g"),
    ),
    "sd3": FamilySpec(
        family="sd3", latent_channels=16, vae_scale=8,
        default_sampler="flow_match", sampler_kwargs={"shift": 3.0}, default_steps=40,
        default_guidance=4.5, resolutions=(512, 768, 1024),
        text_encoders=("clip_l", "clip_g", "t5"),
    ),
}


class ModelBundle:
    """All models + params for one deployment (one family)."""

    def __init__(self, family: str, tiny: bool = False):
        self.family = family
        self.spec = SPECS[family]
        self.tiny = tiny
        self.models: dict = {}
        self.params: dict = {}
        self.tokenizers: dict = {}

        if family == "sd15":
            self.models["unet"] = unet_mod.UNet2DConditionModel(
                unet_mod.TINY_UNET if tiny else unet_mod.SD15_UNET)
            if tiny:
                # text width must equal TINY_UNET.cross_attention_dim (32)
                te_cfg = dataclasses.replace(clip_mod.TINY_CLIP, hidden_size=32,
                                             intermediate_size=64, projection_dim=None)
            else:
                te_cfg = dataclasses.replace(clip_mod.CLIP_L, projection_dim=None)
            self.models["text_encoder"] = clip_mod.CLIPTextModel(te_cfg)
            self.models["vae"] = vae_mod.AutoencoderKL(
                vae_mod.TINY_VAE if tiny else vae_mod.SD15_VAE)
        elif family == "sdxl":
            self.models["unet"] = unet_mod.UNet2DConditionModel(
                unet_mod.TINY_SDXL_UNET if tiny else unet_mod.SDXL_UNET)
            if tiny:
                te1 = dataclasses.replace(clip_mod.TINY_CLIP, projection_dim=None, hidden_size=16,
                                          intermediate_size=32)
                te2 = dataclasses.replace(clip_mod.TINY_CLIP, projection_dim=48, hidden_size=16,
                                          intermediate_size=32)
            else:
                te1 = dataclasses.replace(clip_mod.CLIP_L, projection_dim=None)
                te2 = clip_mod.CLIP_G
            self.models["text_encoder"] = clip_mod.CLIPTextModel(te1)
            self.models["text_encoder_2"] = clip_mod.CLIPTextModel(te2)
            self.models["vae"] = vae_mod.AutoencoderKL(
                vae_mod.TINY_VAE if tiny else vae_mod.SDXL_VAE)
        elif family == "sd3":
            self.models["transformer"] = mmdit_mod.SD3Transformer2DModel(
                mmdit_mod.TINY_MMDIT if tiny else mmdit_mod.SD35_MEDIUM)
            if tiny:
                te1 = dataclasses.replace(clip_mod.TINY_CLIP, hidden_size=16,
                                          intermediate_size=32, projection_dim=16)
                te2 = dataclasses.replace(clip_mod.TINY_CLIP, hidden_size=16,
                                          intermediate_size=32, projection_dim=16)
                # t5 width must equal the MMDiT joint_attention_dim (32).
                te3 = dataclasses.replace(t5_mod.TINY_T5, d_model=32, d_kv=8, num_heads=4)
            else:
                te1 = clip_mod.CLIP_L_PROJ
                te2 = clip_mod.CLIP_G
                te3 = t5_mod.T5_XXL
            self.models["text_encoder"] = clip_mod.CLIPTextModel(te1)
            self.models["text_encoder_2"] = clip_mod.CLIPTextModel(te2)
            self.models["text_encoder_3"] = t5_mod.T5EncoderModel(te3)
            vcfg = vae_mod.TINY_VAE if tiny else vae_mod.SD3_VAE
            if tiny:
                vcfg = dataclasses.replace(vcfg, latent_channels=4,
                                           scaling_factor=1.5305, shift_factor=0.0609)
            self.models["vae"] = vae_mod.AutoencoderKL(vcfg)
        else:
            raise ValueError(family)

    @property
    def denoiser_key(self) -> str:
        return "transformer" if self.family == "sd3" else "unet"

    @property
    def denoiser(self):
        return self.models[self.denoiser_key]

    @property
    def latent_channels(self) -> int:
        if self.family == "sd3":
            return self.models["transformer"].cfg.in_channels
        return self.models["unet"].cfg.in_channels

    def param_bytes(self, dtype=None, roles=None) -> int:
        """Analytic parameter size (bytes) WITHOUT allocating anything.

        ``jax.eval_shape`` traces each model's init abstractly; leaves are
        counted at the target serving itemsize (``dtype``), except the VAE
        when its family forces fp32 (force_upcast).  Used by the "auto"
        stage-wise residency policy (ModelConfig.encoders_on_host) to
        decide host-vs-HBM placement before any weight is materialized.
        """
        import numpy as np

        import jax.numpy as jnp

        total = 0
        for name, model in self.models.items():
            if roles is not None and name not in roles:
                continue
            if dtype is None or (name == "vae" and model.cfg.force_upcast):
                itemsize = 4
            else:
                itemsize = jnp.dtype(dtype).itemsize
            shapes = jax.eval_shape(model.init, jax.ShapeDtypeStruct((2,), jnp.uint32))
            total += sum(int(np.prod(l.shape)) * itemsize
                         for l in jax.tree.leaves(shapes))
        return total

    def init_random(self, seed: int = 0, dtype=None, host_roles=()) -> None:
        """Random-init all params (tests / benchmarks without weights).

        With a target dtype, params are GENERATED in that dtype on device —
        an fp32 staging copy of a full-size SDXL bundle would transiently
        exceed a 16 GB chip (sduss_tpu/utils.random_params).

        ``host_roles``: generate these components directly on the CPU host
        (ModelConfig.encoders_on_host).  Generating on the accelerator and
        copying to host afterwards would leave the device copy referenced
        by this bundle — the full-size SD3 encoder set (T5-XXL ~9.4 GB
        bf16 + CLIP-G) then fills a 16 GB chip before the first denoise
        step (the round-2 cache.train/profiler OOM).
        """
        import contextlib

        rng = jax.random.key(seed)
        for i, (name, model) in enumerate(sorted(self.models.items())):
            tgt = dtype
            if name == "vae" and self.models["vae"].cfg.force_upcast:
                tgt = None  # VAE params stay float32
            cm = (jax.default_device(jax.devices("cpu")[0])
                  if name in host_roles else contextlib.nullcontext())
            with cm:
                if tgt is None:
                    self.params[name] = model.init(jax.random.fold_in(rng, i))
                else:
                    from sduss_tpu.utils import random_params

                    self.params[name] = random_params(model, seed + i, tgt)

    def cast(self, dtype) -> None:
        import jax.numpy as jnp
        import numpy as np

        def _c(x):
            if hasattr(x, "dtype") and x.dtype in (jnp.float32, np.float32):
                return jax.numpy.asarray(x, dtype)
            return jax.numpy.asarray(x)

        # Keep the VAE in float32 when the family requires it (SDXL overflow).
        for name in self.params:
            if name == "vae" and self.models["vae"].cfg.force_upcast:
                continue
            self.params[name] = jax.tree.map(_c, self.params[name])


def get_bundle(family: str, tiny: bool = False) -> ModelBundle:
    return ModelBundle(family, tiny=tiny)
