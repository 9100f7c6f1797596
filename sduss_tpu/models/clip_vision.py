"""CLIP vision encoder (pure JAX) for CLIP-score evaluation.

The reference's quality check is a torchmetrics CLIPScore template requiring
manual output pasting (reference tests/evaluation/clip_score.py:1-17); here
the vision tower is implemented natively so ``sduss_tpu.evaluation.clip_score``
scores generated images end-to-end on device.  Weight layout mirrors
transformers' CLIPVisionModelWithProjection for mechanical safetensors
loading (openai/clip-vit-large-patch14).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from sduss_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CLIP_VIT_L14 = CLIPVisionConfig()
TINY_CLIP_VISION = CLIPVisionConfig(
    image_size=32, patch_size=8, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, projection_dim=64)

# CLIP preprocessing constants (openai/clip-vit-large-patch14 processor).
_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionModel:
    def __init__(self, cfg: CLIPVisionConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        cfg = self.cfg
        keys = iter(jax.random.split(rng, 8 + 8 * cfg.num_layers))
        p = {
            "class_embedding": L.normal_init(next(keys), (cfg.hidden_size,)),
            "patch_embedding": L.conv_init(next(keys), 3, cfg.hidden_size,
                                           cfg.patch_size, bias=False),
            "position_embedding": L.normal_init(
                next(keys), (cfg.num_patches + 1, cfg.hidden_size)),
            "pre_layernorm": L.layer_norm_init(cfg.hidden_size),
            "post_layernorm": L.layer_norm_init(cfg.hidden_size),
            "visual_projection": L.linear_init(next(keys), cfg.hidden_size,
                                               cfg.projection_dim, bias=False),
            "layers": [],
        }
        for _ in range(cfg.num_layers):
            p["layers"].append({
                "ln1": L.layer_norm_init(cfg.hidden_size),
                "ln2": L.layer_norm_init(cfg.hidden_size),
                "q": L.linear_init(next(keys), cfg.hidden_size, cfg.hidden_size),
                "k": L.linear_init(next(keys), cfg.hidden_size, cfg.hidden_size),
                "v": L.linear_init(next(keys), cfg.hidden_size, cfg.hidden_size),
                "out": L.linear_init(next(keys), cfg.hidden_size, cfg.hidden_size),
                "fc1": L.linear_init(next(keys), cfg.hidden_size, cfg.intermediate_size),
                "fc2": L.linear_init(next(keys), cfg.intermediate_size, cfg.hidden_size),
            })
        return p

    def _act(self, x):
        if self.cfg.hidden_act == "quick_gelu":
            return L.quick_gelu(x)
        return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) uint8 -> (B, image_size, image_size, 3) normalized.

        Bilinear resize straight to the target square (the CLIP processor's
        resize-shortest+center-crop reduces to this for square inputs).
        """
        cfg = self.cfg
        x = images.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, (x.shape[0], cfg.image_size, cfg.image_size, 3),
                             method="bilinear")
        return (x - _MEAN) / _STD

    def apply(self, params, pixel_values):
        """pixel_values: (B, image_size, image_size, 3) preprocessed.

        Returns {"pooled": post-LN CLS, "image_embeds": projected features}.
        """
        cfg = self.cfg
        x = L.conv2d(params["patch_embedding"], pixel_values,
                     stride=cfg.patch_size, padding="VALID")
        b, hp, wp, d = x.shape
        x = x.reshape(b, hp * wp, d)
        cls = jnp.broadcast_to(params["class_embedding"][None, None], (b, 1, d))
        x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
        x = x + params["position_embedding"][None, : x.shape[1]]
        x = L.layer_norm(params["pre_layernorm"], x, cfg.layer_norm_eps)
        for lyr in params["layers"]:
            h = L.layer_norm(lyr["ln1"], x, cfg.layer_norm_eps)
            attn = L.attention(L.linear(lyr["q"], h), L.linear(lyr["k"], h),
                               L.linear(lyr["v"], h), cfg.num_heads)
            x = x + L.linear(lyr["out"], attn)
            h = L.layer_norm(lyr["ln2"], x, cfg.layer_norm_eps)
            x = x + L.linear(lyr["fc2"], self._act(L.linear(lyr["fc1"], h)))
        pooled = L.layer_norm(params["post_layernorm"], x[:, 0], cfg.layer_norm_eps)
        image_embeds = L.linear(params["visual_projection"], pooled)
        return {"pooled": pooled, "image_embeds": image_embeds}
