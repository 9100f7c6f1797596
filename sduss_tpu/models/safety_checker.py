"""Stable Diffusion safety checker (CLIP-vision concept matching).

Rebuild of the stock checker the reference vendors
(sduss/model_executor/diffusers/pipelines/stable_diffusion/safety_checker.py,
82 LoC): image embeddings from a CLIP vision tower are scored by cosine
similarity against learned NSFW "concept" embeddings with per-concept
thresholds; flagged images are blacked out.

Enabled via ``ModelConfig.safety_checker_path`` pointing at a HF
``safety_checker/`` component dir (CompVis layout); without weights the
module still runs (random weights — flag rates are meaningless, for tests).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from sduss_tpu.models.clip_vision import (CLIP_VIT_L14, TINY_CLIP_VISION,
                                          CLIPVisionModel)


class SafetyChecker:
    N_CONCEPTS = 17
    N_SPECIAL = 3

    def __init__(self, tiny: bool = False):
        self.vision = CLIPVisionModel(TINY_CLIP_VISION if tiny else CLIP_VIT_L14)
        self.params: Optional[dict] = None

    def init_random(self, seed: int = 0) -> None:
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        d = self.vision.cfg.projection_dim
        self.params = {
            "vision": self.vision.init(k1),
            "concept_embeds": jax.random.normal(k2, (self.N_CONCEPTS, d)),
            "special_care_embeds": jax.random.normal(k3, (self.N_SPECIAL, d)),
            "concept_embeds_weights": jnp.full((self.N_CONCEPTS,), 0.5),
            "special_care_embeds_weights": jnp.full((self.N_SPECIAL,), 0.5),
        }

    def load(self, component_dir: str) -> None:  # pragma: no cover - needs weights
        from sduss_tpu.models.convert import convert_clip_vision
        from sduss_tpu.models.loader import _load_safetensors_dir

        sd = _load_safetensors_dir(component_dir)
        self.params = {
            "vision": convert_clip_vision(sd, self.vision.cfg.num_layers),
            "concept_embeds": jnp.asarray(sd["concept_embeds"]),
            "special_care_embeds": jnp.asarray(sd["special_care_embeds"]),
            "concept_embeds_weights": jnp.asarray(sd["concept_embeds_weights"]),
            "special_care_embeds_weights": jnp.asarray(sd["special_care_embeds_weights"]),
        }

    @staticmethod
    def _cos(a, b):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
        return a @ b.T

    def check(self, images: np.ndarray) -> Tuple[np.ndarray, List[bool]]:
        """images (B, H, W, 3) uint8 -> (filtered images, per-image nsfw flags).

        Flag logic mirrors the stock checker: special-care matches lower the
        concept thresholds by 0.01 before the concept test.
        """
        assert self.params is not None, "safety checker has no weights"
        px = self.vision.preprocess(jnp.asarray(images))
        emb = self.vision.apply(self.params["vision"], px)["image_embeds"]
        special = self._cos(emb, self.params["special_care_embeds"]) \
            - self.params["special_care_embeds_weights"][None]
        has_special = (special > 0).any(axis=-1, keepdims=True)
        adjustment = jnp.where(has_special, 0.01, 0.0)
        concept = self._cos(emb, self.params["concept_embeds"]) \
            - self.params["concept_embeds_weights"][None] + adjustment
        nsfw = np.asarray((concept > 0).any(axis=-1))
        out = np.array(images, copy=True)
        out[nsfw] = 0
        return out, [bool(f) for f in nsfw]
