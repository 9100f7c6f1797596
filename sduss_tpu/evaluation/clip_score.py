"""CLIP score: cosine similarity between prompt and generated image.

score = 100 * max(0, cos(text_embeds, image_embeds)) — the torchmetrics
CLIPScore definition the reference's evaluation template targets
(reference tests/evaluation/clip_score.py).

With a CLIP snapshot (openai/clip-vit-large-patch14 layout) real weights
load via safetensors; without one, random weights still exercise the full
path (useful only for pipeline tests, not quality numbers).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from sduss_tpu.models import clip as clip_mod
from sduss_tpu.models import clip_vision as cv


class ClipScorer:
    def __init__(self, snapshot: Optional[str] = None, tiny: bool = False,
                 seed: int = 0):
        import dataclasses

        if tiny:
            self.text = clip_mod.CLIPTextModel(dataclasses.replace(
                clip_mod.TINY_CLIP, projection_dim=64))
            self.vision = cv.CLIPVisionModel(cv.TINY_CLIP_VISION)
        else:
            self.text = clip_mod.CLIPTextModel(clip_mod.CLIP_L_PROJ)
            self.vision = cv.CLIPVisionModel(cv.CLIP_VIT_L14)

        if snapshot is not None:
            self._load(snapshot)
        else:
            k1, k2 = jax.random.split(jax.random.key(seed))
            self.text_params = self.text.init(k1)
            self.vision_params = self.vision.init(k2)
            self.tokenizer = None

        self._jit_text = jax.jit(
            lambda p, ids: self.text.apply(p, ids)["pooled"])
        self._jit_vision = jax.jit(
            lambda p, px: self.vision.apply(p, px)["image_embeds"])

    def _load(self, snapshot: str) -> None:  # pragma: no cover - needs weights
        from sduss_tpu.models.convert import convert_clip, convert_clip_vision
        from sduss_tpu.models.loader import _load_safetensors_dir

        sd = _load_safetensors_dir(snapshot)
        # convert_clip itself addresses keys under the 'text_model.' prefix
        # (plus the top-level text_projection.weight) — pass keys unstripped
        self.text_params = convert_clip(sd, self.text.cfg.num_layers)
        self.vision_params = convert_clip_vision(sd, self.vision.cfg.num_layers)
        import transformers

        self.tokenizer = transformers.AutoTokenizer.from_pretrained(snapshot)

    def _tokenize(self, prompts: Sequence[str]) -> np.ndarray:
        if self.tokenizer is not None:
            return np.asarray(self.tokenizer(
                list(prompts), max_length=77, padding="max_length",
                truncation=True)["input_ids"])
        from sduss_tpu.models.loader import StubTokenizer

        return StubTokenizer(self.text.cfg.vocab_size)(prompts)["input_ids"]

    def score(self, prompts: Sequence[str], images: Sequence[np.ndarray]) -> List[float]:
        """Per-pair CLIP scores for (prompt, (H,W,3) uint8 image) pairs."""
        ids = self._tokenize(prompts)
        te = np.asarray(self._jit_text(self.text_params, jnp.asarray(ids)))
        px = self.vision.preprocess(jnp.asarray(np.stack(images)))
        ie = np.asarray(self._jit_vision(self.vision_params, px))
        te = te / (np.linalg.norm(te, axis=-1, keepdims=True) + 1e-8)
        ie = ie / (np.linalg.norm(ie, axis=-1, keepdims=True) + 1e-8)
        cos = (te * ie).sum(-1)
        return [float(100.0 * max(0.0, c)) for c in cos]


def clip_score(prompts: Sequence[str], images: Sequence[np.ndarray],
               snapshot: Optional[str] = None) -> float:
    """Mean CLIP score over the batch (the reference's reported metric)."""
    scorer = ClipScorer(snapshot=snapshot)
    return float(np.mean(scorer.score(prompts, images)))
