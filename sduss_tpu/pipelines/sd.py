"""SD-1.5 pipeline (reference pipeline_stable_diffusion_esymred.py:24-370)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from sduss_tpu.pipelines.base import BasePipeline


class StableDiffusionPipeline(BasePipeline):
    FAMILY = "sd15"

    def encode_conditioning(self, prompts: List[str], negatives: List[str],
                            resolutions: List[int]) -> List[Dict[str, np.ndarray]]:
        tok = self.bundle.tokenizers["tokenizer"]
        ids = np.asarray(tok(prompts, max_length=77, padding="max_length",
                             truncation=True)["input_ids"])
        nids = np.asarray(tok(negatives, max_length=77, padding="max_length",
                              truncation=True)["input_ids"])
        b = len(prompts)
        emb, _ = self._encode_clip("text_encoder", ids, penultimate=False, need_pooled=False)
        nemb, _ = self._encode_clip("text_encoder", nids, penultimate=False, need_pooled=False)
        return [{"embeds": emb[i : i + 1], "neg_embeds": nemb[i : i + 1]} for i in range(b)]

    def denoiser_forward(self, params, latents_in, t, cond, ctx=None,
                         cache=None, cache_state=None, deep_mode=None,
                         deep_state=None, row_valid=None,
                         compact_sync=False, deep_sel=None):
        import jax.numpy as jnp

        # CFG order: [uncond, cond] (reference denoising_step :249-266).
        ehs = jnp.concatenate([cond["neg_embeds"], cond["embeds"]], axis=0)
        return self.bundle.models["unet"].apply(
            params["unet"], latents_in, t, ehs.astype(latents_in.dtype), ctx=ctx,
            cache=cache, cache_state=cache_state, deep_mode=deep_mode,
            deep_state=deep_state,
            deep_boundary=self.config.cache.deep_boundary,
            row_valid=row_valid, compact_sync=compact_sync,
            deep_sel=deep_sel)
