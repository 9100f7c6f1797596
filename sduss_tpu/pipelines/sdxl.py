"""SDXL pipeline: dual CLIP conditioning + text_time added embeddings.

Reference: pipeline_stable_diffusion_xl_esymred.py (dual text encoders,
add_text_embeds/add_time_ids conditioning, fp32 VAE decode :48-54).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from sduss_tpu.pipelines.base import BasePipeline


class StableDiffusionXLPipeline(BasePipeline):
    FAMILY = "sdxl"

    def encode_conditioning(self, prompts: List[str], negatives: List[str],
                            resolutions: List[int]) -> List[Dict[str, np.ndarray]]:
        tok1 = self.bundle.tokenizers["tokenizer"]
        tok2 = self.bundle.tokenizers["tokenizer_2"]
        b = len(prompts)

        def enc(texts):
            ids1 = np.asarray(tok1(texts, max_length=77, padding="max_length",
                                   truncation=True)["input_ids"])
            ids2 = np.asarray(tok2(texts, max_length=77, padding="max_length",
                                   truncation=True)["input_ids"])
            # Penultimate hidden states from both encoders; pooled from enc 2.
            e1, _ = self._encode_clip("text_encoder", ids1, penultimate=True, need_pooled=False)
            e2, pooled = self._encode_clip("text_encoder_2", ids2, penultimate=True,
                                           need_pooled=True)
            return np.concatenate([e1, e2], axis=-1), pooled

        emb, pooled = enc(prompts)
        nemb, npooled = enc(negatives)

        conds = []
        for i in range(b):
            res = float(resolutions[i])
            # (original_size, crop_top_left, target_size) per SDXL conditioning.
            time_ids = np.asarray([[res, res, 0.0, 0.0, res, res]], np.float32)
            conds.append({
                "embeds": emb[i : i + 1],
                "neg_embeds": nemb[i : i + 1],
                "pooled": pooled[i : i + 1],
                "neg_pooled": npooled[i : i + 1],
                "time_ids": time_ids,
            })
        return conds

    def denoiser_forward(self, params, latents_in, t, cond, ctx=None,
                         cache=None, cache_state=None, deep_mode=None,
                         deep_state=None, row_valid=None,
                         compact_sync=False, deep_sel=None):
        import jax.numpy as jnp

        ehs = jnp.concatenate([cond["neg_embeds"], cond["embeds"]], axis=0)
        pooled = jnp.concatenate([cond["neg_pooled"], cond["pooled"]], axis=0)
        time_ids = jnp.concatenate([cond["time_ids"], cond["time_ids"]], axis=0)
        added = {"text_embeds": pooled.astype(latents_in.dtype), "time_ids": time_ids}
        return self.bundle.models["unet"].apply(
            params["unet"], latents_in, t, ehs.astype(latents_in.dtype),
            added_cond=added, ctx=ctx, cache=cache, cache_state=cache_state,
            deep_mode=deep_mode, deep_state=deep_state,
            deep_boundary=self.config.cache.deep_boundary,
            row_valid=row_valid, compact_sync=compact_sync,
            deep_sel=deep_sel)
