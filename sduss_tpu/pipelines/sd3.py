"""SD-3.5 pipeline: triple text encoding (CLIP-L + CLIP-G + T5), flow matching.

Reference: pipeline_stable_diffusion_3_esymred.py (three encoders,
PatchSD3Transformer wrap :30-36, flow-match sampler).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from sduss_tpu.config import bucket_for
from sduss_tpu.pipelines.base import BasePipeline, _pad_batch


class StableDiffusion3Pipeline(BasePipeline):
    FAMILY = "sd3"

    T5_SEQ_LEN = 256

    def _encode_t5(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        model = self.bundle.models["text_encoder_3"]
        bb = bucket_for(ids.shape[0], self.config.scheduler.batch_buckets)
        ids = _pad_batch(ids, bb)
        mask = _pad_batch(mask, bb)

        def fn(params, ids, mask):
            return model.apply(params["text_encoder_3"], ids, attention_mask=mask)

        import jax.numpy as jnp

        out = self._jit(("t5", bb), fn)(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out)

    def encode_conditioning(self, prompts: List[str], negatives: List[str],
                            resolutions: List[int]) -> List[Dict[str, np.ndarray]]:
        tok1 = self.bundle.tokenizers["tokenizer"]
        tok2 = self.bundle.tokenizers["tokenizer_2"]
        tok3 = self.bundle.tokenizers["tokenizer_3"]
        b = len(prompts)
        joint_dim = self.bundle.models["transformer"].cfg.joint_attention_dim

        def enc(texts):
            ids1 = np.asarray(tok1(texts, max_length=77, padding="max_length",
                                   truncation=True)["input_ids"])
            ids2 = np.asarray(tok2(texts, max_length=77, padding="max_length",
                                   truncation=True)["input_ids"])
            t3 = tok3(texts, max_length=self.T5_SEQ_LEN, padding="max_length",
                      truncation=True)
            ids3 = np.asarray(t3["input_ids"])
            mask3 = np.asarray(t3["attention_mask"])
            e1, p1 = self._encode_clip("text_encoder", ids1, penultimate=True, need_pooled=True)
            e2, p2 = self._encode_clip("text_encoder_2", ids2, penultimate=True, need_pooled=True)
            e3 = self._encode_t5(ids3, mask3)[: len(texts)]
            clip = np.concatenate([e1, e2], axis=-1)[: len(texts)]
            # Zero-pad CLIP features to the joint (T5) width, then concat seqs.
            pad = joint_dim - clip.shape[-1]
            clip = np.pad(clip, [(0, 0), (0, 0), (0, pad)])
            embeds = np.concatenate([clip, e3], axis=1)
            pooled = np.concatenate([p1, p2], axis=-1)[: len(texts)]
            return embeds.astype(np.float32), pooled.astype(np.float32)

        emb, pooled = enc(prompts)
        nemb, npooled = enc(negatives)
        return [{"embeds": emb[i : i + 1], "neg_embeds": nemb[i : i + 1],
                 "pooled": pooled[i : i + 1], "neg_pooled": npooled[i : i + 1]}
                for i in range(b)]

    def denoiser_forward(self, params, latents_in, t, cond, ctx=None,
                         cache=None, cache_state=None):
        import jax.numpy as jnp

        ehs = jnp.concatenate([cond["neg_embeds"], cond["embeds"]], axis=0)
        pooled = jnp.concatenate([cond["neg_pooled"], cond["pooled"]], axis=0)
        return self.bundle.models["transformer"].apply(
            params["transformer"], latents_in, t, ehs.astype(latents_in.dtype),
            pooled.astype(latents_in.dtype))

    def denoise_step_mixed(self, reqs_by_res):
        """MMDiT mixed-resolution batching pads token sequences instead of
        slicing patches (no convs in the transformer); until the padded-seq
        path lands, group per resolution (still one step per call)."""
        return self.denoise_step(reqs_by_res)
