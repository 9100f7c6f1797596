"""CLIP text encoder (pure JAX), matching transformers' CLIPTextModel numerics.

Serves SD-1.5 (CLIP-L), SDXL (CLIP-L + OpenCLIP bigG with projection) and the
two CLIP encoders of SD-3.5.  The reference vendors pass-through subclasses of
transformers' implementation (sduss/model_executor/transformers/models/clip/);
here it is rebuilt natively and verified against transformers in
tests/test_clip.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from sduss_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # "quick_gelu" (CLIP-L) | "gelu" (OpenCLIP bigG)
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    # Non-None => CLIPTextModelWithProjection (SDXL text_encoder_2, SD3 encoders).
    projection_dim: Optional[int] = None


# HF config anchors (text_encoder/config.json of each released checkpoint).
CLIP_L = CLIPTextConfig()  # SD-1.5/SDXL/SD3 text_encoder
CLIP_G = CLIPTextConfig(
    hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
    hidden_act="gelu", projection_dim=1280,
)
CLIP_L_PROJ = dataclasses.replace(CLIP_L, projection_dim=768)
TINY_CLIP = CLIPTextConfig(vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4,
                           intermediate_size=128, projection_dim=64)


class CLIPTextModel:
    def __init__(self, cfg: CLIPTextConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        cfg = self.cfg
        keys = iter(jax.random.split(rng, 16 + 8 * cfg.num_layers))
        p = {
            "token_embedding": L.normal_init(next(keys), (cfg.vocab_size, cfg.hidden_size)),
            "position_embedding": L.normal_init(next(keys), (cfg.max_position_embeddings, cfg.hidden_size)),
            "final_layer_norm": L.layer_norm_init(cfg.hidden_size),
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
        if cfg.projection_dim is not None:
            p["text_projection"] = L.linear_init(next(keys), cfg.hidden_size, cfg.projection_dim, bias=False)
        return p

    def _act(self, x):
        if self.cfg.hidden_act == "quick_gelu":
            return L.quick_gelu(x)
        return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)

    def apply(self, params, input_ids, output_hidden_states: bool = False):
        """Encode token ids (B, 77).

        Returns a dict with:
          last_hidden_state: (B, L, D) after the final LayerNorm
          pooled:            (B, D or projection_dim) EOS-token embedding
                             (projected when the config has a projection head)
          hidden_states:     list of per-layer inputs + final pre-LN state,
                             only when output_hidden_states (hidden_states[-2]
                             is the SDXL/SD3 "penultimate" feature)
        """
        cfg = self.cfg
        b, seq = input_ids.shape
        x = params["token_embedding"][input_ids] + params["position_embedding"][None, :seq]
        # causal mask (True = attend)
        causal = jnp.tril(jnp.ones((seq, seq), bool))[None, None]
        hidden_states = [x] if output_hidden_states else None
        for lyr in params["layers"]:
            h = L.layer_norm(lyr["ln1"], x, cfg.layer_norm_eps)
            attn = L.attention(L.linear(lyr["q"], h), L.linear(lyr["k"], h), L.linear(lyr["v"], h),
                               cfg.num_heads, mask=causal)
            x = x + L.linear(lyr["out"], attn)
            h = L.layer_norm(lyr["ln2"], x, cfg.layer_norm_eps)
            x = x + L.linear(lyr["fc2"], self._act(L.linear(lyr["fc1"], h)))
            if output_hidden_states:
                hidden_states.append(x)
        last = L.layer_norm(params["final_layer_norm"], x, cfg.layer_norm_eps)

        # EOS pooling: first occurrence of the EOS token id.
        is_eos = (input_ids == cfg.eos_token_id).astype(jnp.int32)
        eos_pos = jnp.argmax(is_eos, axis=-1)
        # No EOS found => fall back to the last position.
        eos_pos = jnp.where(is_eos.sum(-1) > 0, eos_pos, seq - 1)
        pooled = jnp.take_along_axis(last, eos_pos[:, None, None], axis=1)[:, 0]
        if "text_projection" in params:
            pooled = L.linear(params["text_projection"], pooled)

        out = {"last_hidden_state": last, "pooled": pooled}
        if output_hidden_states:
            out["hidden_states"] = hidden_states
        return out
