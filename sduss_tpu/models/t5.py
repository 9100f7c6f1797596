"""T5 encoder (v1.1 / XXL) in pure functional JAX, for SD3 text conditioning.

The reference vendors transformers' T5EncoderModel
(sduss/model_executor/transformers/models/t5/); rebuilt natively here:
RMS-norm pre-normalization, bias-free linears, shared relative position bias
from the first layer, gated-GELU feed-forward.  Verified against transformers
in tests/test_t5.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sduss_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6


T5_XXL = T5Config()
TINY_T5 = T5Config(vocab_size=1000, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4)


def _relative_position_bucket(relative_position: np.ndarray, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """Bidirectional T5 relative position bucketing (host-side, static)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


class T5EncoderModel:
    def __init__(self, cfg: T5Config):
        self.cfg = cfg

    def init(self, rng) -> dict:
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        keys = iter(jax.random.split(rng, 8 + 8 * cfg.num_layers))
        p: dict = {
            "token_embedding": L.normal_init(next(keys), (cfg.vocab_size, cfg.d_model), std=1.0),
            "relative_attention_bias": L.normal_init(
                next(keys), (cfg.relative_attention_num_buckets, cfg.num_heads), std=0.5),
            "final_layer_norm": L.rms_norm_init(cfg.d_model),
            "layers": [],
        }
        for _ in range(cfg.num_layers):
            p["layers"].append({
                "ln_attn": L.rms_norm_init(cfg.d_model),
                "q": L.linear_init(next(keys), cfg.d_model, inner, bias=False),
                "k": L.linear_init(next(keys), cfg.d_model, inner, bias=False),
                "v": L.linear_init(next(keys), cfg.d_model, inner, bias=False),
                "o": L.linear_init(next(keys), inner, cfg.d_model, bias=False),
                "ln_ff": L.rms_norm_init(cfg.d_model),
                "wi_0": L.linear_init(next(keys), cfg.d_model, cfg.d_ff, bias=False),
                "wi_1": L.linear_init(next(keys), cfg.d_model, cfg.d_ff, bias=False),
                "wo": L.linear_init(next(keys), cfg.d_ff, cfg.d_model, bias=False),
            })
        return p

    def position_bias(self, params, seq_len: int):
        """(1, H, S, S) additive attention bias (shared across layers)."""
        cfg = self.cfg
        ctx = np.arange(seq_len)
        rel = ctx[None, :] - ctx[:, None]
        buckets = _relative_position_bucket(
            rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
        bias = params["relative_attention_bias"][jnp.asarray(buckets)]  # (S, S, H)
        return bias.transpose(2, 0, 1)[None]

    def apply(self, params, input_ids, attention_mask=None):
        """(B, S) ids -> (B, S, d_model) features (final RMS-norm applied)."""
        cfg = self.cfg
        b, s = input_ids.shape
        x = params["token_embedding"][input_ids]
        bias = self.position_bias(params, s).astype(jnp.float32)
        if attention_mask is not None:
            big_neg = jnp.finfo(jnp.float32).min
            bias = bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, big_neg)

        for lyr in params["layers"]:
            h = L.rms_norm(lyr["ln_attn"], x, cfg.layer_norm_eps)
            q = L.linear(lyr["q"], h)
            k = L.linear(lyr["k"], h)
            v = L.linear(lyr["v"], h)
            # T5 uses unscaled dot-product attention (scale folded into init).
            attn = L.attention(q, k, v, cfg.num_heads, scale=1.0, bias=bias)
            x = x + L.linear(lyr["o"], attn)
            h = L.rms_norm(lyr["ln_ff"], x, cfg.layer_norm_eps)
            gate = jax.nn.gelu(L.linear(lyr["wi_0"], h).astype(jnp.float32),
                               approximate=True).astype(x.dtype)
            ff = L.linear(lyr["wo"], gate * L.linear(lyr["wi_1"], h))
            x = x + ff
        return L.rms_norm(params["final_layer_norm"], x, cfg.layer_norm_eps)
