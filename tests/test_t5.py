"""Numerical-fidelity test: our T5 encoder vs transformers' T5EncoderModel."""

import numpy as np
import pytest

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from sduss_tpu.models.t5 import T5Config, T5EncoderModel


def _convert(sd, num_layers):
    def t(w):
        return np.ascontiguousarray(np.asarray(w).T)

    p = {
        "token_embedding": np.asarray(sd["shared.weight"]),
        "relative_attention_bias": np.asarray(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]),
        "final_layer_norm": {"scale": np.asarray(sd["encoder.final_layer_norm.weight"])},
        "layers": [],
    }
    for i in range(num_layers):
        b = f"encoder.block.{i}.layer."
        p["layers"].append({
            "ln_attn": {"scale": np.asarray(sd[b + "0.layer_norm.weight"])},
            "q": {"kernel": t(sd[b + "0.SelfAttention.q.weight"])},
            "k": {"kernel": t(sd[b + "0.SelfAttention.k.weight"])},
            "v": {"kernel": t(sd[b + "0.SelfAttention.v.weight"])},
            "o": {"kernel": t(sd[b + "0.SelfAttention.o.weight"])},
            "ln_ff": {"scale": np.asarray(sd[b + "1.layer_norm.weight"])},
            "wi_0": {"kernel": t(sd[b + "1.DenseReluDense.wi_0.weight"])},
            "wi_1": {"kernel": t(sd[b + "1.DenseReluDense.wi_1.weight"])},
            "wo": {"kernel": t(sd[b + "1.DenseReluDense.wo.weight"])},
        })
    return p


def test_matches_transformers():
    hf_cfg = transformers.T5Config(
        vocab_size=1000, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4,
        feed_forward_proj="gated-gelu", dropout_rate=0.0, is_encoder_decoder=False,
        use_cache=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.T5EncoderModel(hf_cfg).eval()
    cfg = T5Config(vocab_size=1000, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4)
    model = T5EncoderModel(cfg)
    params = _convert({k: v.detach().numpy() for k, v in hf.state_dict().items()}, 2)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, size=(2, 33))
    mask = np.ones((2, 33), np.int64)
    mask[1, 20:] = 0
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state
    out = model.apply(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    got = np.asarray(out)
    # Masked positions differ (HF computes them with mask only in attention);
    # compare the valid region.
    np.testing.assert_allclose(got[0], ref[0].numpy(), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(got[1, :20], ref[1, :20].numpy(), rtol=3e-4, atol=3e-5)
