"""Numerical-fidelity test: our CLIP text encoder vs transformers' reference."""

import numpy as np
import pytest

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from sduss_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from sduss_tpu.models.convert import convert_clip


def _make_hf(with_projection: bool):
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=77, hidden_act="quick_gelu",
        # eos != 2: transformers pools at argmax(input_ids) when eos==2 (legacy
        # quirk); real SD checkpoints hit that path only because EOS is the max
        # vocab id, making first-EOS (our semantics) identical.
        eos_token_id=999, bos_token_id=0, pad_token_id=1, projection_dim=48,
    )
    torch.manual_seed(0)
    cls = transformers.CLIPTextModelWithProjection if with_projection else transformers.CLIPTextModel
    return hf_cfg, cls(hf_cfg).eval()


def _ours_from_hf(hf_cfg, hf_model, with_projection: bool):
    cfg = CLIPTextConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers, num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size, hidden_act=hf_cfg.hidden_act,
        eos_token_id=hf_cfg.eos_token_id,
        projection_dim=hf_cfg.projection_dim if with_projection else None,
    )
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = convert_clip(sd, cfg.num_layers)
    return CLIPTextModel(cfg), params


@pytest.mark.parametrize("with_projection", [False, True])
def test_matches_transformers(with_projection):
    hf_cfg, hf = _make_hf(with_projection)
    model, params = _ours_from_hf(hf_cfg, hf, with_projection)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 1000, size=(2, 77))
    ids[:, 0] = 0
    ids[0, 10] = 999  # EOS mid-sequence
    ids[1, 76] = 999
    with torch.no_grad():
        ref = hf(torch.tensor(ids), output_hidden_states=True)
    out = model.apply(params, jnp.asarray(ids), output_hidden_states=True)

    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]), ref.last_hidden_state.numpy(), rtol=2e-4, atol=2e-5)
    pooled_ref = ref.text_embeds if with_projection else ref.pooler_output
    np.testing.assert_allclose(np.asarray(out["pooled"]), pooled_ref.numpy(), rtol=2e-4, atol=2e-5)
    # Penultimate hidden state (SDXL/SD3 conditioning feature).
    np.testing.assert_allclose(
        np.asarray(out["hidden_states"][-2]), ref.hidden_states[-2].numpy(), rtol=2e-4, atol=2e-5)


def test_bf16_runs_and_is_close():
    hf_cfg, hf = _make_hf(False)
    model, params = _ours_from_hf(hf_cfg, hf, False)
    import jax
    params_bf16 = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16)
                               if np.asarray(x).dtype == np.float32 else jnp.asarray(x), params)
    ids = np.full((1, 77), 5, dtype=np.int64)
    ids[0, 0] = 0
    ids[0, 30] = 999
    out32 = model.apply(params, jnp.asarray(ids))
    out16 = model.apply(params_bf16, jnp.asarray(ids))
    diff = np.abs(np.asarray(out16["last_hidden_state"], np.float32)
                  - np.asarray(out32["last_hidden_state"])).mean()
    assert diff < 0.1
