"""MMDiT span-skip deep cache (models/mmdit.py _trunk deep_mode).

The cached feature is the residual contribution dx = x_at_hi - x_at_lo of a
contiguous block span (reference DeepCache semantics re-expressed for a
transformer trunk, reference modules/cache_manager.py).  Key property: a
SHALLOW step that splices the delta emitted by a FULL step over the SAME
input reproduces the full output exactly — the splice is an identity at zero
drift, so all shallow-step error comes from latent drift, never the seam.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sduss_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel
from sduss_tpu.utils import random_params


def _mk(num_layers=4, dual=(0, 1)):
    cfg = MMDiTConfig(
        in_channels=4, out_channels=4, num_layers=num_layers, num_heads=2,
        head_dim=16, joint_attention_dim=32, pooled_projection_dim=32,
        pos_embed_max_size=32, dual_attention_layers=dual, sample_size=8,
        pos_embed_base_size=8)
    model = SD3Transformer2DModel(cfg)
    params = random_params(model, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, hw = 2, 8
    lat = jnp.asarray(rng.standard_normal((b, hw, hw, 4)), jnp.float32)
    t = jnp.full((b,), 500.0, jnp.float32)
    ehs = jnp.asarray(rng.standard_normal((b, 7, 32)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((b, 32)), jnp.float32)
    return model, params, (lat, t, ehs, pooled)


@pytest.mark.parametrize("span", [(2, 4), (0, 2), (1, 3)])
@pytest.mark.slow
def test_full_matches_dense_and_shallow_is_exact_at_zero_drift(span):
    model, params, (lat, t, ehs, pooled) = _mk()
    dense = model.apply(params, lat, t, ehs, pooled)
    out_full, deep = model.apply(params, lat, t, ehs, pooled,
                                 deep_mode="full", deep_span=span)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(dense),
                               rtol=0, atol=0)
    assert ("c" in deep) == (span[1] < 4)
    out_sh, deep2 = model.apply(params, lat, t, ehs, pooled,
                                deep_mode="shallow", deep_span=span,
                                deep_state=deep)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_full),
                               rtol=0, atol=1e-5)
    # shallow passes the state through unchanged (lax.cond-compatible carry)
    assert jax.tree.structure(deep2) == jax.tree.structure(deep)


def test_shallow_diverges_at_nonzero_drift_but_tracks():
    model, params, (lat, t, ehs, pooled) = _mk()
    out_full, deep = model.apply(params, lat, t, ehs, pooled,
                                 deep_mode="full", deep_span=(2, 4))
    lat2 = lat + 0.05 * jnp.ones_like(lat)
    ref = model.apply(params, lat2, t, ehs, pooled)
    out_sh, _ = model.apply(params, lat2, t, ehs, pooled,
                            deep_mode="shallow", deep_span=(2, 4),
                            deep_state=deep)
    err = float(jnp.mean((out_sh - ref) ** 2) / jnp.mean(ref**2))
    assert 0 < err < 1.0  # approximate, not garbage


def test_deep_composes_with_fine_token_gate():
    """Hybrid: per-token fine gating on computed blocks, skipped span rows
    pass through untouched so full/shallow share one state structure."""
    from sduss_tpu.cache.manager import BlockCache
    from sduss_tpu.config import CacheConfig

    model, params, (lat, t, ehs, pooled) = _mk()
    # patch_fraction 0.99 -> k_t = seq (every token selected): the fine gate
    # engages (pf < 1.0) but is exact vs dense — isolates the deep seam
    cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                   compact_fraction=1.0, patch_fraction=0.99,
                                   max_hits=4))
    seq = (8 // 2) ** 2
    layout = model.token_cache_layout(seq)
    state = {k: cache.init_token_rows_fine(k, 2, s, d, jnp.float32)
             for k, (s, d) in layout.items()}
    toks = model.embed_latents(params, lat)
    mask = jnp.ones((2, seq), bool)

    out_full, st1, deep = model.apply_tokens(
        params, toks, mask, t, ehs, pooled, cache=cache, cache_state=state,
        deep_mode="full", deep_span=(2, 4))
    dense = model.apply_tokens(params, toks, mask, t, ehs, pooled)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(dense),
                               rtol=0, atol=1e-5)
    out_sh, st2, _ = model.apply_tokens(
        params, toks, mask, t, ehs, pooled, cache=cache, cache_state=st1,
        deep_mode="shallow", deep_span=(2, 4), deep_state=deep)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_full),
                               rtol=0, atol=1e-5)
    assert set(st2) == set(st1)
    # skipped blocks' rows passed through untouched
    for k in ("block2", "block3"):
        np.testing.assert_array_equal(np.asarray(st2[k]["inp"]),
                                      np.asarray(st1[k]["inp"]))
        np.testing.assert_array_equal(np.asarray(st2[k]["hits"]),
                                      np.asarray(st1[k]["hits"]))


def test_span_validation():
    model, params, (lat, t, ehs, pooled) = _mk()
    with pytest.raises(ValueError):
        model.apply(params, lat, t, ehs, pooled, deep_mode="full",
                    deep_span=(3, 9))
    with pytest.raises(ValueError):
        model.apply(params, lat, t, ehs, pooled, deep_mode="shallow",
                    deep_span=(1, 3), deep_state=None)
