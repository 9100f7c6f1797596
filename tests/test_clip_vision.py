"""Numerical-fidelity test: our CLIP vision encoder vs transformers', plus
the CLIP-score evaluator path."""

import numpy as np
import pytest

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from sduss_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionModel
from sduss_tpu.models.convert import convert_clip_vision


def _make_pair():
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128, projection_dim=48,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, num_layers=3, num_heads=4,
        intermediate_size=128, projection_dim=48)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_vision(sd, cfg.num_layers)
    return hf, CLIPVisionModel(cfg), params


class TestClipVision:
    def test_matches_transformers(self):
        hf, ours, params = _make_pair()
        rng = np.random.default_rng(0)
        px = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = hf(pixel_values=torch.from_numpy(
                px.transpose(0, 3, 1, 2))).image_embeds.numpy()
        got = np.asarray(ours.apply(params, jnp.asarray(px))["image_embeds"])
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)

    def test_preprocess_shapes(self):
        _, ours, _ = _make_pair()
        imgs = jnp.asarray(
            np.random.default_rng(1).integers(0, 255, (3, 64, 48, 3), np.uint8))
        px = ours.preprocess(imgs)
        assert px.shape == (3, 32, 32, 3)
        assert np.isfinite(np.asarray(px)).all()


class TestClipScore:
    def test_scorer_end_to_end_tiny(self):
        from sduss_tpu.evaluation import ClipScorer

        scorer = ClipScorer(tiny=True)
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
                for _ in range(2)]
        scores = scorer.score(["a cat", "a dog"], imgs)
        assert len(scores) == 2
        assert all(0.0 <= s <= 100.0 for s in scores)


class TestFID:
    def test_identical_distributions_zero(self):
        from sduss_tpu.evaluation.fid import fid_from_features

        rng = np.random.default_rng(0)
        f = rng.normal(size=(256, 16))
        assert abs(fid_from_features(f, f)) < 1e-6

    def test_shifted_distributions_positive_and_ordered(self):
        from sduss_tpu.evaluation.fid import fid_from_features

        rng = np.random.default_rng(1)
        base = rng.normal(size=(512, 8))
        near = rng.normal(size=(512, 8)) + 0.1
        far = rng.normal(size=(512, 8)) + 2.0
        d_near = fid_from_features(base, near)
        d_far = fid_from_features(base, far)
        assert 0 < d_near < d_far

    def test_clip_fid_end_to_end_tiny(self):
        from sduss_tpu.evaluation.fid import clip_fid

        rng = np.random.default_rng(2)
        real = [rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
                for _ in range(8)]
        fake = [rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
                for _ in range(8)]
        d = clip_fid(real, fake)
        assert np.isfinite(d) and d >= 0
