"""Frechet distance between image-feature distributions (FID-style).

The reference vendors DistriFuser's COCO evaluation (distrifuser/scripts/
compute_metrics.py: torchmetrics FID over InceptionV3).  Inception weights
are unavailable in a zero-egress image, so this computes the same Frechet
metric over ANY feature extractor; with the CLIP vision tower
(sduss_tpu/models/clip_vision.py + real weights) it is the published
"CLIP-FID" variant.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^(1/2)) via eigendecomposition."""
    diff = mu1 - mu2
    # sqrtm(S1 @ S2) trace computed from eigenvalues of the product (psd-ish;
    # clip tiny negatives from numerical noise)
    prod = sigma1 @ sigma2
    eigvals = np.linalg.eigvals(prod)
    covmean_trace = np.sum(np.sqrt(np.clip(eigvals.real, 0.0, None)))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * covmean_trace)


def feature_stats(features: np.ndarray):
    """(N, D) features -> (mean, covariance); needs N >= 2 (np.cov divides
    by N-1, so a single sample would yield a silent NaN FID)."""
    features = np.atleast_2d(features)
    if features.shape[0] < 2:
        raise ValueError(
            f"FID needs >= 2 samples per set, got {features.shape[0]}")
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def fid_from_features(real: np.ndarray, fake: np.ndarray) -> float:
    mu1, s1 = feature_stats(np.asarray(real, np.float64))
    mu2, s2 = feature_stats(np.asarray(fake, np.float64))
    return frechet_distance(mu1, s1, mu2, s2)


def clip_fid(real_images: Sequence[np.ndarray], fake_images: Sequence[np.ndarray],
             snapshot: Optional[str] = None, batch: int = 16) -> float:
    """CLIP-FID between two uint8 image sets (needs real CLIP weights for
    meaningful numbers; runs end-to-end with random weights for testing)."""
    import jax.numpy as jnp

    from sduss_tpu.evaluation.clip_score import ClipScorer

    scorer = ClipScorer(snapshot=snapshot, tiny=snapshot is None)

    def embed(images):
        out = []
        for i in range(0, len(images), batch):
            px = scorer.vision.preprocess(jnp.asarray(np.stack(images[i:i + batch])))
            out.append(np.asarray(scorer._jit_vision(scorer.vision_params, px)))
        return np.concatenate(out, axis=0)

    return fid_from_features(embed(list(real_images)), embed(list(fake_images)))
