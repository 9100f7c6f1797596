"""Quality evaluation: CLIP score for generated images.

Rebuild of the reference's manual torchmetrics template
(tests/evaluation/clip_score.py:1-17) as a runnable on-device evaluator.
"""

from sduss_tpu.evaluation.clip_score import ClipScorer, clip_score  # noqa: F401
from sduss_tpu.evaluation.fid import clip_fid, fid_from_features, frechet_distance  # noqa: F401
