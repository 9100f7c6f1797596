"""Real-weight quality harness: the one command that closes the last
environment-blocked gap the day HF snapshots are available.

The reference validates its caches against TRAINED models (MSE bar 0.01,
reference sduss/model_executor/modules/cache_manager.py:101-191) and ships
COCO CLIP/FID tooling (reference distrifuser/distrifuser/scripts/
compute_metrics.py).  This image is zero-egress, so the rebuild's quality
story is weight-free trajectory divergence (scripts/cache_quality.py) —
this driver keeps the weight-bearing path loaded and executable:

    python scripts/quality_real.py --family sdxl \
        --snapshot /path/to/stable-diffusion-xl-base-1.0 \
        --clip-snapshot /path/to/clip-vit-large-patch14 \
        --steps 30 --n 8 --out exp/quality_real_sdxl.json

It generates the same seeds cache-OFF and at the production cache preset,
reports per-image relative MSE between the two (the reference's own
cache-quality axis, now on real weights) plus the CLIP score of the cached
images, and dumps PNGs for inspection.  ``--tiny`` runs the identical flow
on random tiny weights (no snapshot needed) — the dry-run CI exercises it
(tests/test_quality_real.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser("real-weight quality harness")
    ap.add_argument("--family", default="sdxl",
                    choices=("sd15", "sdxl", "sd3"))
    ap.add_argument("--snapshot", default=None,
                    help="HF snapshot dir (model_index.json + safetensors)")
    ap.add_argument("--clip-snapshot", default=None,
                    help="openai/clip-vit-large-patch14 snapshot for CLIP "
                         "score (omit to skip)")
    ap.add_argument("--prompts-file", default=None,
                    help="one prompt per line (default: a built-in set)")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--resolution", type=int, default=0,
                    help="0 = family default (sdxl/sd3 1024, sd15 512)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="random tiny weights, no snapshot (dry run)")
    ap.add_argument("--dump-dir", default="outputs/quality_real")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if not args.tiny and not args.snapshot:
        ap.error("--snapshot is required (or pass --tiny for the dry run)")

    from sduss_tpu.config import CacheConfig, Config, ModelConfig
    from sduss_tpu.entrypoints.offline import DiffusionPipeline

    res = args.resolution or (512 if args.family == "sd15" else 1024)
    if args.tiny:
        res = min(res, 128)

    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts = [ln.strip() for ln in f if ln.strip()][: args.n]
    else:
        base = ["a photo of an astronaut riding a horse on the moon",
                "a watercolor painting of a fox in a snowy forest",
                "a bowl of ramen on a wooden table, studio lighting",
                "an isometric render of a tiny futuristic city",
                "a golden retriever puppy wearing sunglasses",
                "a lighthouse at dusk, dramatic clouds, oil painting",
                "macro shot of a dew-covered spider web at sunrise",
                "a vintage typewriter surrounded by wildflowers"]
        prompts = (base * ((args.n + len(base) - 1) // len(base)))[: args.n]

    def build(cache_cfg):
        config = Config()
        config.model = ModelConfig(
            model=args.family, model_path=args.snapshot,
            dtype="float32" if args.tiny else "bfloat16",
            test_tiny=args.tiny)
        config.cache = cache_cfg
        return DiffusionPipeline(config=config)

    def run(pipe):
        outs = pipe.generate(prompts, resolution=res,
                             num_inference_steps=args.steps, seed=args.seed)
        return [np.asarray(o.image, np.float32) for o in outs]

    print(f"# generating {len(prompts)} images cache-OFF ...", flush=True)
    ref_imgs = run(build(CacheConfig(enabled=False)))
    print("# generating at the production cache preset ...", flush=True)
    cache_cfg = CacheConfig.production(args.family, serving=False)
    if args.tiny:
        # tiny 2-level UNet: boundary clamps to 1 anyway; keep the preset
        cache_cfg.classifier_path = None
    cached_imgs = run(build(cache_cfg))

    rel = []
    for a, b in zip(ref_imgs, cached_imgs):
        num = float(np.mean((a - b) ** 2))
        den = float(np.mean(a ** 2)) + 1e-8
        rel.append(num / den)
    report = {
        "family": args.family, "n": len(prompts), "steps": args.steps,
        "resolution": res, "tiny_dry_run": bool(args.tiny),
        "cache_rel_mse_mean": float(np.mean(rel)),
        "cache_rel_mse_max": float(np.max(rel)),
        "mse_bar": 0.01,
        "pass": bool(np.max(rel) < 0.01),
    }

    if args.clip_snapshot or args.tiny:
        from sduss_tpu.evaluation.clip_score import ClipScorer

        scorer = ClipScorer(snapshot=args.clip_snapshot, tiny=args.tiny)

        def mean_score(imgs):
            u8 = [np.clip(i, 0, 255).astype(np.uint8) for i in imgs]
            return float(np.mean(scorer.score(prompts, u8)))

        report["clip_score_cached"] = mean_score(cached_imgs)
        report["clip_score_ref"] = mean_score(ref_imgs)

    os.makedirs(args.dump_dir, exist_ok=True)
    try:
        from PIL import Image

        for i, (a, b) in enumerate(zip(ref_imgs, cached_imgs)):
            for tag, img in (("ref", a), ("cached", b)):
                arr = img / 255.0 if img.max() > 1.5 else img
                arr = np.clip(arr, 0.0, 1.0)
                Image.fromarray((arr * 255).astype(np.uint8)).save(
                    os.path.join(args.dump_dir,
                                 f"{args.family}_{i}_{tag}.png"))
        report["dump_dir"] = args.dump_dir
    except Exception as e:  # pragma: no cover - PIL always in image
        report["dump_error"] = str(e)

    out = args.out or f"exp/quality_real_{args.family}.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
