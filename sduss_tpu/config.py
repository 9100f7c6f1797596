"""Typed configuration for the whole framework.

The reference scatters configuration over four dataclasses
(/root/reference/sduss/config.py:12-175), argparse
(sduss/engine/arg_utils.py:13-276), a JSON hyper-parameter file
(sduss/worker/scheduler/configs/esymred.json) and ~10 environment variables
(``SLO``, ``ESYMRED_*``, ``SDUSS_COLLECT_DATA``...).  Here everything lives in
one place, as plain dataclasses that serialize to/from dicts, so engine,
scheduler, dispatcher and kernels share a single source of truth.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, ClassVar, Dict, List, Optional, Sequence, Tuple, Union


def _positive(name: str, value: int) -> None:
    if value < 1:
        raise ValueError(f"{name} must be >= 1, got {value}")


@dataclass
class ModelConfig:
    """Which model family to serve and how to realize it on device.

    Mirrors the reference ``PipelineConfig`` (sduss/config.py:12-55) minus the
    HF-pipeline plumbing: ``model`` is either a registered family name
    ("sd15", "sdxl", "sd3") for random/tiny instantiation, or a path to a
    HuggingFace snapshot directory containing ``model_index.json``.
    """

    model: str = "sd15"
    # Path to a HF snapshot dir; None => randomly initialized weights.
    model_path: Optional[str] = None
    # Compute dtype for the denoiser/encoders ("bfloat16" | "float32").
    dtype: str = "bfloat16"
    # VAE decode dtype: "auto" = bfloat16 on TPU (fp32 has no fast MXU path;
    # bf16 shares fp32's range so the SDXL fp16-overflow issue is moot),
    # float32 elsewhere.
    vae_dtype: str = "auto"
    # Sampler override ("euler" | "flow_match" | "ddim" | "pndm");
    # None => family default.  Stateful multistep samplers (pndm) ride the
    # mixed patch path too (per-patch state slicing is exact — the update
    # is element-wise; pipelines/base.py _sampler_state_to_patches); the
    # one remaining dense fallback is pndm COMBINED WITH a block/deep
    # cache, which shares the step's extra-state slot.
    sampler: Optional[str] = None
    seed: int = 0
    # Use the ESyMReD mixed-resolution patch pipeline (vs plain per-res batch).
    use_patched: bool = True
    # Tiny-model override for tests: scale factor applied to channel widths.
    test_tiny: bool = False
    # Resolutions this deployment accepts; default filled per family.
    resolutions: Tuple[int, ...] = ()
    # Safety checker: None = off; a HF safety_checker/ dir = load weights;
    # "random" = random weights (tests only).
    safety_checker_path: Optional[str] = None
    # Keep text-encoder params in HOST memory and run text encoding on the
    # CPU backend.  Stage-wise residency for HBM-limited chips: the SD3
    # bundle (MMDiT + T5-XXL + CLIP-L/G) nearly fills a 16 GB v5e, leaving
    # no room for step activations (measured ResourceExhausted); encoders
    # are only needed at admission time and their compute is tiny (77/256
    # tokens).  The reference keeps everything resident on 80 GB H100s.
    # "auto" (default) spills the encoders iff the analytic bundle size
    # exceeds SPILL_FRACTION of the accelerator's HBM (resolved to a bool
    # by pipelines.build_pipeline once the device is known: SD3 full-size
    # on a 16 GB v5e -> True; SDXL/SD1.5 and all tiny configs -> False).
    encoders_on_host: Union[bool, str] = "auto"
    # "auto" residency spills encoders when bundle bytes exceed this
    # fraction of device memory (leaves room for step activations).
    SPILL_FRACTION: ClassVar[float] = 0.6
    # Spatially-tiled VAE decode: latent tile edge (0 = full-frame decode).
    # Full-res decode activations are the pipeline HBM peak; the SD3
    # 16-channel VAE at 1024^2 exhausts a 16 GB v5e without tiling
    # (models/vae.py decode_tiled).  "auto" per family in __post_init__:
    # 64 for sd3, off otherwise.
    vae_tile_latent: int = -1
    vae_tile_overlap: int = 16

    def __post_init__(self) -> None:
        if not self.resolutions:
            defaults = {
                "sd15": (256, 512, 768),
                "sdxl": (512, 768, 1024),
                "sd3": (512, 768, 1024),
            }
            fam = self.family
            self.resolutions = tuple(defaults.get(fam, (256, 512)))
        if self.vae_tile_latent < 0:  # auto: tile the HBM-heavy SD3 decode
            self.vae_tile_latent = 64 if (self.family == "sd3"
                                          and not self.test_tiny) else 0

    @property
    def family(self) -> str:
        """Model family key: sd15 | sdxl | sd3."""
        m = self.model.lower()
        for fam in ("sd15", "sdxl", "sd3"):
            if fam in m.replace("-", "").replace("_", "").replace(".", ""):
                return fam
        if os.path.isdir(self.model) or (self.model_path and os.path.isdir(self.model_path)):
            # Inspect model_index.json for the pipeline class.
            root = self.model_path or self.model
            idx = os.path.join(root, "model_index.json")
            if os.path.exists(idx):
                with open(idx) as f:
                    cls = json.load(f).get("_class_name", "")
                if "3" in cls:
                    return "sd3"
                if "XL" in cls:
                    return "sdxl"
                return "sd15"
        raise ValueError(f"Cannot infer model family from {self.model!r}")


@dataclass
class ParallelConfig:
    """Device-mesh layout.

    The reference exposes pp/tp/dp sizes but only DP works
    (sduss/config.py:86-108 raises for tp>1/pp>1).  Here all axes are
    first-class: ``dp`` replicas x ``tp`` tensor-parallel shards x ``sp``
    spatial(patch)-parallel shards, laid out on a ``jax.sharding.Mesh``.
    """

    dp: int = 1
    tp: int = 1
    sp: int = 1  # spatial / displaced-patch parallel degree
    # How a replica's sp>1 sub-mesh runs the serving denoise step:
    #   "gspmd"     — latents sharded under jit; XLA inserts fresh KV
    #                 gathers/halos every step (exact, the default).
    #   "displaced" — shard_map stale-KV path (DistriFuser's latency trick,
    #                 reference distrifuser/utils.py:23-66): after
    #                 ``displaced_warmup`` sync steps the self-attention
    #                 K/V of REMOTE rows come from the previous step's
    #                 state, so the step issues no blocking gather.  KV
    #                 state is carried across engine iterations per
    #                 (resolution, bucket) batch; any batch-composition
    #                 change (admission/finish) is a state boundary and
    #                 re-runs sync warmup steps.  Requires tp == 1 and a
    #                 stateless sampler; the block caches take precedence
    #                 when enabled (pipelines/base.py _displaced_active).
    sp_mode: str = "gspmd"
    displaced_warmup: int = 2  # sync steps after a composition change
    # Pipeline-stage parallel degree.  A WORKING realization exists as
    # parallel/pipeline.py MMDiTStagePipeline (stage-pinned block spans,
    # microbatched device_put transfers; exactness-tested, dryrun-validated)
    # — beyond the reference, whose PP groups are created but dormant
    # (parallel_state.py:62-71).  The serving engine's replicas use
    # GSPMD sp x tp sub-meshes (parallel/replica.py); route a replica
    # through MMDiTStagePipeline when a trunk outgrows per-chip HBM.
    pp: int = 1
    # Explicit device list (indices into jax.devices()); None => first world_size.
    devices: Optional[List[int]] = None

    def __post_init__(self) -> None:
        _positive("dp", self.dp)
        _positive("tp", self.tp)
        _positive("sp", self.sp)
        _positive("pp", self.pp)
        if self.sp_mode not in ("gspmd", "displaced"):
            raise ValueError(f"sp_mode must be gspmd|displaced, got {self.sp_mode!r}")
        if self.sp_mode == "displaced" and self.tp > 1:
            raise ValueError("sp_mode='displaced' runs the denoiser inside "
                             "shard_map over 'sp' only; tp must be 1")
        if self.displaced_warmup < 1:
            raise ValueError("displaced_warmup must be >= 1 (the first step "
                             "after a composition change must gather fresh KV)")

    @property
    def world_size(self) -> int:
        return self.dp * self.tp * self.sp * self.pp


@dataclass
class SchedulerConfig:
    """Worker-side iteration scheduler knobs.

    Mirrors sduss/config.py:125-142 plus the ESyMReD hyper-parameters that the
    reference keeps in esymred.json and env vars.
    """

    policy: str = "fcfs_mixed"  # fcfs_single|fcfs_mixed|orca_resbyres|orca_round_robin|esymred
    max_batch_size: int = 12
    # FUSED multi-step dispatch: when > 1, a stable denoising batch runs up
    # to this many sampler steps inside ONE jitted program (in-graph
    # fori_loop threading latents + cache/span state — the serving analog
    # of bench scan mode) instead of one host dispatch per step.  On real
    # hosts this removes per-step dispatch overhead; through the dev relay
    # it is the difference between RTT-bound (~0.5 s/step cadence at SD3 b2
    # while the device step is ~130 ms, exp/serving_sd3_span_v5e_r2w.json)
    # and device-bound serving.  Scheduling granularity coarsens to the
    # chunk: admissions/aborts act at chunk boundaries (phase_admission
    # already defers admissions to full-pass boundaries, which chunk starts
    # align with).  Per-pipeline support; ineligible configurations
    # (stateful samplers, adaptive deep refresh, stale-KV, mixed batches)
    # transparently fall back to per-step dispatch.
    steps_per_dispatch: int = 1
    # Mixed-resolution patch batching (reference "mixed precision").
    use_mixed_resolution: bool = True
    patch_size: int = 256  # pixels; /8 => 32x32 latent patches
    # ESyMReD knobs (reference esymred.json:1-48). The reference's
    # DISCARD_SLACK sentinel is unnecessary here: aborted requests leave the
    # pool immediately instead of being sorted to the back.
    slo_scale: float = 5.0
    postprocessing_ratio: float = 0.9
    # Path to a trained latency predictor (npz); None => analytic fallback.
    predictor_path: Optional[str] = None
    # EMA weight for the realized-step-time correction: the predictor is
    # fitted on CACHE-OFF profiler steps, but serving runs cache-on (SD3
    # span-skip realized 322 ms vs 972 ms predicted, r2t) — the policy
    # learns a multiplicative correction from executed iterations once the
    # worker's dispatch throttle saturates.  0 disables (tests that assert
    # exact predicted_step_ms values do).
    step_time_ema: float = 0.2
    # Per-(family,resolution) standalone stage latencies in SECONDS used for
    # DDLs (StageProfile tables are seconds, scheduler/profiles.py:17-18),
    # populated by profiling (profiles.py has defaults).
    stage_latency_overrides: Dict[str, Any] = field(default_factory=dict)
    # Max images per VAE-decode call: full-res decode activations are the
    # HBM peak of the whole pipeline (1024^2 x 128ch upsampled maps — batch 8
    # OOMs a 16 GB chip next to the model weights); bigger post batches are
    # chunked.
    decode_batch: int = 2
    # Batch-size buckets used to bound XLA recompilation.
    batch_buckets: Tuple[int, ...] = (1, 2, 4, 8, 12, 16, 24, 32)
    # Patch-count buckets for the mixed-resolution patch batch. Finer steps
    # in the common range: e.g. a (512 + 1024) pair is 20 patches — a
    # 32-bucket would waste 60% of the patch compute.
    patch_buckets: Tuple[int, ...] = (4, 8, 12, 16, 20, 24, 32, 40, 48, 64,
                                      80, 96, 128, 160, 192, 256)

    def __post_init__(self) -> None:
        # The largest bucket is the hard batch ceiling: every stage pads to
        # a bucket, so a policy batch above buckets[-1] would need a
        # negative pad.  Deployments that narrow the bucket list (fewer XLA
        # keys to prewarm) implicitly narrow max_batch_size with it.
        if self.batch_buckets:
            self.max_batch_size = min(self.max_batch_size,
                                      self.batch_buckets[-1])


@dataclass
class CacheConfig:
    """Learned per-block output cache (reference cache_manager.py:22-199)."""

    enabled: bool = False
    # "block": per-patch masked recompute splice (reference semantics);
    # "deep": temporal deep-block reuse — full step every deep_interval
    # steps, shallow steps reuse the cached deep feature (the static-shape
    # TPU exploitation of the same temporal redundancy; REAL compute saving);
    # "compact": top-K compact recompute — each gated block recomputes only
    # the compact_fraction most-drifted rows (static capacity, MoE-style)
    # and reuses cached outputs for the rest.  REAL compute saving with
    # per-row adaptivity; rows must be independent under the block
    # (MMDiT token rows / dense image rows).
    mode: str = "block"
    # Fraction of rows each gated block recomputes in "compact" mode.
    compact_fraction: float = 0.5
    # Second-level per-PATCH fraction inside recomputed images on the mixed
    # patch path (the reference's finest granularity, cache_manager.py:
    # 101-191): within the image-granular sub-composition, only the
    # patch_fraction most-drifted patch rows run the per-token transformer
    # tail (cross-attention + feed-forward + projection); the rest keep
    # their cached pair outputs.  Self-attention/convs/group-norm still run
    # all sub rows, so halos, moments and attention KV stay exact.
    # 1.0 = off (image granularity only).
    patch_fraction: float = 1.0
    # Stale-KV splice for the per-TOKEN fine cache (MMDiT): unselected
    # tokens reuse the PREVIOUS step's attention K/V instead of recomputing
    # them (measured on chip: the fine/compact step saturates ~118 ms at any
    # fraction because to_k/to_v and the full-sequence norm/modulation
    # passes don't scale with the gate — exp/bench_sd3_v5e_r2_compact35
    # .json).  This is DistriFuser's displaced staleness applied temporally
    # per token: exact at patch_fraction 1.0 (every row refreshed every
    # step), approximate below it — the first step of a request (or after a
    # sequence-bucket change) runs a sync program that computes full K/V.
    fine_stale_kv: bool = False
    # LRU bound on the batch-composition row-state stores (base.py
    # _comp_state_entry for the UNet compact/hybrid paths; sd3.py
    # _sd3_state_entry for the MMDiT token path).  Each 1024^2 SD3 fine
    # stale-KV entry is GBs; 1 is the safe setting there next to 5 GB of
    # params, 2 tolerates alternating compositions at smaller footprints.
    comp_state_lru: int = 2
    # Byte budget across retained composition-state entries (count bound
    # alone is HBM-blind — entry size scales with bucket x resolution; two
    # big-bucket SDXL hybrid entries next to full-size params OOMed the
    # r2r prewarm).  The newest entry is always kept.
    comp_state_bytes: float = 3e9
    deep_interval: int = 2
    # Always-full steps at the start of each trajectory (activation drift is
    # largest early in denoising; mirrors DistriFuser's warmup_steps idea).
    deep_warmup: int = 3
    # Drift-triggered adaptive refresh (replaces the fixed interval when
    # True): a request runs a full pass only once its latent has drifted
    # past deep_drift_threshold (relative MSE vs its latent at the last
    # full pass) or deep_max_interval shallow steps have elapsed — the
    # dynamic-granularity analog of the reference's learned per-block
    # cache gates (cache_manager.py:101-191), applied at the trajectory
    # level.  The drift scalar is computed by a separate tiny jit per
    # request (every step program keeps its static signature/compile key)
    # and polled without blocking, so decisions lag the device by at most
    # the bounded dispatch runahead.  Measured frontier (tiny UNet,
    # exp/cache_quality_sdxl_adaptive_tiny.json): threshold 0.03 gives
    # rel_mse 0.0014 at 33% full steps vs 0.0040 at 40% for fixed
    # interval 3 + warmup 3 — strictly better quality at less compute,
    # because drift is timestep-skewed and fulls cluster where they matter.
    deep_adaptive: bool = False
    deep_drift_threshold: float = 0.05
    deep_max_interval: int = 6
    # Deep-phase-aligned admission (serving): the deep cache is
    # batch-synchronized (one full/shallow mode per jitted step), so a newly
    # admitted request — whose warmup forces full passes — degrades the whole
    # batch to cache-off under rolling arrivals.  When True, ESyMReD defers
    # admissions to full-pass boundaries (every full pass refreshes ALL rows'
    # deep features, re-synchronizing the batch); a candidate whose SLO slack
    # cannot afford the wait is admitted immediately (SLO beats cache).
    phase_admission: bool = True
    # ROW-GRANULAR deep WARMUP (plain deep mode, UNet dense path): rows
    # with admission-type needs (no deep feature yet / trajectory warmup /
    # layout flip) are served by a "partial" program — shallow spine for
    # every row plus the deep tail for just the k needy request rows
    # (static bucketed k, CFG-pair symmetric), scattering fresh deep
    # features into the batch carry.  Kills the serving full-step floor:
    # batch-wide "any member needs full" warmup floored realized fulls at
    # ~10% under rolling admissions regardless of interval (i24 == i12 ==
    # 184-186 ms warm step, exp/serving_sdxl_bdy1_i24_v5e_r3u.json).
    # Interval/adaptive EXPIRY stays batch-wide on purpose: one aligned
    # full re-syncs every age and beats staggered per-row refreshes —
    # small-k deep tails run ~1.8x/row less efficiently than the batched
    # tail (chip r4a i24: aligned 177.3 ms vs staggered 201.2 warm step).
    # The static-k analog of the reference's per-patch cache granularity
    # (cache_manager.py:84-99).  Does not compose with the deep x compact
    # hybrid (whose row caches are composition-anchored) — ignored when
    # deep_compact_fraction is set.
    deep_row_warmup: bool = False
    # Deep x compact HYBRID (mode "deep" only): on SHALLOW steps,
    # additionally gate the shallow block pairs (the only blocks a shallow
    # step runs) with top-K compact row recompute — each gated pair
    # recomputes only this fraction of the CFG-doubled image rows (the
    # most-drifted ones, cache/manager.py gate_compact) and splices cached
    # outputs for the rest.  Composes the two redundancy axes the reference
    # exploits separately (temporal deep reuse + per-row drift adaptivity,
    # cache_manager.py:84-191): full steps recompute everything and
    # write-through the row caches, bounding staleness.  None = off;
    # 1.0 = on at full capacity (exactly equal to plain deep mode — the
    # correctness control, tests/test_cache.py).
    deep_compact_fraction: Optional[float] = None
    # Hybrid row selection unit: True = CFG PAIRS (both halves of an image
    # recompute together — odd independent top-K counts break uncond/cond
    # symmetry and the CFG combine amplifies it; cache/manager.py
    # gate_compact_pairs).  Chip A/B: exact perf parity at 0.5, and at 0.3
    # pairwise is both faster (4 vs 5 of 16 rows) and 42% tighter-bounded
    # (exp/bench_sdxl_hybrid0{5,3}_pairwise_v5e.json,
    # cache_quality_sdxl_hybrid_pairwise_b8_tiny.json).
    deep_compact_pairwise: bool = True
    # Reuse-then-PREDICT (arXiv 2505.14741 / TaylorSeer shape): shallow
    # steps feed a first-order extrapolation of the deep features —
    # deep_last + momentum * age * slope, where slope is the per-step
    # feature velocity between the last two full passes — instead of
    # holding them frozen.  0 = plain reuse.  Tiny harness: at the
    # production hybrid schedule momentum 0.5 tightens divergence 16%
    # (0.00338 -> 0.00285) for two extra elementwise ops per step; at
    # fixed intervals the gap is dramatic (interval 3: 0.117 -> 0.0034).
    deep_predict: float = 0.0
    # Reuse-then-predict for COMPACT row caches (gate_compact /
    # gate_compact_pairs + the hybrid write-through): spliced (non-selected)
    # rows feed cached_out + momentum * staleness * slope, where slope is
    # the per-gated-step output velocity measured at each row's last
    # recompute.  Targets the span x compact staleness cliff: with the SD3
    # span-skip cache the in-span token gates only run on FULL steps, so at
    # interval 6 a spliced row is up to 2 fulls = 12 steps stale
    # (rel_mse 0.0179 vs 0.0019 at interval 3,
    # exp/cache_quality_sd3_spancompact_tiny.json).  Costs one extra state
    # copy ("slope") per gated block.  0 = plain splice (no extra state).
    compact_predict: float = 0.0
    # Deep boundary level; None => deepest level + mid.
    deep_boundary: Optional[int] = None
    # SD3/MMDiT SPAN-SKIP deep cache (models/mmdit.py _trunk deep_mode):
    # (lo, hi) block span skipped on shallow steps via the cached residual
    # delta from the last full step; scheduling reuses deep_interval /
    # deep_warmup.  Orthogonal to the token gates — set alongside mode
    # "compact"/patch_fraction for the SD3 deep x fine hybrid, or with the
    # token gates off for pure span-skip (tiny-harness quality: any span at
    # interval 3 ~2.5e-5 rel_mse vs fine-0.5's 1.1e-3,
    # exp/cache_quality_sd3_deepspan_tiny.json).  None = off.
    sd3_deep_span: Optional[Tuple[int, int]] = None
    # Force recompute after this many consecutive cache hits (reference uses
    # 4 for UNet blocks, 2 for the SD3 MMDiT, cache_manager.py:101-191).
    max_hits: int = 4
    # Only gate blocks at resolution level >= this (0 = full latent res);
    # shallow levels cost the most HBM for the least compute saving.
    min_level: int = 1
    # Path to trained per-block classifiers (one npz, sduss_tpu/cache/train.py);
    # None => relative-MSE-threshold fallback.
    classifier_path: Optional[str] = None
    mse_threshold: float = 0.01

    def plain_fixed_deep(self) -> bool:
        """Enabled plain fixed-interval deep reuse — no hybrid rows, no
        adaptive refresh, no reuse-then-predict.  The ONE predicate for
        "does this cache compose with the displaced serving seam" shared
        by pipelines/base.py (_displaced_deep_ok) and scheduler/esymred.py
        (_displaced_defer); two independent mirrors could silently drift
        and the scheduler would defer admissions for a batch the pipeline
        actually serves on the GSPMD path (advisor r3)."""
        return (self.enabled and self.mode == "deep"
                and self.deep_compact_fraction is None
                and not self.deep_adaptive and not self.deep_predict)

    @classmethod
    def production(cls, family: str, serving: bool = True) -> "CacheConfig":
        """Chip-validated cache defaults per model family.

        The configs a user switching from the reference should start from
        (its e2e scripts load family-specific trained caches,
        reference scripts/paper/e2e.sh:32-55):

        - sdxl/sd15: deep reuse x compact CFG-pair rows (fraction 0.3) at
          BOUNDARY 1 (conv-only shallow steps).  Serving keeps a FIXED
          interval — drift-adaptive refresh loses under rolling
          admissions (exp/sim_adaptive_serving.json) — with ROW-GRANULAR
          warmup (deep_row_warmup: admissions/finishes refresh only
          their own rows via partial programs + composition row
          carry-over) at interval 24 for SDXL: chip-clean at qps 1.1
          (100% machine SLO, zero aborts, warm step 143.9 ms =>
          1.85 img/s/chip under load = 4.1x the H100 anchor,
          exp/serving_sdxl_hybrid_i24_rowwarm_v5e_r4d.json; per-program
          costs exp/bench_step_modes_sdxl_hybrid_v5e.json; full-size
          quality at the fixed-24 cadence 7-9e-5,
          exp/cache_quality_sdxl_bdy1_fixed24_full_v5e.json; round-3
          batch-wide-warmup controls: 184.1 ms at interval 12
          exp/serving_sdxl_bdy1_i12_v5e_r3t.json, interval-6/3 and
          bdy-default ladder exp/serving_sdxl_bdy1_i6_v5e_r3n.json +
          _sat_v5e_r3q.json, _v5e_r3h.json, _sat_v5e_r3c.json).
          Offline/aligned batches get the adaptive schedule (threshold
          0.3/cap 30/warmup 1: ONE full step per 30 — 2.7849 img/s =
          6.19x the H100 SDXL anchor on one v5e,
          exp/bench_sdxl_bdy1_w1c30_v5e.json; full-size quality 7.93e-5,
          126x under the bar; adjudication rule in docs/DESIGN.md
          "Cache default adjudication").
        - sd3: wide span-skip 1:24.  Serving keeps interval 16 (26.7 ms =
          2.43x the H100 anchor, rel_mse 0.0008 at 24-block depth;
          chip-clean serving artifact exp/serving_sd3_span_v5e_r2w.json;
          the simulator re-adjudication exp/sim_sd3_serving_interval.json
          shows 16 beats 8/4 at every load).  Offline/aligned batches get
          interval 30 — ONE full step per 30-step trajectory: 19.7 ms =
          3.34x the anchor (exp/bench_sd3_v5e_span124_i30.json), rel_mse
          0.00165 at real depth, 6x under the bar.
        """
        if family == "sd3":
            return cls(enabled=True, mode="deep", sd3_deep_span=(1, 24),
                       deep_interval=16 if serving else 30, deep_warmup=3)
        cfg = cls(enabled=True, mode="deep", deep_interval=12,
                  deep_warmup=3, deep_compact_fraction=0.3,
                  deep_compact_pairwise=True, deep_boundary=1)
        if serving and family == "sdxl":
            # round-4 preset: row-granular warmup lets the interval
            # stretch to 24 (admissions no longer floor realized fulls)
            cfg.deep_interval = 24
            cfg.deep_row_warmup = True
        if serving and family == "sd15":
            # SD1.5 serving: boundary 1 at interval 12 with ROW-GRANULAR
            # warmup — chip-clean at qps 4.0 (warm step 65.7 ms, was 77.9
            # batch-wide; 100% machine SLO, zero aborts, 0.99 img/s
            # delivered per-step,
            # exp/serving_sd15_hybrid_i12_rowwarm_v5e_r4d.json; round-3
            # batch-wide control exp/serving_sd15_bdy1_i12_v5e_r3u.json;
            # full-size quality at the fixed-12 cadence 1.03e-4;
            # interval-3 control exp/serving_sd15_bdy1_v5e_r3s.json).
            cfg.deep_row_warmup = True
        if not serving:
            cfg.deep_adaptive = True
            cfg.deep_drift_threshold = 0.3
            cfg.deep_max_interval = 30
            cfg.deep_warmup = 1
            cfg.deep_predict = 0.5
        return cfg


@dataclass
class EngineConfig:
    """Front-end engine + dispatcher settings (reference config.py:145-175)."""

    dispatcher_policy: str = "greedy"
    # Compile-warm every (resolution x batch-bucket x cache-mode) step
    # program at startup (Engine.prewarm) so no serving request ever hits a
    # cold XLA key.  Opt-in: full-size compiles take minutes per key.
    prewarm: bool = False
    # Max denoise steps the host may dispatch ahead of the device (see
    # engine/worker.py module docstring).  0 disables throttling (the host
    # races arbitrarily far ahead; serving latencies then serialize behind
    # postprocess fetches).  2 hides one sync round-trip while keeping the
    # scheduler's wall-clock slack math honest.
    max_inflight_steps: int = 2
    # Run the prepare stage (text encode + latent init) on a background host
    # thread so it never blocks denoise iterations.  "auto" = async exactly
    # when the encoders live on the HOST (ModelConfig.encoders_on_host):
    # SD3's T5-XXL host encode is ~20 s/batch, and a blocking prepare
    # starved the r2t serving run (denoise began 171 s after first arrival,
    # 75% aborts).  On-device encoders are milliseconds — those stay
    # synchronous and avoid concurrent dispatch entirely.
    async_prepare: Union[bool, str] = "auto"
    # Run VAE decode + image fetch on a background host thread (the mirror
    # of async_prepare for the OUTPUT side): a blocking b8 1024^2 decode is
    # ~2.7 s of device work plus the image download, and it stalls the
    # denoise loop between windows — measured 25-39% of serving makespan at
    # the SDXL chunk6 preset (exp/serving_sdxl_preset_chunk6_v5e_r4g.json).
    # Device-side the decode still serializes with denoise steps on the one
    # compute stream (workspace peak is max, not sum — same as today's
    # bounded-runahead overlap), so "auto" enables it everywhere; one
    # background worker bounds decodes in flight at 1.
    async_postprocess: Union[bool, str] = "auto"
    # Seconds between background engine-loop polls when idle.
    poll_interval_s: float = 0.01
    log_requests: bool = True
    collect_data: bool = False
    collect_dir: str = "outputs"
    # Persistent XLA compilation cache (full-size step compiles are minutes);
    # None disables.
    compilation_cache_dir: Optional[str] = "~/.cache/sduss_tpu_xla"
    # Prewarm bucket-capacity gate: a bucket is SKIPPED (and max_batch_size
    # capped) when params + estimated composition state + this workspace
    # margin exceed device HBM — BEFORE attempting it.  On the axon relay an
    # in-process RESOURCE_EXHAUSTED can poison subsequent device ops (the
    # same failure mode that forced the profiler's subprocess isolation;
    # r2w: the b12 1024^2 hybrid prewarm OOM was caught and capped, yet the
    # probe's next tiny device_put still died RESOURCE_EXHAUSTED), so
    # capacity must be discovered without triggering the OOM.  The margin
    # covers step workspace + decode activations (r2w datapoint: params
    # 6.7 GB + b8 hybrid state ~4 GB fit a 16 GB v5e; b12 ~6 GB did not).
    prewarm_hbm_margin: float = 4e9
    # Cap on auto-enumerated mixed compositions prewarm compiles, ordered
    # by total image count ascending (small batches arrive first under
    # rolling admission).  SD1.5's {256,512,768} space enumerates 309
    # compile keys — ~15 h of relay compiles (measured r3c: ~3 min each);
    # warm-key routing serves the uncapped tail dense while a daemon
    # thread warms it (pipelines/base.py denoise_step_mixed
    # allow_cold=False).  0 = unlimited.
    prewarm_mixed_limit: int = 24
    # Device HBM budget when the runtime exposes no memory_stats (the axon
    # relay does not); v5e = 16 GB.
    hbm_bytes_fallback: float = 16e9
    # Serving-decode capacity gate (pipelines postprocess): the VAE decode
    # runs while OTHER compositions' cache/KV state is resident, so the
    # decode group is capped to what fits next to params + live state.
    # Per-image transient model: bytes_per_pixel x res^2 — the decoder's
    # full-res feature maps dominate (~2 live maps x 128ch bf16 = 512 B/px
    # with blocked mid-attention; dense mid-attention's f32 score matrix
    # would add ~1 GB/image at 1024^2, which is why blocked is the serving
    # default, models/vae.py).
    decode_bytes_per_pixel: float = 768.0
    decode_hbm_margin: float = 1.5e9


@dataclass
class Config:
    """Top-level bundle passed around the system."""

    model: ModelConfig = field(default_factory=ModelConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        return cls(
            model=ModelConfig(**d.get("model", {})),
            parallel=ParallelConfig(**d.get("parallel", {})),
            scheduler=SchedulerConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                                         for k, v in d.get("scheduler", {}).items()}),
            cache=CacheConfig(**d.get("cache", {})),
            engine=EngineConfig(**d.get("engine", {})),
        )


def bucket_for(value: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= value.

    A value above the largest bucket is a scheduling bug (padding it DOWN
    produced a negative-dimension crash mid-serving in round 2):
    SchedulerConfig clamps max_batch_size to buckets[-1], so raise loudly
    if a batch slips past that invariant.
    """
    for b in buckets:
        if value <= b:
            return b
    raise ValueError(
        f"batch of {value} exceeds the largest bucket {buckets[-1]}; "
        "max_batch_size must be <= batch_buckets[-1]")
