"""Block-cache tests: splice semantics, hit counters, classifier training.

The reference has no tests for its CacheManager (SURVEY.md section 4); these
pin the TPU rebuild's contract: cache with an always-recompute decision is
bit-identical to cache-off, reuse decisions splice cached outputs, and
max_hits forces refresh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sduss_tpu.config import Config, ModelConfig, SchedulerConfig
from sduss_tpu.pipelines import build_pipeline
from sduss_tpu.request import Request, SamplingParams, Stage


def make_pipe(cache_enabled=False, mse_threshold=0.01, max_hits=4, min_level=0):
    config = Config()
    config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
    config.scheduler = SchedulerConfig(use_mixed_resolution=True, patch_size=256)
    config.cache.enabled = cache_enabled
    config.cache.mse_threshold = mse_threshold
    config.cache.max_hits = max_hits
    config.cache.min_level = min_level
    return build_pipeline(config)


def make_reqs(n=2, res=512, steps=4):
    reqs = [
        Request(f"r{i}", SamplingParams(prompt=f"p{i}", resolution=res,
                                        num_inference_steps=steps, seed=i))
        for i in range(n)
    ]
    return reqs


def run_denoise(pipe, reqs, steps):
    pipe.prepare(reqs)
    for r in reqs:
        r.stage = Stage.DENOISING
    for _ in range(steps):
        by_res = {}
        for r in reqs:
            by_res.setdefault(r.resolution, []).append(r)
        pipe.denoise_step_mixed(by_res)
    return [np.asarray(r.latents) for r in reqs]


class TestBlockCache:
    def test_always_recompute_matches_cache_off(self):
        base = run_denoise(make_pipe(cache_enabled=False), make_reqs(), 3)
        # negative threshold => every patch recomputes every step
        cached = run_denoise(
            make_pipe(cache_enabled=True, mse_threshold=-1.0), make_reqs(), 3)
        for a, b in zip(base, cached):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_full_reuse_diverges_but_finite(self):
        base = run_denoise(make_pipe(cache_enabled=False), make_reqs(), 3)
        cached = run_denoise(
            make_pipe(cache_enabled=True, mse_threshold=1e9, max_hits=100),
            make_reqs(), 3)
        assert all(np.isfinite(c).all() for c in cached)
        # reusing stale block outputs must actually change the trajectory
        assert any(np.abs(a - b).max() > 1e-6 for a, b in zip(base, cached))

    def test_hits_counter_and_forced_recompute(self):
        pipe = make_pipe(cache_enabled=True, mse_threshold=1e9, max_hits=2)
        reqs = make_reqs(n=1, steps=6)
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        hits_seen = []
        for _ in range(5):
            pipe.denoise_step_mixed({reqs[0].resolution: reqs})
            key = next(iter(reqs[0].cache_rows))
            hits_seen.append(int(np.asarray(reqs[0].cache_rows[key]["hits"]).max()))
        # hits: step1 fresh(0), then 1, 2, forced fresh(0), 1
        assert hits_seen[0] == 0
        assert max(hits_seen) == 2
        assert 0 in hits_seen[3:]

    def test_state_rows_follow_membership_changes(self):
        pipe = make_pipe(cache_enabled=True, mse_threshold=0.5)
        reqs = make_reqs(n=3, steps=6)
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        all_by_res = {reqs[0].resolution: reqs}
        pipe.denoise_step_mixed(all_by_res)
        # drop request 1 from the batch; remaining rows must still line up
        sub = {reqs[0].resolution: [reqs[0], reqs[2]]}
        pipe.denoise_step_mixed(sub)
        for r in (reqs[0], reqs[2]):
            for entry in r.cache_rows.values():
                assert np.isfinite(np.asarray(entry["out"], np.float32)).all()


class TestClassifierTraining:
    def test_fit_logistic_separable(self):
        from sduss_tpu.cache.train import fit_logistic

        rng = np.random.default_rng(0)
        x = rng.normal(size=(400, 2))
        y = (x[:, 0] > 0.3).astype(np.float64)
        w = fit_logistic(x, y)
        pred = (x @ w[:-1] + w[-1]) > 0
        assert (pred == y.astype(bool)).mean() > 0.95

    def test_collect_and_fit(self, tmp_path):
        from sduss_tpu.cache.train import collect_traces, fit_classifiers

        pipe = make_pipe(cache_enabled=True)
        reqs = make_reqs(n=2, steps=4)
        data = collect_traces(pipe, reqs, steps=4)
        assert data, "no trace rows collected"
        out = fit_classifiers(data, reuse_threshold=0.01,
                              out_path=str(tmp_path / "clf.npz"))
        assert set(out) == set(data)
        loaded = np.load(tmp_path / "clf.npz")
        for k in out:
            assert loaded[k].shape == (4,)

    def test_trained_classifier_loads_into_cache(self, tmp_path):
        from sduss_tpu.cache.manager import BlockCache

        path = str(tmp_path / "clf.npz")
        np.savez(path, **{"mid": np.asarray([10.0, 0.0, 0.0, -0.05])})
        cfg = make_pipe().config.cache
        cfg.classifier_path = path
        bc = BlockCache(cfg)
        assert "mid" in bc.classifiers


class TestDeepReuse:
    """Temporal deep-block reuse (cache mode 'deep'): the static-shape
    exploitation of the reference cache's temporal redundancy."""

    def _pipe(self, interval=2):
        from sduss_tpu.config import Config, ModelConfig, SchedulerConfig
        from sduss_tpu.pipelines import build_pipeline

        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=False)
        config.cache.enabled = True
        config.cache.mode = "deep"
        config.cache.deep_interval = interval
        return build_pipeline(config)

    def _run(self, pipe, steps=4, n=2):
        reqs = make_reqs(n=n, res=256, steps=steps)
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        for _ in range(steps):
            pipe.denoise_step({256: reqs})
        return reqs

    def test_interval_1_matches_cache_off(self):
        """deep_interval=1 => every step full => identical to baseline."""
        reqs = self._run(self._pipe(interval=1))
        base = run_denoise(make_pipe(cache_enabled=False), make_reqs(res=256), 4)
        # NOTE: run_denoise uses the mixed path; rerun dense baseline instead
        pipe0 = make_pipe(cache_enabled=False)
        reqs0 = make_reqs(n=2, res=256, steps=4)
        pipe0.prepare(reqs0)
        for r in reqs0:
            r.stage = Stage.DENOISING
        for _ in range(4):
            pipe0.denoise_step({256: reqs0})
        for a, b in zip(reqs, reqs0):
            np.testing.assert_allclose(np.asarray(a.latents),
                                       np.asarray(b.latents), atol=1e-5)

    def test_shallow_steps_used_and_finite(self):
        pipe = self._pipe(interval=2)
        reqs = self._run(pipe, steps=5)
        # ages cycle 0 (full), 1 (shallow), 0, 1, 0
        assert all(np.isfinite(np.asarray(r.latents)).all() for r in reqs)
        assert all(r.deep_state is not None for r in reqs)

    def test_shallow_result_tracks_full(self):
        pipe = self._pipe(interval=3)
        reqs = self._run(pipe, steps=6)
        pipe0 = make_pipe(cache_enabled=False)
        reqs0 = make_reqs(n=2, res=256, steps=6)
        pipe0.prepare(reqs0)
        for r in reqs0:
            r.stage = Stage.DENOISING
        for _ in range(6):
            pipe0.denoise_step({256: reqs0})
        for a, b in zip(reqs, reqs0):
            x = np.asarray(a.latents, np.float32)
            y = np.asarray(b.latents, np.float32)
            err = np.abs(x - y).mean() / (np.abs(y).mean() + 1e-8)
            assert err < 0.5, f"deep reuse drifted too far: {err}"


class TestDeepAdaptive:
    """Drift-triggered adaptive deep refresh (CacheConfig.deep_adaptive):
    full passes fire on measured latent drift instead of a fixed interval
    (the trajectory-level analog of the reference's learned cache gates,
    cache_manager.py:101-191)."""

    def _pipe(self, threshold, max_interval=4, warmup=1):
        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True,
                                   dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=False)
        config.cache.enabled = True
        config.cache.mode = "deep"
        config.cache.deep_adaptive = True
        config.cache.deep_drift_threshold = threshold
        config.cache.deep_max_interval = max_interval
        config.cache.deep_warmup = warmup
        return build_pipeline(config)

    def _run_counting(self, pipe, steps, n=2, res=256):
        reqs = make_reqs(n=n, res=res, steps=steps)
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        fulls = 0
        for _ in range(steps):
            pipe.denoise_step({res: reqs})
            fulls += int(all(r.deep_age == 0 for r in reqs))
        return reqs, fulls

    def test_negative_threshold_matches_cache_off(self):
        """threshold < 0 => drift always exceeds => every step full =>
        bit-identical to the cache-off baseline."""
        reqs, fulls = self._run_counting(self._pipe(threshold=-1.0), steps=4)
        assert fulls == 4
        pipe0 = make_pipe(cache_enabled=False)
        reqs0 = make_reqs(n=2, res=256, steps=4)
        pipe0.prepare(reqs0)
        for r in reqs0:
            r.stage = Stage.DENOISING
        for _ in range(4):
            pipe0.denoise_step({256: reqs0})
        for a, b in zip(reqs, reqs0):
            np.testing.assert_allclose(np.asarray(a.latents),
                                       np.asarray(b.latents), atol=1e-5)

    def test_huge_threshold_hits_max_interval_cap(self):
        """threshold -> inf: fulls only from warmup + the safety cap, i.e.
        the fixed-interval schedule at deep_max_interval."""
        steps, cap, warmup = 8, 3, 1
        reqs, fulls = self._run_counting(
            self._pipe(threshold=1e9, max_interval=cap, warmup=warmup),
            steps=steps)
        # step 0 full (warmup/no state), then full every `cap` steps:
        # ages 0,1,2,0,1,2,0,1 -> fulls at steps 0,3,6
        assert fulls == 3
        assert all(np.isfinite(np.asarray(r.latents)).all() for r in reqs)

    def test_drift_state_lifecycle(self):
        """Shallow steps enqueue device drift scalars; full passes reset
        the reference latent and pending queue."""
        pipe = self._pipe(threshold=1e9, max_interval=4, warmup=1)
        reqs = make_reqs(n=2, res=256, steps=6)
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        pipe.denoise_step({256: reqs})            # full (warmup)
        assert all(r.lat_ref is not None for r in reqs)
        assert all(not r.drift_pending for r in reqs)
        pipe.denoise_step({256: reqs})            # shallow
        assert all(len(r.drift_pending) == 1 for r in reqs)
        # polling consumes the pending scalar and records a real drift
        # (the poll never blocks on an in-flight step, so force completion
        # first to make the test deterministic)
        for r in reqs:
            jax.block_until_ready(r.drift_pending[-1])
            exceeded = pipe._drift_exceeds(r)
            assert not exceeded                   # threshold 1e9
            assert not r.drift_pending
            assert r.drift_last > 0.0

    def test_adaptive_on_mixed_patch_path(self):
        """Adaptive refresh composes with the mixed patch path: drift
        bookkeeping rides the per-request unpack, full passes reset it."""
        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True,
                                   dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=True,
                                           patch_size=256)
        config.cache.enabled = True
        config.cache.mode = "deep"
        config.cache.deep_adaptive = True
        config.cache.deep_drift_threshold = 1e9
        config.cache.deep_max_interval = 3
        config.cache.deep_warmup = 1
        pipe = build_pipeline(config)
        reqs = make_reqs(n=2, res=512, steps=6)
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        by_res = {512: reqs}
        pipe.denoise_step_mixed(by_res)           # full (warmup)
        assert all(r.lat_ref is not None for r in reqs)
        pipe.denoise_step_mixed(by_res)           # shallow -> drift pending
        assert all(len(r.drift_pending) == 1 for r in reqs)
        pipe.denoise_step_mixed(by_res)           # shallow (age 2)
        pipe.denoise_step_mixed(by_res)           # cap -> full, resets
        assert all(r.deep_age == 0 for r in reqs)
        assert all(not r.drift_pending for r in reqs)
        assert all(np.isfinite(np.asarray(r.latents)).all() for r in reqs)

    def test_moderate_threshold_between_extremes(self):
        """A mid threshold spends fulls where drift is largest: more than
        the cap-only schedule, fewer than all-full, and closer to baseline
        than cap-only."""
        base = self._run_counting(self._pipe(threshold=-1.0), steps=8)[0]
        cap_reqs, cap_fulls = self._run_counting(
            self._pipe(threshold=1e9, max_interval=4), steps=8)
        mid_reqs, mid_fulls = self._run_counting(
            self._pipe(threshold=0.02, max_interval=4), steps=8)
        assert cap_fulls <= mid_fulls <= 8
        err_mid = max(
            np.abs(np.asarray(a.latents) - np.asarray(b.latents)).mean()
            for a, b in zip(mid_reqs, base))
        err_cap = max(
            np.abs(np.asarray(a.latents) - np.asarray(b.latents)).mean()
            for a, b in zip(cap_reqs, base))
        assert err_mid <= err_cap + 1e-7


class TestDeepReuseMixed:
    """Deep reuse through the mixed-resolution patched path."""

    def _pipe(self, interval=2):
        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=True,
                                           patch_size=256)
        config.cache.enabled = True
        config.cache.mode = "deep"
        config.cache.deep_interval = interval
        return build_pipeline(config)

    def _run_mixed(self, pipe, steps=4):
        reqs = make_reqs(n=2, res=512, steps=steps)
        reqs[1] = Request("r1", SamplingParams(prompt="p1", resolution=256,
                                               num_inference_steps=steps, seed=1))
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        for _ in range(steps):
            by_res = {}
            for r in reqs:
                by_res.setdefault(r.resolution, []).append(r)
            pipe.denoise_step_mixed(by_res)
        return reqs

    def test_interval_1_matches_cache_off_mixed(self):
        reqs = self._run_mixed(self._pipe(interval=1))
        pipe0 = make_pipe(cache_enabled=False)
        reqs0 = make_reqs(n=2, res=512, steps=4)
        reqs0[1] = Request("r1", SamplingParams(prompt="p1", resolution=256,
                                                num_inference_steps=4, seed=1))
        pipe0.prepare(reqs0)
        for r in reqs0:
            r.stage = Stage.DENOISING
        for _ in range(4):
            by_res = {}
            for r in reqs0:
                by_res.setdefault(r.resolution, []).append(r)
            pipe0.denoise_step_mixed(by_res)
        for a, b in zip(reqs, reqs0):
            np.testing.assert_allclose(np.asarray(a.latents),
                                       np.asarray(b.latents), atol=1e-5,
                                       err_msg=f"res={a.resolution}")

    def test_shallow_mixed_finite_and_state_rows(self):
        pipe = self._pipe(interval=2)
        reqs = self._run_mixed(pipe, steps=5)
        for r in reqs:
            assert np.isfinite(np.asarray(r.latents)).all()
            n = (r.latent_hw(8) // 32) ** 2
            assert r.deep_state.shape[0] == 2 * n

    def test_path_flip_forces_full(self):
        """A request moving dense -> mixed must not consume a mismatched
        deep feature (layout guard forces a full pass)."""
        pipe = self._pipe(interval=4)
        reqs = make_reqs(n=2, res=512, steps=6)
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        pipe.denoise_step({512: reqs})          # dense full step
        assert reqs[0].deep_state.shape[0] == 2
        pipe.denoise_step_mixed({512: reqs})    # patched: must go full
        n = (reqs[0].latent_hw(8) // 32) ** 2
        assert reqs[0].deep_state.shape[0] == 2 * n
        assert all(np.isfinite(np.asarray(r.latents)).all() for r in reqs)


class TestDeepHybridMixed:
    """Deep x compact hybrid on the MIXED patch path: shallow steps gate
    their pairs image-granularly (gate_compact_images with symmetrized CFG
    pair scores + even caps); full steps write the row caches through."""

    def _pipe(self, fraction, interval=2):
        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=True,
                                           patch_size=256)
        config.cache.enabled = True
        config.cache.mode = "deep"
        config.cache.deep_interval = interval
        config.cache.deep_warmup = 1
        config.cache.deep_compact_fraction = fraction
        return build_pipeline(config)

    def _run_mixed(self, pipe, steps=4, n512=2):
        reqs = make_reqs(n=n512, res=512, steps=steps)
        reqs.append(Request("rx", SamplingParams(prompt="px", resolution=256,
                                                 num_inference_steps=steps,
                                                 seed=7)))
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        for _ in range(steps):
            by_res = {}
            for r in reqs:
                by_res.setdefault(r.resolution, []).append(r)
            pipe.denoise_step_mixed(by_res)
        return reqs

    def test_fraction_1_matches_plain_mixed_deep(self):
        """Full image capacity gates every image: the mixed hybrid must
        reproduce the plain mixed deep trajectory."""
        a = self._run_mixed(self._pipe(1.0), steps=4)

        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=True,
                                           patch_size=256)
        config.cache.enabled = True
        config.cache.mode = "deep"
        config.cache.deep_interval = 2
        config.cache.deep_warmup = 1
        plain = build_pipeline(config)
        b = self._run_mixed(plain, steps=4)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x.latents, np.float32),
                                       np.asarray(y.latents, np.float32),
                                       atol=1e-4, rtol=1e-3)

    def test_half_fraction_runs_and_anchors(self):
        # interval 3, 6 steps: full(warmup), shallow, shallow, full,
        # shallow, shallow — ends on a shallow so splice hits survive the
        # full steps' write-through (which resets them to 0)
        pipe = self._pipe(0.5, interval=3)
        reqs = self._run_mixed(pipe, steps=6, n512=3)
        for r in reqs:
            assert np.isfinite(np.asarray(r.latents, np.float32)).all()
        entries = [e for k, e in pipe._comp_state.items()
                   if k[0] == "unet_hybrid_mixed"]
        assert entries and all(e["anchored"] for e in entries)
        saw_hit = any(int(np.asarray(rows["hits"]).max()) >= 1
                      for e in entries for rows in e["state"].values())
        assert saw_hit, "no patch row ever reused under fraction 0.5"


class TestCompactCacheDense:
    """Dense-path (image-row) top-K compact recompute."""

    def _pipe(self, fraction, threshold=0.01):
        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        config.scheduler = SchedulerConfig()
        config.cache.enabled = True
        config.cache.mode = "compact"
        config.cache.compact_fraction = fraction
        config.cache.mse_threshold = threshold
        config.cache.min_level = 0
        return build_pipeline(config)

    def _run(self, pipe, reqs, steps):
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        for _ in range(steps):
            by_res = {}
            for r in reqs:
                by_res.setdefault(r.resolution, []).append(r)
            pipe.denoise_step(by_res)
        return [np.asarray(r.latents) for r in reqs]

    def test_full_capacity_matches_cache_off(self):
        base_pipe = Config()
        base_pipe.model = ModelConfig(model="sd15", test_tiny=True,
                                      dtype="float32")
        base = self._run(build_pipeline(base_pipe), make_reqs(), 3)
        compact = self._run(self._pipe(fraction=1.0), make_reqs(), 3)
        for a, b in zip(base, compact):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)

    def test_half_capacity_reuses_and_finite(self):
        pipe = self._pipe(fraction=0.5)
        reqs = make_reqs(n=3, steps=5)
        self._run(pipe, reqs, 4)
        for r in reqs:
            assert np.isfinite(np.asarray(r.latents)).all()
        # dense-path row state lives per batch composition on the store
        (entry,) = pipe._comp_state.values()
        assert entry["anchored"]
        hits = max(int(np.asarray(rows["hits"]).max())
                   for rows in entry["state"].values())
        assert hits >= 1

    def test_fresh_composition_anchors_before_splicing(self):
        """A fresh composition's first step runs the full-capacity SYNC
        program: fraction 0.5's first step must equal cache-off exactly
        (before anchoring, half the rows spliced the zero out rows)."""
        base_cfg = Config()
        base_cfg.model = ModelConfig(model="sd15", test_tiny=True,
                                     dtype="float32")
        base = self._run(build_pipeline(base_cfg), make_reqs(), 1)
        compact = self._run(self._pipe(fraction=0.5), make_reqs(), 1)
        for a, b in zip(base, compact):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


class TestCompactCachePatched:
    """Patch-path compact recompute: whole drift-ranked images gathered per
    resolution class into a static canonical sub-composition
    (cache.manager.gate_compact_images + ops.patching.compact_submeta)."""

    def _pipe(self, fraction, threshold=0.01, min_level=0):
        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=True,
                                           patch_size=256)
        config.cache.enabled = True
        config.cache.mode = "compact"
        config.cache.compact_fraction = fraction
        config.cache.mse_threshold = threshold
        config.cache.min_level = min_level
        return build_pipeline(config)

    def _mixed_reqs(self, steps=4):
        reqs = make_reqs(n=2, res=512, steps=steps)
        reqs[1] = Request("r1", SamplingParams(prompt="p1", resolution=256,
                                               num_inference_steps=steps,
                                               seed=1))
        return reqs

    def test_full_capacity_matches_cache_off(self):
        # full capacity recomputes every row each step == cache off exactly
        base = run_denoise(make_pipe(cache_enabled=False), self._mixed_reqs(), 3)
        compact = run_denoise(self._pipe(fraction=1.0), self._mixed_reqs(), 3)
        for a, b in zip(base, compact):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)

    def test_half_capacity_reuses_and_finite(self):
        pipe = self._pipe(fraction=0.5)
        reqs = self._mixed_reqs(steps=5)
        run_denoise(pipe, reqs, 4)
        hits = 0
        for r in reqs:
            assert r.cache_rows is not None
            assert np.isfinite(np.asarray(r.latents)).all()
            for key, rows in r.cache_rows.items():
                hits = max(hits, int(np.asarray(rows["hits"]).max()))
        # capacity 1 image per class per step: with one image per class both
        # always recompute; force reuse observability via a 2-image class
        pipe2 = self._pipe(fraction=0.5)
        reqs2 = make_reqs(n=3, res=512, steps=5)
        run_denoise(pipe2, reqs2, 4)
        hits2 = max(int(np.asarray(rows["hits"]).max())
                    for r in reqs2 for rows in r.cache_rows.values())
        assert max(hits, hits2) >= 1

    def test_min_level_leaves_shallow_blocks_ungated(self):
        # min_level=1: level-0 blocks have no cache rows; the patch-compact
        # gate must fall through to plain compute (regression: on-chip
        # bench crashed on state None)
        pipe = self._pipe(fraction=0.5, min_level=1)
        reqs = self._mixed_reqs(steps=4)
        run_denoise(pipe, reqs, 3)
        for r in reqs:
            assert np.isfinite(np.asarray(r.latents)).all()

    def test_mode_flip_block_to_compact(self):
        """block-mode rows share the compact state layout; a mode flip must
        keep running (no shape mismatch, no crash)."""
        pipe_block = make_pipe(cache_enabled=True, mse_threshold=0.01)
        reqs = self._mixed_reqs(steps=6)
        pipe_block.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        by_res = {}
        for r in reqs:
            by_res.setdefault(r.resolution, []).append(r)
        pipe_block.denoise_step_mixed(by_res)
        pipe_c = self._pipe(fraction=0.5)  # same seed => identical params
        pipe_c.denoise_step_mixed(by_res)
        assert all(np.isfinite(np.asarray(r.latents)).all() for r in reqs)


class TestTraceTrainSD3:
    def test_collect_and_fit_token_classifiers(self):
        from sduss_tpu.cache.train import collect_traces, fit_classifiers

        config = Config()
        config.model = ModelConfig(model="sd3", test_tiny=True, dtype="float32",
                                   resolutions=(256, 512))
        config.scheduler = SchedulerConfig(use_mixed_resolution=True)
        config.cache.enabled = True
        pipe = build_pipeline(config)
        reqs = [Request(f"t{i}", SamplingParams(prompt="p", resolution=r,
                                                num_inference_steps=4, seed=i))
                for i, r in enumerate((256, 512))]
        data = collect_traces(pipe, reqs, steps=4)
        assert data, "no token-path trace rows collected"
        assert any(k.startswith("block") for k in data)
        clf = fit_classifiers(data, reuse_threshold=0.01)
        for k, w in clf.items():
            assert w.shape == (4,)


class TestGateCompactImagesUnit:
    def test_surplus_capacity_drops_pad_slots(self):
        """Class capacity beyond a class's real images must scatter nowhere
        (out-of-bounds drop), never corrupt real rows."""
        import jax.numpy as jnp

        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig
        from sduss_tpu.ops import patching
        from sduss_tpu.ops.patch_ctx import PatchContext

        meta = patching.build_meta((2, 2, 2), 8, (16,), (4,))
        # one resolution class bucketed to 4 image slots, 3 real
        (g, ipc), = meta.class_info
        assert ipc == 4
        ctx = PatchContext(meta)
        cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                       compact_fraction=1.0))
        caps = (4,)  # deliberately > 3 real images
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((meta.p_pad, 8, 8, 4)),
                        jnp.float32)
        state = cache.init_rows("k", meta.p_pad, 8, 4, 4, jnp.float32)

        def fn(x_sub, gidx, sel_imgs):
            assert x_sub.shape[0] == 4 * g * g
            return x_sub * 2.0

        y, ns, _ = cache.gate_compact_images(
            "k", x, jnp.zeros((meta.p_pad,)), state, fn, ctx, caps)
        y = np.asarray(y)
        # all 12 real patches recomputed (capacity covers every real image)
        np.testing.assert_allclose(y[:12], 2.0 * np.asarray(x)[:12],
                                   rtol=1e-6)
        # bucket-pad patch rows keep their cached value (zeros)
        np.testing.assert_allclose(y[12:], 0.0)
        hits = np.asarray(ns["hits"])
        assert (hits[:12] == 0).all()          # refreshed
        assert (hits[12:] > 0).all()           # never selected


class TestTwoLevelPatchCompact:
    """Second-level per-patch compaction inside recomputed images
    (CacheConfig.patch_fraction < 1; round-1 verdict item 7 — the
    reference's finest cache granularity, cache_manager.py:101-191)."""

    def _pipe(self, fraction, patch_fraction, min_level=0):
        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=True,
                                           patch_size=256)
        config.cache.enabled = True
        config.cache.mode = "compact"
        config.cache.compact_fraction = fraction
        config.cache.patch_fraction = patch_fraction
        config.cache.min_level = min_level
        return build_pipeline(config)

    def _mixed_reqs(self, steps=5):
        reqs = make_reqs(n=2, res=512, steps=steps)
        reqs[1] = Request("r1", SamplingParams(prompt="p1", resolution=256,
                                               num_inference_steps=steps,
                                               seed=1))
        return reqs

    def test_gate_unit_selected_rows_fresh_others_cached(self):
        import jax.numpy as jnp

        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig
        from sduss_tpu.ops import patching
        from sduss_tpu.ops.patch_ctx import PatchContext

        meta = patching.build_meta((2, 2, 2), 8, (16,), (4,))
        (g, ipc), = meta.class_info
        ctx = PatchContext(meta)
        cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                       compact_fraction=1.0,
                                       patch_fraction=0.5))
        caps = (ipc,)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((meta.p_pad, 8, 8, 4)), jnp.float32)
        state = cache.init_rows("k", meta.p_pad, 8, 4, 4, jnp.float32)

        got = {}

        def fn(x_sub, gidx, sel_imgs, sel):
            got["p_sub"] = int(x_sub.shape[0])
            got["k_q"] = int(sel.shape[0])
            return (x_sub * 2.0)[sel]

        y, ns, stats = cache.gate_compact_images(
            "k", x, jnp.zeros((meta.p_pad,)), state, fn, ctx, caps)
        assert got["k_q"] == max(1, round(got["p_sub"] * 0.5))
        y = np.asarray(y)
        sel_rows = np.asarray(stats["tok_sel"])
        gidx = np.asarray(stats["gather"])
        fresh_global = {int(gidx[s]) for s in sel_rows if gidx[s] >= 0}
        for r in range(12):  # 12 real patch rows
            if r in fresh_global:
                np.testing.assert_allclose(y[r], 2.0 * np.asarray(x)[r], rtol=1e-6)
            else:
                np.testing.assert_allclose(y[r], 0.0)  # cached (zeros)
        hits = np.asarray(ns["hits"])
        assert all(hits[r] == 0 for r in fresh_global)
        assert all(hits[r] > 0 for r in range(12) if r not in fresh_global)

    def test_patch_fraction_one_epsilon_matches_image_granular(self):
        """k_q == all sub rows: the two-level wiring (top-k gather + tail on
        permuted rows + scatter) must reproduce the image-granular result
        exactly — validates the whole unet tok_sel path."""
        reqs_a = self._mixed_reqs()
        reqs_b = self._mixed_reqs()
        a = run_denoise(self._pipe(1.0, 1.0), reqs_a, 3)
        b = run_denoise(self._pipe(1.0, 0.9999), reqs_b, 3)
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=1e-4, rtol=1e-3)

    def test_half_patch_fraction_runs_and_reuses(self):
        pipe = self._pipe(1.0, 0.5)
        reqs = make_reqs(n=3, res=512, steps=6)
        run_denoise(pipe, reqs, 5)
        hits = 0
        for r in reqs:
            assert np.isfinite(np.asarray(r.latents)).all()
            for rows in r.cache_rows.values():
                hits = max(hits, int(np.asarray(rows["hits"]).max()))
        assert hits >= 1  # some patches skipped the tail at least once


class TestTokenFineSD3:
    """Per-TOKEN delta-skip compaction on the MMDiT token path
    (gate_tokens_fine; each token = one 2x2 latent patch — the reference's
    finest SD3 cache granularity, modules/SD3Transformer.py:25-262)."""

    def _pipe(self, patch_fraction):
        config = Config()
        config.model = ModelConfig(model="sd3", test_tiny=True, dtype="float32",
                                   resolutions=(256, 512))
        config.scheduler = SchedulerConfig(use_mixed_resolution=True)
        config.cache.enabled = True
        config.cache.mode = "compact"
        config.cache.compact_fraction = 1.0
        config.cache.patch_fraction = patch_fraction
        return build_pipeline(config)

    def _reqs(self, steps=5):
        return [Request(f"t{i}", SamplingParams(prompt="p", resolution=r,
                                                num_inference_steps=steps,
                                                seed=i))
                for i, r in enumerate((256, 512))]

    def test_gate_unit_delta_skip_semantics(self):
        import jax.numpy as jnp

        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                       patch_fraction=0.5, max_hits=4))
        rng = np.random.default_rng(0)
        B, S, D = 2, 8, 4
        x = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        st = cache.init_token_rows_fine("k", B, S, D, jnp.float32)
        # pre-seed: half the tokens match x exactly (zero drift), rest drift;
        # hits low so nothing is forced
        inp = np.asarray(x).copy()
        inp[:, ::2] += 10.0  # odd-index... even tokens drift hard
        st = {"inp": jnp.asarray(inp), "hits": jnp.zeros((B, S), jnp.int32)}

        seen = {}

        def fn(sel):
            seen["sel"] = np.asarray(sel)
            return ("computed", None)

        out, ns, stats = cache.gate_tokens_fine("k", x, jnp.zeros((B,)), st,
                                                fn, k_t=4)
        sel = seen["sel"]
        assert sel.shape == (B, 4)
        # the drifted (even-index) tokens must be the selected ones
        for b in range(B):
            assert set(sel[b]) == {0, 2, 4, 6}
        hits = np.asarray(ns["hits"])
        for b in range(B):
            assert all(hits[b, s] == 0 for s in sel[b])
            assert all(hits[b, s] == 1 for s in range(S) if s not in sel[b])
        # inp refreshed only at selected tokens
        new_inp = np.asarray(ns["inp"])
        np.testing.assert_allclose(new_inp[:, ::2], np.asarray(x)[:, ::2])
        np.testing.assert_allclose(new_inp[:, 1::2], inp[:, 1::2])

    def test_fraction_one_epsilon_matches_cache_off(self):
        """k_t == S selects every token: the compacted-query attention and
        scatter wiring must reproduce the cache-off trajectory (validates
        _joint_block's tok_sel path end-to-end)."""
        from sduss_tpu.config import Config as _C

        base_cfg = _C()
        base_cfg.model = ModelConfig(model="sd3", test_tiny=True,
                                     dtype="float32", resolutions=(256, 512))
        base_cfg.scheduler = SchedulerConfig(use_mixed_resolution=True)
        base = build_pipeline(base_cfg)
        a = run_denoise(base, self._reqs(), 3)
        b = run_denoise(self._pipe(0.9999), self._reqs(), 3)
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=1e-4, rtol=1e-3)

    def test_half_fraction_runs_and_reuses(self):
        pipe = self._pipe(0.5)
        reqs = self._reqs(steps=6)
        run_denoise(pipe, reqs, 5)
        for r in reqs:
            assert np.isfinite(np.asarray(r.latents)).all()
        # token state lives per batch COMPOSITION on the pipeline store
        # (sd3.py _sd3_state_entry), not per request
        assert len(pipe._sd3_state) == 1
        hits = 0
        for entry in pipe._sd3_state.values():
            for rows in entry["state"].values():
                assert "out" not in rows  # fine state is inp+hits only
                hits = max(hits, int(np.asarray(rows["hits"]).max()))
        assert hits >= 1

    def test_state_store_lru_and_composition_reset(self):
        """A composition change mints a fresh state entry and the LRU bound
        evicts the old one (the HBM guarantee that replaced per-request
        rows after the r2n serving OOM)."""
        pipe = self._pipe(0.5)
        pipe.config.cache.comp_state_lru = 1
        reqs = self._reqs(steps=8)
        run_denoise(pipe, reqs, 2)
        assert len(pipe._sd3_state) == 1
        key0 = next(iter(pipe._sd3_state))
        run_denoise(pipe, reqs[:1], 2)  # composition shrinks
        assert len(pipe._sd3_state) == 1
        assert next(iter(pipe._sd3_state)) != key0
        for r in reqs[:1]:
            assert np.isfinite(np.asarray(r.latents)).all()


class TestGateCompactPairsUnit:
    def test_pair_selection_keeps_cfg_symmetry(self):
        """The pair gate must pick the pair with the highest COMBINED drift
        and recompute BOTH its halves — independent row top-K would split a
        high-drift half from its partner (the measured non-monotonic
        quality at fraction 0.7)."""
        import jax.numpy as jnp

        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                       max_hits=100))
        n, d = 4, 8
        rng = np.random.default_rng(0)
        x = jnp.ones((2 * n, d), jnp.float32)  # unit row power: rel == mse
        inp = np.asarray(x).copy()
        # pair 1: both halves drift moderately (9 + 9 = 18 combined);
        # pair 2: ONE half drifts hard (16 + 0 = 16) — independent top-K
        # would rank row 2 first, the pair gate must not
        inp[1] += 3.0
        inp[n + 1] += 3.0
        inp[2] += 4.0
        st = {"inp": jnp.asarray(inp),
              "out": jnp.asarray(rng.standard_normal((2 * n, d)), jnp.float32),
              "hits": jnp.zeros((2 * n,), jnp.int32)}

        seen = {}

        def fn(x_c, idx):
            seen["idx"] = np.asarray(idx)
            return x_c * 0 + 7.0

        y, ns, _ = cache.gate_compact_pairs("k", x, jnp.zeros(()), st, fn,
                                            n_pairs=1)
        # combined drift: pair1 = 2 moderate halves > pair2 = 1 hard half
        assert set(seen["idx"]) == {1, n + 1}
        y = np.asarray(y)
        assert (y[1] == 7.0).all() and (y[n + 1] == 7.0).all()
        assert (y[2] == np.asarray(st["out"])[2]).all()  # spliced
        hits = np.asarray(ns["hits"])
        assert hits[1] == 0 and hits[n + 1] == 0 and hits[2] == 1

    def test_full_pair_capacity_selects_everything(self):
        import jax.numpy as jnp

        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        cache = BlockCache(CacheConfig(enabled=True, mode="compact",
                                       max_hits=4))
        n, d = 3, 4
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2 * n, d)), jnp.float32)
        st = {"inp": jnp.zeros((2 * n, d), jnp.float32),
              "out": jnp.zeros((2 * n, d), jnp.float32),
              "hits": jnp.zeros((2 * n,), jnp.int32)}
        y, ns, _ = cache.gate_compact_pairs(
            "k", x, jnp.zeros(()), st,
            lambda x_c, idx: x_c, n_pairs=n)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))


class TestDeepHybrid:
    """Deep x compact hybrid (CacheConfig.deep_compact_fraction): shallow
    steps gate their pairs with top-K compact row recompute; full steps
    write the row caches through."""

    def _pipe(self, fraction, interval=3, adaptive=False, pairwise=False):
        from sduss_tpu.config import Config, ModelConfig, SchedulerConfig
        from sduss_tpu.pipelines import build_pipeline

        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=False)
        config.cache.enabled = True
        config.cache.mode = "deep"
        config.cache.deep_interval = interval
        config.cache.deep_warmup = 1
        config.cache.deep_compact_fraction = fraction
        config.cache.deep_compact_pairwise = pairwise
        if adaptive:
            config.cache.deep_adaptive = True
            config.cache.deep_drift_threshold = 0.05
            config.cache.deep_max_interval = 4
        return build_pipeline(config)

    def _run(self, pipe, steps=6, n=2, res=256):
        reqs = make_reqs(n=n, res=res, steps=steps)
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        for _ in range(steps):
            pipe.denoise_step({res: reqs})
        return reqs

    def _run_plain_deep(self, interval, steps=6, n=2, res=256):
        from sduss_tpu.config import Config, ModelConfig, SchedulerConfig
        from sduss_tpu.pipelines import build_pipeline

        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=False)
        config.cache.enabled = True
        config.cache.mode = "deep"
        config.cache.deep_interval = interval
        config.cache.deep_warmup = 1
        pipe = build_pipeline(config)
        return self._run(pipe, steps=steps, n=n, res=res)

    def test_fraction_1_matches_plain_deep(self):
        """Full row capacity selects every row: the hybrid's gather/scatter
        wiring must reproduce the plain deep trajectory exactly."""
        a = self._run(self._pipe(1.0), steps=6)
        b = self._run_plain_deep(interval=3, steps=6)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x.latents),
                                       np.asarray(y.latents), atol=1e-5)

    def test_half_fraction_runs_reuses_and_tracks(self):
        pipe = self._pipe(0.5)
        reqs = self._run(pipe, steps=6)
        for r in reqs:
            assert np.isfinite(np.asarray(r.latents, np.float32)).all()
        # hybrid row state lives per batch composition on the store
        (entry,) = pipe._comp_state.values()
        assert entry["anchored"]
        saw_hit = False
        for rows in entry["state"].values():
            assert rows["inp"].shape[0] == 2 * len(reqs)  # CFG-doubled
            saw_hit |= int(np.asarray(rows["hits"]).max()) >= 1
        assert saw_hit, "no row ever reused under fraction 0.5"

    def test_full_step_write_through_resets_hits(self):
        pipe = self._pipe(0.5, interval=2)
        # steps: 0 full (warmup), 1 shallow, 2 full (interval) ...
        reqs = self._run(pipe, steps=3)
        for r in reqs:
            assert r.deep_age == 0  # last step was full
        (entry,) = pipe._comp_state.values()
        for rows in entry["state"].values():
            assert int(np.asarray(rows["hits"]).max()) == 0

    def test_divergence_bounded_vs_cache_off(self):
        reqs = self._run(self._pipe(0.5), steps=6)
        pipe0 = make_pipe(cache_enabled=False)
        reqs0 = make_reqs(n=2, res=256, steps=6)
        pipe0.prepare(reqs0)
        for r in reqs0:
            r.stage = Stage.DENOISING
        for _ in range(6):
            pipe0.denoise_step({256: reqs0})
        for a, b in zip(reqs, reqs0):
            x = np.asarray(a.latents, np.float32)
            y = np.asarray(b.latents, np.float32)
            err = np.abs(x - y).mean() / (np.abs(y).mean() + 1e-8)
            assert err < 0.5, f"hybrid drifted too far: {err}"

    def test_adaptive_composes_with_hybrid(self):
        pipe = self._pipe(0.5, adaptive=True)
        reqs = self._run(pipe, steps=6)
        assert all(np.isfinite(np.asarray(r.latents)).all() for r in reqs)

    def test_pairwise_fraction_1_matches_plain_deep(self):
        """Full pair capacity selects every pair: the pairwise gate's
        wiring control, mirroring test_fraction_1_matches_plain_deep."""
        a = self._run(self._pipe(1.0, pairwise=True), steps=6)
        b = self._run_plain_deep(interval=3, steps=6)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x.latents),
                                       np.asarray(y.latents), atol=1e-5)

    def test_pairwise_half_fraction_runs(self):
        pipe = self._pipe(0.5, pairwise=True)
        reqs = self._run(pipe, steps=6)
        assert all(np.isfinite(np.asarray(r.latents)).all() for r in reqs)
        (entry,) = pipe._comp_state.values()
        hits = np.concatenate([np.asarray(rows["hits"])
                               for rows in entry["state"].values()])
        assert hits.max() >= 1  # some pair reused
        # CFG symmetry: both halves of each image always share a hit count
        for rows in entry["state"].values():
            h = np.asarray(rows["hits"])
            n = h.shape[0] // 2
            np.testing.assert_array_equal(h[:n], h[n:])


class TestDeepPredict:
    """Reuse-then-predict (CacheConfig.deep_predict): shallow steps feed a
    first-order extrapolation of the deep features instead of holding the
    last full pass's frozen."""

    def _pipe(self, momentum, interval=3, hybrid=None):
        from sduss_tpu.config import Config, ModelConfig, SchedulerConfig
        from sduss_tpu.pipelines import build_pipeline

        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=False)
        config.cache.enabled = True
        config.cache.mode = "deep"
        config.cache.deep_interval = interval
        config.cache.deep_warmup = 1
        config.cache.deep_predict = momentum
        config.cache.deep_compact_fraction = hybrid
        return build_pipeline(config)

    def _run(self, pipe, steps=6, n=2, res=256):
        reqs = make_reqs(n=n, res=res, steps=steps)
        pipe.prepare(reqs)
        for r in reqs:
            r.stage = Stage.DENOISING
        for _ in range(steps):
            pipe.denoise_step({res: reqs})
        return reqs

    def test_momentum_zero_is_plain_reuse(self):
        a = self._run(self._pipe(0.0), steps=6)
        ref = self._run(self._pipe(0.0), steps=6)
        for x, y in zip(a, ref):
            np.testing.assert_allclose(np.asarray(x.latents),
                                       np.asarray(y.latents), atol=1e-6)

    def test_predict_runs_and_sets_slope(self):
        pipe = self._pipe(0.5)
        reqs = self._run(pipe, steps=7)
        for r in reqs:
            assert np.isfinite(np.asarray(r.latents, np.float32)).all()
            # warmup 1 + interval 3 over 7 steps -> at least two full
            # passes with matching layout -> slope exists
            assert r.deep_slope is not None
            assert r.deep_slope.shape == r.deep_state.shape

    def test_predicted_features_extrapolate_linearly(self):
        """_deep_predicted returns deep + m * (age+1) * slope exactly."""
        import jax.numpy as jnp

        pipe = self._pipe(0.5)
        r = make_reqs(n=1, res=256, steps=4)[0]
        r.deep_state = jnp.ones((2, 4, 4, 8), jnp.float32)
        r.deep_slope = 2.0 * jnp.ones((2, 4, 4, 8), jnp.float32)
        r.deep_age = 1
        got = np.asarray(pipe._deep_predicted(r))
        np.testing.assert_allclose(got, 1.0 + 0.5 * 2 * 2.0, atol=1e-6)

    def test_slope_resets_on_layout_change(self):
        import jax.numpy as jnp

        pipe = self._pipe(0.5)
        r = make_reqs(n=1, res=256, steps=4)[0]
        r.deep_state = jnp.ones((2, 4, 4, 8), jnp.float32)
        r.deep_slope = jnp.ones((2, 4, 4, 8), jnp.float32)
        r.deep_age = 0
        pipe._deep_update_slope(r, jnp.ones((2, 8, 8, 8), jnp.float32))
        assert r.deep_slope is None

    def test_predict_composes_with_hybrid(self):
        pipe = self._pipe(0.5, hybrid=0.5)
        reqs = self._run(pipe, steps=7)
        assert all(np.isfinite(np.asarray(r.latents)).all() for r in reqs)
        assert all(r.deep_slope is not None for r in reqs)


class TestCompactPredict:
    """Reuse-then-predict for compact ROW caches (CacheConfig.compact_predict,
    manager._compact_splice): spliced rows feed out + m*(hits+1)*slope;
    slope is measured per row at recompute (gap = hits+1 gated steps) and a
    row's FIRST recompute (zeros init) keeps slope 0 via the seen flag."""

    def _cache(self, m):
        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        return BlockCache(CacheConfig(enabled=True, mode="compact",
                                      max_hits=100, compact_predict=m))

    def test_init_state_gains_slope_and_seen(self):
        c_on = self._cache(0.5)
        c_off = self._cache(0.0)
        st = c_on.init_token_rows("k", 4, 8, 16, ctx_seq=3)
        assert set(st) == {"inp", "out", "hits", "slope", "seen"}
        assert st["slope"]["x"].shape == st["out"]["x"].shape
        assert not bool(np.asarray(st["seen"]).any())
        st0 = c_off.init_token_rows("k", 4, 8, 16)
        assert set(st0) == {"inp", "out", "hits"}
        st1 = c_on.init_rows("k", 4, 8, 3, 5)
        assert "slope" in st1 and "seen" in st1

    def test_spliced_rows_extrapolate(self):
        """Non-selected rows return out + m*(hits+1)*slope; selected rows
        return fresh compute; the stored 'out' stays RAW (the anchor)."""
        import jax.numpy as jnp

        m = 0.5
        cache = self._cache(m)
        n, d = 4, 8
        x = jnp.ones((n, d), jnp.float32)
        inp = np.ones((n, d), np.float32)
        inp[0] += 10.0  # row 0 drifted most -> selected
        st = {"inp": jnp.asarray(inp),
              "out": jnp.full((n, d), 2.0, jnp.float32),
              "slope": jnp.full((n, d), 1.0, jnp.float32),
              "seen": jnp.ones((n,), bool),
              "hits": jnp.asarray([0, 0, 1, 3], jnp.int32)}
        y, ns, _ = cache.gate_compact("k", x, jnp.zeros(()), st,
                                      lambda x_c, idx: x_c * 0 + 7.0, 1)
        y = np.asarray(y)
        assert (y[0] == 7.0).all()                      # fresh
        assert np.allclose(y[2], 2.0 + m * 2 * 1.0)     # hits=1 -> k=2
        assert np.allclose(y[3], 2.0 + m * 4 * 1.0)     # hits=3 -> k=4
        out = np.asarray(ns["out"])
        assert (out[2] == 2.0).all()                    # raw anchor kept
        assert (out[0] == 7.0).all()

    def test_slope_update_gap_and_seen_guard(self):
        """Recomputed rows store slope=(fresh-old)/gap; a first recompute
        (seen=False) stores 0 and flips seen."""
        import jax.numpy as jnp

        cache = self._cache(1.0)
        n, d = 2, 4
        x = jnp.ones((n, d), jnp.float32)
        inp = np.zeros((n, d), np.float32)
        inp[0] += 5.0
        st = {"inp": jnp.asarray(inp),
              "out": jnp.full((n, d), 2.0, jnp.float32),
              "slope": jnp.zeros((n, d), jnp.float32),
              "seen": jnp.asarray([True, False]),
              "hits": jnp.asarray([3, 3], jnp.int32)}
        y, ns, _ = cache.gate_compact("k", x, jnp.zeros(()), st,
                                      lambda x_c, idx: x_c * 0 + 10.0, 2)
        sl = np.asarray(ns["slope"])
        # row 0 seen: (10-2)/(3+1) = 2; row 1 unseen: 0
        assert np.allclose(sl[0], 2.0)
        assert np.allclose(sl[1], 0.0)
        assert bool(np.asarray(ns["seen"]).all())

    def test_pairs_gate_shares_predict_splice(self):
        import jax.numpy as jnp

        m = 1.0
        cache = self._cache(m)
        n, d = 2, 4  # 2 pairs -> 4 rows
        x = jnp.ones((2 * n, d), jnp.float32)
        inp = np.ones((2 * n, d), np.float32)
        inp[0] += 5.0
        inp[n] += 5.0   # pair 0 drifts most
        st = {"inp": jnp.asarray(inp),
              "out": jnp.full((2 * n, d), 1.0, jnp.float32),
              "slope": jnp.full((2 * n, d), 0.5, jnp.float32),
              "seen": jnp.ones((2 * n,), bool),
              "hits": jnp.asarray([0, 1, 0, 1], jnp.int32)}
        y, ns, _ = cache.gate_compact_pairs(
            "k", x, jnp.zeros(()), st, lambda x_c, idx: x_c * 0 + 9.0, 1)
        y = np.asarray(y)
        assert (y[0] == 9.0).all() and (y[n] == 9.0).all()
        assert np.allclose(y[1], 1.0 + m * 2 * 0.5)     # hits=1 -> k=2
        assert "slope" in ns and "seen" in ns

    def test_momentum_zero_state_unchanged_structure(self):
        """compact_predict=0 must not add state keys (no compile-key or HBM
        change for existing deployments)."""
        cache = self._cache(0.0)
        st = cache.init_token_rows("k", 2, 4, 8)
        assert "slope" not in st and "seen" not in st
