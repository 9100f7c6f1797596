"""Row-granular deep refresh (CacheConfig.deep_row_warmup; UNet
deep_mode="partial").

The serving deep cache was batch-synchronized: one admission forced FULL
passes for the whole batch over its warmup, flooring realized fulls at
~10% under rolling arrivals regardless of interval
(exp/serving_sdxl_bdy1_i24_v5e_r3u.json: interval 24 == interval 12 ==
184-186 ms warm step).  The partial program runs the shallow spine for
every row and the deep tail for just the k selected request rows
(static bucketed k, CFG-pair symmetric), scattering their fresh deep
features into the batch carry — the TPU static-k analog of the
reference's per-patch cache granularity (reference
cache_manager.py:84-99).

Exactness invariants (dense rows are independent — per-sample GroupNorm
and attention):
  * partial with sel = ALL requests == a full pass (outputs + features);
  * partial with a subset: selected rows == the full pass's rows,
    unselected rows == the shallow pass's rows, and only the selected
    rows' deep features change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sduss_tpu.config import CacheConfig, Config, ModelConfig, SchedulerConfig
from sduss_tpu.models.unet import TINY3_SDXL_UNET, UNet2DConditionModel
from sduss_tpu.pipelines import build_pipeline
from sduss_tpu.request import Request, SamplingParams, Stage


@pytest.fixture(scope="module")
def setup():
    model = UNet2DConditionModel(TINY3_SDXL_UNET)
    params = model.init(jax.random.key(0))
    cfg = model.cfg
    b, hw = 8, cfg.sample_size  # 4 CFG-paired "requests"
    r = np.random.default_rng(0)
    lat = jnp.asarray(r.standard_normal((b, hw, hw, cfg.in_channels)),
                      jnp.float32)
    t = jnp.full((b,), 500.0, jnp.float32)
    ehs = jnp.asarray(0.3 * r.standard_normal((b, 77, cfg.cross_attention_dim)),
                      jnp.float32)
    add_dim, pooled_dim, n_ids = cfg.addition_embed
    added = {"text_embeds": jnp.asarray(
                 0.3 * r.standard_normal((b, pooled_dim)), jnp.float32),
             "time_ids": jnp.ones((b, n_ids), jnp.float32) * 64}
    return model, params, lat, t, ehs, added


class TestPartialModel:
    @pytest.mark.parametrize("bdy", [1, 2])
    def test_sel_all_equals_full(self, setup, bdy):
        model, params, lat, t, ehs, added = setup
        full, feat = model.apply(params, lat, t, ehs, added_cond=added,
                                 deep_mode="full", deep_boundary=bdy)
        sel = jnp.arange(lat.shape[0] // 2, dtype=jnp.int32)
        out, feat_p = model.apply(params, lat, t, ehs, added_cond=added,
                                  deep_mode="partial", deep_boundary=bdy,
                                  deep_state=jnp.zeros_like(feat),
                                  deep_sel=sel)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(feat_p), np.asarray(feat),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("bdy", [1, 2])
    def test_subset_rows_match_full_and_shallow(self, setup, bdy):
        model, params, lat, t, ehs, added = setup
        b = lat.shape[0]
        half = b // 2
        # a stale feature from an earlier timestep seeds the carry
        _, feat_old = model.apply(params, lat * 1.1, t + 100.0, ehs,
                                  added_cond=added, deep_mode="full",
                                  deep_boundary=bdy)
        full, feat_new = model.apply(params, lat, t, ehs, added_cond=added,
                                     deep_mode="full", deep_boundary=bdy)
        shallow, _ = model.apply(params, lat, t, ehs, added_cond=added,
                                 deep_mode="shallow", deep_boundary=bdy,
                                 deep_state=feat_old)
        sel = jnp.asarray([1, 3], jnp.int32)
        out, feat_p = model.apply(params, lat, t, ehs, added_cond=added,
                                  deep_mode="partial", deep_boundary=bdy,
                                  deep_state=feat_old, deep_sel=sel)
        sel2 = [1, 3, half + 1, half + 3]
        rest = [i for i in range(b) if i not in sel2]
        np.testing.assert_allclose(np.asarray(out[sel2, ...]),
                                   np.asarray(full[sel2, ...]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[rest, ...]),
                                   np.asarray(shallow[rest, ...]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(feat_p[sel2, ...]),
                                   np.asarray(feat_new[sel2, ...]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(feat_p[rest, ...]),
                                      np.asarray(feat_old[rest, ...]))

    def test_duplicate_sel_padding_harmless(self, setup):
        model, params, lat, t, ehs, added = setup
        _, feat_old = model.apply(params, lat * 1.1, t + 100.0, ehs,
                                  added_cond=added, deep_mode="full",
                                  deep_boundary=1)
        a = model.apply(params, lat, t, ehs, added_cond=added,
                        deep_mode="partial", deep_boundary=1,
                        deep_state=feat_old,
                        deep_sel=jnp.asarray([2, 2], jnp.int32))
        b = model.apply(params, lat, t, ehs, added_cond=added,
                        deep_mode="partial", deep_boundary=1,
                        deep_state=feat_old,
                        deep_sel=jnp.asarray([2, 2, 2, 2], jnp.int32))
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   rtol=1e-5, atol=1e-5)

    def test_partial_rejects_cache_and_missing_sel(self, setup):
        model, params, lat, t, ehs, added = setup
        with pytest.raises(ValueError):
            model.apply(params, lat, t, ehs, added_cond=added,
                        deep_mode="partial", deep_boundary=1)


# --------------------------------------------------------------------------
# Pipeline threading (_denoise_group_deep mode choice + per-row updates)
# --------------------------------------------------------------------------

def make_pipe(row_warmup, interval=4, warmup=1, adaptive=0.0):
    config = Config()
    config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
    config.scheduler = SchedulerConfig(use_mixed_resolution=False)
    config.cache = CacheConfig(enabled=True, mode="deep",
                               deep_interval=interval, deep_warmup=warmup,
                               deep_adaptive=bool(adaptive),
                               deep_drift_threshold=adaptive or 0.05,
                               deep_max_interval=interval,
                               deep_row_warmup=row_warmup, min_level=0)
    return build_pipeline(config)


def make_reqs(n=3, res=256, steps=10):
    return [Request(f"r{i}", SamplingParams(prompt=f"p{i}", resolution=res,
                                            num_inference_steps=steps,
                                            seed=i))
            for i in range(n)]


def prep(pipe, reqs):
    pipe.prepare(reqs)
    by_res = {}
    for r in reqs:
        r.stage = Stage.DENOISING
        by_res.setdefault(r.resolution, []).append(r)
    return by_res


class TestPartialPipeline:
    def _warmed(self, row_warmup, n=3, steps_run=2):
        pipe = make_pipe(row_warmup)
        reqs = make_reqs(n)
        by_res = prep(pipe, reqs)
        for _ in range(steps_run):  # step0 full (warmup), step1 shallow
            pipe.denoise_step(by_res)
        return pipe, reqs, by_res

    def test_admission_need_routes_partial_expiry_routes_full(self):
        pipe, reqs, by_res = self._warmed(True)
        reqs[0].deep_state = None  # admission-type need
        pipe.denoise_step(by_res)
        assert any(k[:2] == ("denoise_deep", "partial") and k[-1] == 1
                   for k in pipe._fns if isinstance(k, tuple)), \
            sorted(k for k in pipe._fns if isinstance(k, tuple))
        assert reqs[0].deep_age == 0 and reqs[0].deep_state is not None
        assert reqs[1].deep_age == 2 and reqs[2].deep_age == 2
        # interval expiry stays BATCH-wide (aligned fulls beat staggered
        # per-row refreshes on chip — r4a i24): no new partial key, every
        # age re-synced
        n_partial = sum(1 for k in pipe._fns if isinstance(k, tuple)
                        and k[:2] == ("denoise_deep", "partial"))
        reqs[1].deep_age = 99
        pipe.denoise_step(by_res)
        assert all(r.deep_age == 0 for r in reqs)
        assert sum(1 for k in pipe._fns if isinstance(k, tuple)
                   and k[:2] == ("denoise_deep", "partial")) == n_partial

    def test_partial_rows_match_full_and_shallow_runs(self):
        pa, a, by_a = self._warmed(True)
        pb, b, by_b = self._warmed(False)
        pc, c, by_c = self._warmed(False)
        # A: partial refresh of request 0 (admission-type need); B: batch-
        # wide full (legacy behavior on the same need); C: plain shallow.
        a[0].deep_state = None
        b[0].deep_state = None
        pa.denoise_step(by_a)
        pb.denoise_step(by_b)
        pc.denoise_step(by_c)
        np.testing.assert_allclose(np.asarray(a[0].latents, np.float32),
                                   np.asarray(b[0].latents, np.float32),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a[0].deep_state, np.float32),
                                   np.asarray(b[0].deep_state, np.float32),
                                   rtol=1e-4, atol=1e-5)
        for i in (1, 2):
            np.testing.assert_allclose(np.asarray(a[i].latents, np.float32),
                                       np.asarray(c[i].latents, np.float32),
                                       rtol=1e-4, atol=1e-5)

    def test_admission_mid_serving_warms_only_its_rows(self):
        """A request admitted mid-flight is served by partial programs over
        its whole warmup while incumbents stay shallow — the serving fix."""
        pipe, reqs, by_res = self._warmed(True, n=2, steps_run=2)
        ctrl, creqs, by_ctrl = self._warmed(True, n=2, steps_run=2)
        new = make_reqs(n=3)[2:]  # distinct id/seed
        pipe.prepare(new)
        new[0].stage = Stage.DENOISING
        by_res[new[0].resolution].extend(new)
        pipe.denoise_step(by_res)   # new req: state None -> partial
        ctrl.denoise_step(by_ctrl)  # control: stays shallow
        # incumbents unaffected by the admission
        for i in (0, 1):
            np.testing.assert_allclose(
                np.asarray(reqs[i].latents, np.float32),
                np.asarray(creqs[i].latents, np.float32),
                rtol=1e-4, atol=1e-5)
        assert new[0].deep_age == 0 and new[0].deep_state is not None
        # warmup keeps selecting the new row (sampler step < warmup is
        # satisfied already after one step at warmup=1: next steps shallow)
        pipe.denoise_step(by_res)
        assert any(k[:2] == ("denoise_deep", "partial")
                   for k in pipe._fns if isinstance(k, tuple))

    def test_kb_bucketing_pads_with_duplicates(self):
        """Three admission rows bucket to kb=4; the padding slot duplicates
        a needy row (identical scatter values — harmless)."""
        pipe, reqs, by_res = self._warmed(True, n=5)
        for i in (0, 1, 2):
            reqs[i].deep_state = None
        pipe.denoise_step(by_res)  # need=3 -> kb=4
        assert any(k[:2] == ("denoise_deep", "partial") and k[-1] == 4
                   for k in pipe._fns if isinstance(k, tuple))
        ages = [r.deep_age for r in reqs]
        assert ages == [0, 0, 0, 2, 2], ages

    def test_deep_carry_reused_and_invalidated_by_identity(self):
        """The batch-form deep carry is reused across steps for a stable
        composition and dropped when any member's deep_state object was
        replaced outside the carried path (strong-ref identity tokens)."""
        pipe, reqs, by_res = self._warmed(True, n=2, steps_run=2)
        key = next(iter(pipe._deep_carry))
        carry0, _ = pipe._deep_carry[key]
        pipe.denoise_step(by_res)  # shallow: passthrough keeps the carry
        assert pipe._deep_carry_get(key, reqs) is not None
        # external replacement (same values, new object) invalidates
        reqs[0].deep_state = reqs[0].deep_state + 0
        assert pipe._deep_carry_get(key, reqs) is None
        pipe.denoise_step(by_res)  # rebuilds and re-caches
        assert pipe._deep_carry_get(key, reqs) is not None

    def test_all_rows_expired_runs_full(self):
        pipe, reqs, by_res = self._warmed(True)
        for r in reqs:
            r.deep_age = 99
        n_partial = sum(1 for k in pipe._fns
                        if isinstance(k, tuple)
                        and k[:2] == ("denoise_deep", "partial"))
        pipe.denoise_step(by_res)
        assert all(r.deep_age == 0 for r in reqs)
        assert sum(1 for k in pipe._fns if isinstance(k, tuple)
                   and k[:2] == ("denoise_deep", "partial")) == n_partial

    def test_partial_chunk_matches_per_step(self):
        """A k-step PARTIAL chunk (host-scheduled: act=2 batch fulls at
        interval expiry, act=1 admission partials, act=0 shallow —
        _plan_partial_chunk) equals k per-step calls."""
        pa, a, by_a = self._warmed(True, n=2, steps_run=2)
        pb, b, by_b = self._warmed(True, n=2, steps_run=2)
        for reqs in (a, b):
            reqs[0].deep_age = 3  # interval 4: batch full at window step 0
            reqs[1].deep_age = 1
        assert pa.denoise_chunk(by_a, 4), "partial chunk ineligible"
        assert any(k[:2] == ("unet_chunk", "partial")
                   for k in pa._fns if isinstance(k, tuple))
        for _ in range(4):
            pb.denoise_step(by_b)
        for x, y in zip(a, b):
            assert x.remain_steps == y.remain_steps
            assert x.deep_age == y.deep_age, (x.deep_age, y.deep_age)
            np.testing.assert_allclose(np.asarray(x.latents, np.float32),
                                       np.asarray(y.latents, np.float32),
                                       atol=5e-4, rtol=5e-3)
            np.testing.assert_allclose(np.asarray(x.deep_state, np.float32),
                                       np.asarray(y.deep_state, np.float32),
                                       atol=5e-4, rtol=5e-3)

    def test_partial_chunk_admission_mid_window(self):
        """A chunk planned right after an admission warms the new row over
        its in-window warmup steps (state None -> zeros carry -> sel[0])."""
        pipe, reqs, by_res = self._warmed(True, n=2, steps_run=2)
        new = make_reqs(n=3)[2:]
        pipe.prepare(new)
        new[0].stage = Stage.DENOISING
        by_res[new[0].resolution].extend(new)
        assert pipe.denoise_chunk(by_res, 3), "chunk ineligible post-admission"
        assert new[0].deep_state is not None
        assert all(np.isfinite(np.asarray(r.latents, np.float32)).all()
                   for r in reqs + new)

    def _hybrid_pipe(self, fraction=0.5, interval=6):
        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True,
                                   dtype="float32")
        config.scheduler = SchedulerConfig(use_mixed_resolution=False)
        config.cache = CacheConfig(enabled=True, mode="deep",
                                   deep_interval=interval, deep_warmup=1,
                                   deep_compact_fraction=fraction,
                                   deep_row_warmup=True, min_level=0)
        return build_pipeline(config)

    def test_hybrid_admission_partial_with_row_carryover(self):
        """Under deep_row_warmup the hybrid serves admissions on a PARTIAL
        program with composition row CARRY-OVER — no anchoring full: the
        new request's fresh rows (hits = max_hits) are force-selected by
        the gates while incumbents ride their carried caches."""
        pipe = self._hybrid_pipe()
        reqs = make_reqs(3)
        by_res = prep(pipe, reqs)
        for _ in range(3):  # anchoring full + shallows
            pipe.denoise_step(by_res)
        ages_before = [r.deep_age for r in reqs]
        new = make_reqs(n=4)[3:]
        pipe.prepare(new)
        new[0].stage = Stage.DENOISING
        by_res[new[0].resolution].extend(new)
        pipe.denoise_step(by_res)
        assert any(k[:2] == ("denoise_deep_hybrid", "partial")
                   for k in pipe._fns if isinstance(k, tuple)), \
            sorted(k for k in pipe._fns if isinstance(k, tuple))
        # incumbents were NOT dragged through a full (ages advanced)
        assert [r.deep_age for r in reqs] == [a + 1 for a in ages_before]
        assert new[0].deep_age == 0 and new[0].deep_state is not None
        # the new request's row caches were written through on its first
        # gated step (forced selection) — hits reset for both CFG halves
        entry = list(pipe._comp_state.values())[-1]  # newest composition
        key = next(iter(entry["state"]))
        hits = np.asarray(entry["state"][key]["hits"])
        bb = hits.shape[0] // 2
        assert hits[3] == 0 and hits[bb + 3] == 0, hits

    def test_hybrid_finish_shrinks_entry_for_carryover(self):
        """A finish event shrinks the hybrid entry to the survivors'
        rows (evict_finished_state) — the next composition rides it
        without an anchoring full."""
        pipe = self._hybrid_pipe()
        reqs = make_reqs(3)
        by_res = prep(pipe, reqs)
        for _ in range(3):
            pipe.denoise_step(by_res)
        pipe.evict_finished_state([reqs[2].request_id])
        live = (reqs[0].request_id, reqs[1].request_id)
        assert any(k[3] == live for k in pipe._comp_state), \
            list(pipe._comp_state)
        by_res[reqs[0].resolution] = reqs[:2]
        ages_before = [r.deep_age for r in reqs[:2]]
        pipe.denoise_step(by_res)
        # no anchoring full: survivors stayed shallow on carried caches
        assert [r.deep_age for r in reqs[:2]] == \
            [a + 1 for a in ages_before]

    def test_hybrid_partial_chunk_matches_per_step(self):
        """The hybrid partial CHUNK (3-way switch threading the row-cache
        state) equals per-step dispatch: admission partial at j0, aligned
        in-graph full at the expiry, shallows elsewhere."""
        pa = self._hybrid_pipe(interval=4)
        pb = self._hybrid_pipe(interval=4)
        ra, rb = make_reqs(2), make_reqs(2)
        by_a, by_b = prep(pa, ra), prep(pb, rb)
        for _ in range(3):
            pa.denoise_step(by_a)
            pb.denoise_step(by_b)
        ra[0].deep_state = None
        rb[0].deep_state = None
        assert pa.denoise_chunk(by_a, 4), "hybrid partial chunk ineligible"
        assert any(k[:2] == ("unet_chunk", "hybrid_partial")
                   for k in pa._fns if isinstance(k, tuple))
        for _ in range(4):
            pb.denoise_step(by_b)
        for x, y in zip(ra, rb):
            assert x.deep_age == y.deep_age, (x.deep_age, y.deep_age)
            np.testing.assert_allclose(np.asarray(x.latents, np.float32),
                                       np.asarray(y.latents, np.float32),
                                       atol=5e-4, rtol=5e-3)
            np.testing.assert_allclose(np.asarray(x.deep_state, np.float32),
                                       np.asarray(y.deep_state, np.float32),
                                       atol=5e-4, rtol=5e-3)

    def test_hybrid_admission_over_capacity_anchors_full(self):
        """More fresh pairs than gate capacity -> forced selection is no
        longer guaranteed -> the step anchors with a batch-wide full."""
        pipe = self._hybrid_pipe(fraction=0.5)  # bucket 4 -> cap 2 pairs
        reqs = make_reqs(1)
        by_res = prep(pipe, reqs)
        for _ in range(3):
            pipe.denoise_step(by_res)
        new = make_reqs(n=4)[1:]  # 3 fresh pairs > cap 2
        pipe.prepare(new)
        for r in new:
            r.stage = Stage.DENOISING
        by_res[new[0].resolution].extend(new)
        pipe.denoise_step(by_res)
        assert all(r.deep_age == 0 for r in reqs + new)  # full re-synced
        assert not any(k[:2] == ("denoise_deep_hybrid", "partial")
                       for k in pipe._fns if isinstance(k, tuple))
