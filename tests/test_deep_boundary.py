"""UNet deep-cache boundary ladder (CacheConfig.deep_boundary).

The deep cache's boundary level controls how much of the UNet a SHALLOW
step recomputes: levels < boundary run, everything deeper resumes from the
cached deep feature (the TPU adaptation of the reference's deep block reuse,
reference cache_manager.py:101-191).  boundary=1 caches everything above
level 0 — the shallow step becomes conv-only, the SDXL analog of the SD3
wide-span cache (models/mmdit.py deep_span).

Correctness invariant tested here: a shallow step fed the deep feature
captured by a FULL step on the SAME input reproduces the full step's output
exactly (the recomputed shallow blocks see identical inputs, and the cached
tail output equals what recomputation would give).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sduss_tpu.models.unet import TINY3_SDXL_UNET, UNet2DConditionModel


@pytest.fixture(scope="module")
def setup():
    model = UNet2DConditionModel(TINY3_SDXL_UNET)
    params = model.init(jax.random.key(0))
    cfg = model.cfg
    b, hw = 2, cfg.sample_size
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


class TestDeepBoundary:
    def test_full_matches_plain(self, setup):
        model, params, lat, t, ehs, added = setup
        plain = model.apply(params, lat, t, ehs, added_cond=added)
        for bdy in (1, 2):
            out, deep = model.apply(params, lat, t, ehs, added_cond=added,
                                    deep_mode="full", deep_boundary=bdy)
            np.testing.assert_allclose(np.asarray(out), np.asarray(plain),
                                       rtol=1e-5, atol=1e-5)
            assert deep is not None

    def test_deep_feature_shape(self, setup):
        model, params, lat, t, ehs, added = setup
        cfg = model.cfg
        hw = lat.shape[1]
        for bdy in (1, 2):
            _, deep = model.apply(params, lat, t, ehs, added_cond=added,
                                  deep_mode="full", deep_boundary=bdy)
            want = (lat.shape[0], hw >> max(bdy - 1, 0),
                    hw >> max(bdy - 1, 0), cfg.block_out_channels[bdy])
            assert deep.shape == want, (bdy, deep.shape, want)

    def test_shallow_fresh_state_exact(self, setup):
        model, params, lat, t, ehs, added = setup
        for bdy in (1, 2):
            full, deep = model.apply(params, lat, t, ehs, added_cond=added,
                                     deep_mode="full", deep_boundary=bdy)
            shallow, deep2 = model.apply(params, lat, t, ehs,
                                         added_cond=added,
                                         deep_mode="shallow",
                                         deep_boundary=bdy, deep_state=deep)
            np.testing.assert_allclose(np.asarray(shallow), np.asarray(full),
                                       rtol=1e-5, atol=1e-5)
            # shallow passes its cached state through unchanged
            np.testing.assert_array_equal(np.asarray(deep2), np.asarray(deep))

    def test_hybrid_layout_boundary1(self, setup):
        """shallow_cache_layout(cells, 1) names exactly the pairs a
        boundary-1 shallow step runs, and the hybrid path executes."""
        from sduss_tpu.cache.manager import BlockCache
        from sduss_tpu.config import CacheConfig

        model, params, lat, t, ehs, added = setup
        hw = lat.shape[1]
        layout = model.shallow_cache_layout(hw, 1)
        # boundary 1, 3 levels: down0 pairs + up2 pairs only, no mid
        assert all(k.startswith(("down0.", "up2.")) for k in layout), layout
        cache = BlockCache(CacheConfig(enabled=True, mode="deep",
                                       deep_compact_fraction=0.5,
                                       max_hits=4))
        state = {key: cache.init_rows(key, lat.shape[0], s, cin, cout,
                                      jnp.float32)
                 for key, (s, cin, cout) in layout.items()}
        full, deep, state = model.apply(params, lat, t, ehs, added_cond=added,
                                        deep_mode="full", deep_boundary=1,
                                        cache=cache, cache_state=state)
        out, _, _ = model.apply(params, lat, t, ehs, added_cond=added,
                                deep_mode="shallow", deep_boundary=1,
                                deep_state=deep, cache=cache,
                                cache_state=state)
        assert out.shape == full.shape


class TestProductionPresets:
    """CacheConfig.production encodes the chip-validated family defaults."""

    def test_sd3_span(self):
        from sduss_tpu.config import CacheConfig

        c = CacheConfig.production("sd3")
        assert c.enabled and c.sd3_deep_span == (1, 24)
        assert c.deep_interval == 16  # serving: chip-clean artifact
        o = CacheConfig.production("sd3", serving=False)
        # offline: one full step per 30 (19.7 ms on chip, rel_mse 0.00165)
        assert o.deep_interval == 30

    def test_sdxl_serving_vs_offline(self):
        from sduss_tpu.config import CacheConfig

        s = CacheConfig.production("sdxl", serving=True)
        o = CacheConfig.production("sdxl", serving=False)
        # serving (round 4): fixed interval 24 (adaptive loses under
        # rolling admissions) at boundary 1 with ROW-GRANULAR warmup —
        # chip-clean at qps 1.1, warm 143.9 ms => 1.85 img/s under load
        # (exp/serving_sdxl_hybrid_i24_rowwarm_v5e_r4d.json)
        assert not s.deep_adaptive and s.deep_interval == 24
        assert s.deep_row_warmup
        assert s.deep_compact_fraction == 0.3 and s.deep_compact_pairwise
        assert s.deep_boundary == 1
        # offline/aligned: boundary-1 + adaptive refresh + reuse-then-predict
        # (chip-confirmed 2.7849 img/s at ONE full of 30,
        # exp/bench_sdxl_bdy1_w1c30_v5e.json; full-size quality 7.93e-5)
        assert o.deep_adaptive and o.deep_predict == 0.5
        assert o.deep_boundary == 1
        assert o.deep_drift_threshold == 0.3 and o.deep_max_interval == 30
        assert o.deep_warmup == 1

    def test_sd15_serving_row_warmup(self):
        from sduss_tpu.config import CacheConfig

        s = CacheConfig.production("sd15", serving=True)
        # serving (round 4): interval 12 boundary-1 with ROW-GRANULAR
        # warmup — warm step 65.7 ms vs 77.9 batch-wide, 100% machine SLO
        # zero aborts at qps 4.0
        # (exp/serving_sd15_hybrid_i12_rowwarm_v5e_r4d.json)
        assert s.deep_row_warmup and s.deep_interval == 12
        assert s.deep_boundary == 1 and s.deep_compact_fraction == 0.3

    def test_preset_drives_tiny_engine(self):
        import numpy as np

        from sduss_tpu.config import CacheConfig
        from sduss_tpu.entrypoints.offline import DiffusionPipeline

        pipe = DiffusionPipeline(model="sd15", test_tiny=True,
                                 dtype="float32")
        pipe.config.cache = CacheConfig.production("sd15", serving=False)
        outs = pipe.generate(["a cat"], resolution=256,
                             num_inference_steps=5, seed=0)
        img = np.asarray(outs[0].image)
        assert np.isfinite(img.astype(np.float32)).all()
