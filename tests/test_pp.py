"""Pipeline parallelism (parallel/pipeline.py): stage-pinned MMDiT spans.

The reference initializes PP process groups but never executes through them
(parallel_state.py — dormant); these tests pin the TPU rebuild's WORKING
realization: a stage pipeline over separate devices is numerically exactly
the single-device forward, for every stage count and microbatch split.
Runs on the 8-virtual-CPU-device mesh (tests/conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sduss_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel
from sduss_tpu.parallel.pipeline import MMDiTStagePipeline, split_spans

CFG = MMDiTConfig(
    in_channels=4, out_channels=4, num_layers=4, num_heads=2, head_dim=16,
    joint_attention_dim=32, pooled_projection_dim=32, pos_embed_max_size=32,
    dual_attention_layers=(0, 1), sample_size=8, pos_embed_base_size=8,
)


def _inputs(b=4, res=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    lat = jax.random.normal(ks[0], (b, res, res, CFG.in_channels), jnp.float32)
    t = jnp.linspace(100.0, 900.0, b)
    ehs = jax.random.normal(ks[1], (b, 10, CFG.joint_attention_dim),
                            jnp.float32)
    pooled = jax.random.normal(ks[2], (b, CFG.pooled_projection_dim),
                               jnp.float32)
    return lat, t, ehs, pooled


@pytest.fixture(scope="module")
def model_and_params():
    model = SD3Transformer2DModel(CFG)
    params = model.init(jax.random.PRNGKey(7))
    params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    return model, params


class TestSplitSpans:
    def test_balanced_contiguous_cover(self):
        spans = split_spans(24, 4)
        assert spans[0][0] == 0 and spans[-1][1] == 24
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
        sizes = [hi - lo for lo, hi in spans]
        assert max(sizes) - min(sizes) <= 1

    def test_uneven(self):
        spans = split_spans(5, 2)
        assert spans == [(0, 3), (3, 5)]

    def test_sizes_monotone_nonincreasing(self):
        """Docstring promise: no early stage smaller than a later one
        (round() bounds violated this at e.g. (9, 6))."""
        for n, s in ((9, 6), (24, 7), (13, 5), (8, 3)):
            sizes = [hi - lo for lo, hi in split_spans(n, s)]
            assert sizes == sorted(sizes, reverse=True), (n, s, sizes)
            assert sum(sizes) == n and max(sizes) - min(sizes) <= 1

    def test_invalid(self):
        with pytest.raises(ValueError):
            split_spans(4, 5)
        with pytest.raises(ValueError):
            split_spans(4, 0)


class TestMMDiTStagePipeline:
    @pytest.mark.parametrize("n_stages,n_micro", [(1, 1), (2, 1), (2, 2),
                                                  (4, 2), (4, 4), (3, 4)])
    def test_matches_single_device(self, model_and_params, n_stages, n_micro):
        """Stage pipeline == single-device apply, bit-for-bit math."""
        model, params = model_and_params
        lat, t, ehs, pooled = _inputs()
        ref = np.asarray(model.apply(params, lat, t, ehs, pooled))
        devices = jax.devices()[:n_stages]
        pipe = MMDiTStagePipeline(model, params, devices, n_micro=n_micro)
        got = np.asarray(pipe(lat, t, ehs, pooled))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_stage_params_reside_per_device(self, model_and_params):
        """Each stage's params live on that stage's device only, and the
        trunk spans partition the blocks (the HBM-sharding point of PP)."""
        model, params = model_and_params
        devices = jax.devices()[:4]
        pipe = MMDiTStagePipeline(model, params, devices)
        for s, sub in enumerate(pipe.stage_params):
            leaves = jax.tree.leaves(sub)
            assert all(next(iter(l.devices())) == devices[s] for l in leaves)
        n_blocks = sum(len(sub["blocks"]) for sub in pipe.stage_params)
        assert n_blocks == model.cfg.num_layers
        assert "patch_embed" in pipe.stage_params[0]
        assert "proj_out" in pipe.stage_params[-1]
        assert "proj_out" not in pipe.stage_params[0]

    def test_stage_params_fn_streams_per_stage(self, model_and_params):
        """The residency path: stages built via stage_params_fn (no single
        materialized pytree handed to the runner) match the params path."""
        model, params = model_and_params
        lat, t, ehs, pooled = _inputs()
        ref = np.asarray(model.apply(params, lat, t, ehs, pooled))
        head_keys = ("norm_out_proj", "proj_out")

        calls = []

        def stage_fn(s, lo, hi):
            calls.append((s, lo, hi))
            sub = {"blocks": list(params["blocks"][lo:hi])}
            if s == 0:
                for k in params:
                    if k not in ("blocks",) + head_keys:
                        sub[k] = params[k]
            if s == 1:
                for k in head_keys:
                    sub[k] = params[k]
            return sub

        pipe = MMDiTStagePipeline(model, devices=jax.devices()[:2],
                                  n_micro=2, stage_params_fn=stage_fn)
        got = np.asarray(pipe(lat, t, ehs, pooled))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
        assert [c[0] for c in calls] == [0, 1]
        with pytest.raises(ValueError):
            MMDiTStagePipeline(model, params, jax.devices()[:2],
                               stage_params_fn=stage_fn)

    def test_microbatch_remainder(self, model_and_params):
        """Batch not divisible by n_micro still covers every row."""
        model, params = model_and_params
        lat, t, ehs, pooled = _inputs(b=3)
        ref = np.asarray(model.apply(params, lat, t, ehs, pooled))
        pipe = MMDiTStagePipeline(model, params, jax.devices()[:2], n_micro=2)
        got = np.asarray(pipe(lat, t, ehs, pooled))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
