"""bench.py trajectory builders smoke-tested at tiny model scale.

The real bench compiles the full-size SDXL UNet (chip-only in practice);
these pin the trajectory GRAPHS — fixed deep, adaptive deep — on the tiny
config so a bench code change can't brick a 20-minute relay compile.
Monkeypatches bench.build_step's SDXL_UNET import site (the 128x128 latent
grid stays, matching the closures' shapes).
"""

import numpy as np
import pytest


@pytest.fixture()
def tiny_bench(monkeypatch):
    import sduss_tpu.models.unet as unet_mod

    monkeypatch.setattr(unet_mod, "SDXL_UNET", unet_mod.TINY_SDXL_UNET)
    import bench

    return bench


class TestBenchTrajectories:
    def test_adaptive_deep_runs_and_counts(self, tiny_bench):
        (_, _, _, _, mk_adaptive, _, args) = tiny_bench.build_step(1)
        params, latents, t, coeffs, guidance, ehs, pooled, time_ids = args
        run = mk_adaptive(6, threshold=1e9, cap=3, warmup=1)
        out, n_full = run(params, latents, guidance, ehs, pooled, time_ids)
        assert out.shape == latents.shape
        assert np.isfinite(np.asarray(out, np.float32)).all()
        # threshold -> inf: fulls at 0 (warmup) then every cap steps: 0, 3
        assert int(np.asarray(n_full)) == 2

    def test_adaptive_negative_threshold_all_full_matches_plain(self,
                                                                tiny_bench):
        (_, mk, _, _, mk_adaptive, _, args) = tiny_bench.build_step(1)
        params, latents, t, coeffs, guidance, ehs, pooled, time_ids = args
        run_a = mk_adaptive(3, threshold=-1.0, cap=8, warmup=0)
        out_a, n_full = run_a(params, latents, guidance, ehs, pooled,
                              time_ids)
        assert int(np.asarray(n_full)) == 3
        out_p = mk(3)(params, latents, guidance, ehs, pooled, time_ids)
        np.testing.assert_allclose(np.asarray(out_a, np.float32),
                                   np.asarray(out_p, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_hybrid_fraction_1_matches_adaptive(self, tiny_bench):
        """Full row capacity selects every row: the hybrid trajectory must
        reproduce the plain adaptive trajectory (same refresh decisions,
        same latents) — the wiring-correctness control."""
        (_, _, _, _, mk_adaptive, mk_hybrid, args) = tiny_bench.build_step(1)
        params, latents, t, coeffs, guidance, ehs, pooled, time_ids = args
        run_a = mk_adaptive(6, threshold=0.05, cap=4, warmup=1)
        out_a, nf_a = run_a(params, latents, guidance, ehs, pooled, time_ids)
        run_h = mk_hybrid(6, threshold=0.05, cap=4, warmup=1, fraction=1.0)
        out_h, nf_h = run_h(params, latents, guidance, ehs, pooled, time_ids)
        assert int(np.asarray(nf_a)) == int(np.asarray(nf_h))
        np.testing.assert_allclose(np.asarray(out_h, np.float32),
                                   np.asarray(out_a, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_hybrid_half_fraction_runs(self, tiny_bench):
        (_, _, _, _, _, mk_hybrid, args) = tiny_bench.build_step(1)
        params, latents, t, coeffs, guidance, ehs, pooled, time_ids = args
        run = mk_hybrid(6, threshold=0.05, cap=4, warmup=1, fraction=0.5)
        out, n_full = run(params, latents, guidance, ehs, pooled, time_ids)
        assert out.shape == latents.shape
        assert np.isfinite(np.asarray(out, np.float32)).all()
        assert 1 <= int(np.asarray(n_full)) <= 6


class TestBenchBoundary:
    """BENCH_DEEP_BOUNDARY=1 on a 3-level tiny proxy (conv-only shallow)."""

    @pytest.fixture()
    def tiny3_bdy1(self, monkeypatch):
        import sduss_tpu.models.unet as unet_mod

        monkeypatch.setattr(unet_mod, "SDXL_UNET", unet_mod.TINY3_SDXL_UNET)
        monkeypatch.setenv("BENCH_DEEP_BOUNDARY", "1")
        import bench

        return bench

    def test_deep_interval1_matches_plain(self, tiny3_bdy1):
        """Every step full at boundary 1 == the plain trajectory (the
        wiring-correctness control for the new boundary knob)."""
        (_, mk_plain, mk_deep, _, _, _, args) = tiny3_bdy1.build_step(1)
        params, latents, t, coeffs, guidance, ehs, pooled, time_ids = args
        out_p = mk_plain(3)(params, latents, guidance, ehs, pooled, time_ids)
        out_d = mk_deep(3, 1)(params, latents, guidance, ehs, pooled,
                              time_ids)
        np.testing.assert_allclose(np.asarray(out_d, np.float32),
                                   np.asarray(out_p, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_hybrid_runs_at_boundary1(self, tiny3_bdy1):
        (_, _, _, _, _, mk_hybrid, args) = tiny3_bdy1.build_step(1)
        params, latents, t, coeffs, guidance, ehs, pooled, time_ids = args
        run = mk_hybrid(6, threshold=0.05, cap=4, warmup=1, fraction=0.3)
        out, n_full = run(params, latents, guidance, ehs, pooled, time_ids)
        assert out.shape == latents.shape
        assert np.isfinite(np.asarray(out, np.float32)).all()
