"""Sampler unit tests: table construction + the core batching property.

The load-bearing property (reference scheduling_euler_discrete.py:71-274):
requests at DIFFERENT positions in DIFFERENT-length schedules must produce
bit-identical trajectories whether stepped alone or inside a mixed batch.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sduss_tpu.samplers import DDIMSampler, EulerDiscreteSampler, FlowMatchEulerSampler
from sduss_tpu.samplers.base import gather_coeffs, gather_timesteps


def _manual_sd_sigmas():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    ab = np.cumprod(1 - betas)
    return np.sqrt((1 - ab) / ab)


class TestEulerTable:
    def test_sigma_table_matches_manual_formula(self):
        s = EulerDiscreteSampler()
        t = s.make_table(50)
        sig = _manual_sd_sigmas()
        ts = (np.arange(50) * (1000 // 50)).round()[::-1] + 1
        expected = np.interp(ts, np.arange(1000), sig)
        np.testing.assert_allclose(t.coeffs[:-1, 0], expected, rtol=1e-5)
        assert t.coeffs[-1, 0] == 0.0
        assert t.num_steps == 50
        np.testing.assert_allclose(t.timesteps, ts, rtol=0)
        # leading spacing => init_noise_sigma = sqrt(max^2+1)
        np.testing.assert_allclose(t.init_noise_sigma, (expected.max() ** 2 + 1) ** 0.5, rtol=1e-6)

    def test_sigmas_strictly_decreasing(self):
        for n in (10, 30, 50):
            t = EulerDiscreteSampler().make_table(n)
            assert np.all(np.diff(t.coeffs[:, 0]) < 0)


class TestFlowMatchTable:
    def test_shift_and_endpoints(self):
        s = FlowMatchEulerSampler(shift=3.0)
        t = s.make_table(28)
        # first sigma: shift(1.0) = 1.0; appended terminal 0
        np.testing.assert_allclose(t.coeffs[0, 0], 1.0, rtol=1e-6)
        assert t.coeffs[-1, 0] == 0.0
        assert np.all(np.diff(t.coeffs[:, 0]) < 0)
        assert t.init_noise_sigma == 1.0
        # timesteps are sigma*1000
        np.testing.assert_allclose(t.timesteps, t.coeffs[:-1, 0] * 1000, rtol=1e-6)

    def test_shift_formula(self):
        s = FlowMatchEulerSampler(shift=3.0)
        t = s.make_table(10)
        base = np.linspace(1000, 100, 10) / 1000
        expected = 3 * base / (1 + 2 * base)
        np.testing.assert_allclose(t.coeffs[:-1, 0], expected, rtol=1e-5)


class TestDDIMTable:
    def test_alphabar_rows(self):
        s = DDIMSampler()
        t = s.make_table(10)
        betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
        ab = np.cumprod(1 - betas)
        ts = (np.arange(10) * 100)[::-1] + 1
        np.testing.assert_allclose(t.coeffs[:-1, 0], ab[ts], rtol=1e-5)
        np.testing.assert_allclose(t.coeffs[-1, 0], ab[0], rtol=1e-5)


def _fake_model(x):
    # A deterministic stand-in "noise prediction" depending on the latent.
    return 0.3 * x + 0.1


@pytest.mark.parametrize("sampler_cls", [EulerDiscreteSampler, FlowMatchEulerSampler, DDIMSampler])
def test_mixed_step_batching_matches_solo(sampler_cls):
    """Requests at different schedule positions batch without interference."""
    sampler = sampler_cls()
    shape = (1, 8, 8, 4)

    def run_solo(num_steps, seed, until):
        table = sampler.make_table(num_steps)
        x = np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
        x = jnp.asarray(x)
        for _ in range(until):
            c = gather_coeffs([table])
            xin = sampler.scale_model_input(x, jnp.asarray(c[:, 0]))
            eps = _fake_model(xin)
            x = sampler.step(x, eps, jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1]))
            table.advance()
        return np.asarray(x), table

    # Two requests: 10-step schedule at step 3, 25-step schedule at step 7.
    xa, ta = run_solo(10, 1, 3)
    xb, tb = run_solo(25, 2, 7)

    # Batched continuation for 3 more steps vs solo continuation.
    xa_solo, _ = run_solo(10, 1, 6)
    xb_solo, _ = run_solo(25, 2, 10)

    x = jnp.concatenate([jnp.asarray(xa), jnp.asarray(xb)], axis=0)
    tables = [ta, tb]
    for _ in range(3):
        c = gather_coeffs(tables)
        ts = gather_timesteps(tables)
        assert ts.shape == (2,)
        xin = sampler.scale_model_input(x, jnp.asarray(c[:, 0]))
        eps = _fake_model(xin)
        x = sampler.step(x, eps, jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1]))
        for t in tables:
            t.advance()

    np.testing.assert_allclose(np.asarray(x[0:1]), xa_solo, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x[1:2]), xb_solo, rtol=1e-5, atol=1e-6)


def test_euler_scale_model_input():
    s = EulerDiscreteSampler()
    x = jnp.ones((2, 4, 4, 1), jnp.float32)
    sigma = jnp.asarray([3.0, 0.0], jnp.float32)
    out = np.asarray(s.scale_model_input(x, sigma))
    np.testing.assert_allclose(out[0], 1.0 / np.sqrt(10.0), rtol=1e-6)
    np.testing.assert_allclose(out[1], 1.0, rtol=1e-6)


def test_ddim_full_denoise_reaches_x0():
    """With a model that predicts the exact noise, DDIM recovers x0."""
    s = DDIMSampler()
    t = s.make_table(10)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    ab0 = t.coeffs[0, 0]
    x = jnp.asarray(np.sqrt(ab0) * x0 + np.sqrt(1 - ab0) * eps)
    epsj = jnp.asarray(eps)
    while not t.done:
        c = gather_coeffs([t])
        x = s.step(x, epsj, jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1]))
        t.advance()
    got_x0 = np.asarray(x) - np.sqrt(1 - t.coeffs[-1, 0]) * eps
    got_x0 /= np.sqrt(t.coeffs[-1, 0])
    np.testing.assert_allclose(got_x0, x0, rtol=1e-3, atol=1e-4)
