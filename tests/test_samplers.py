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
        np.testing.assert_allclose(t.coeffs[:, 0], expected, rtol=1e-5)
        assert t.coeffs[-1, 1] == 0.0
        # rows are self-contained [sigma_t, sigma_next] pairs
        np.testing.assert_allclose(t.coeffs[1:, 0], t.coeffs[:-1, 1], rtol=0)
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
        assert t.coeffs[-1, 1] == 0.0
        assert np.all(np.diff(t.coeffs[:, 0]) < 0)
        assert t.init_noise_sigma == 1.0
        # timesteps are sigma*1000
        np.testing.assert_allclose(t.timesteps, t.coeffs[:, 0] * 1000, rtol=1e-6)

    def test_shift_formula(self):
        s = FlowMatchEulerSampler(shift=3.0)
        t = s.make_table(10)
        base = np.linspace(1000, 100, 10) / 1000
        expected = 3 * base / (1 + 2 * base)
        np.testing.assert_allclose(t.coeffs[:, 0], expected, rtol=1e-5)


class TestDDIMTable:
    def test_alphabar_rows(self):
        s = DDIMSampler()
        t = s.make_table(10)
        betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
        ab = np.cumprod(1 - betas)
        ts = (np.arange(10) * 100)[::-1] + 1
        np.testing.assert_allclose(t.coeffs[:, 0], ab[ts], rtol=1e-5)
        np.testing.assert_allclose(t.coeffs[-1, 1], ab[0], rtol=1e-5)


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


def test_sampler_table_edge_step_counts():
    """SamplingParams allows steps >= 1 and up to num_train_timesteps; the
    tables must not crash at either edge (PNDM's corrector chain indexed
    past its one entry at steps=1; DDIM's leading spacing + offset reached
    alphas_cumprod[1000])."""
    from sduss_tpu.samplers.ddim import DDIMSampler
    from sduss_tpu.samplers.pndm import PNDMSampler

    t1 = PNDMSampler().make_table(1)
    assert len(t1.timesteps) == 1 and np.isfinite(t1.coeffs).all()
    t2 = DDIMSampler().make_table(1000)
    assert len(t2.timesteps) == 1000 and np.isfinite(t2.coeffs).all()


def test_euler_step_honors_configured_prediction_type():
    """A v_prediction sampler must not silently run epsilon math when call
    sites pass no prediction_type (they never do)."""
    from sduss_tpu.samplers.euler import EulerDiscreteSampler

    import jax.numpy as jnp

    x = jnp.ones((1, 2, 2, 1))
    eps = jnp.full((1, 2, 2, 1), 0.5)
    c0, c1 = jnp.asarray([2.0]), jnp.asarray([1.0])
    e = EulerDiscreteSampler()
    v = EulerDiscreteSampler(prediction_type="v_prediction")
    out_e = np.asarray(e.step(x, eps, c0, c1))
    out_v = np.asarray(v.step(x, eps, c0, c1))
    assert not np.allclose(out_e, out_v)
    np.testing.assert_allclose(
        out_v, np.asarray(e.step(x, eps, c0, c1,
                                 prediction_type="v_prediction")))


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
    got_x0 = np.asarray(x) - np.sqrt(1 - t.coeffs[-1, 1]) * eps
    got_x0 /= np.sqrt(t.coeffs[-1, 1])
    np.testing.assert_allclose(got_x0, x0, rtol=1e-3, atol=1e-4)


def _plms_reference(x0, eps_fn, table):
    """Independent numpy PLMS simulator following the diffusers algorithm
    shape (ets list, counter-1 corrector, Adams-Bashforth ladder)."""
    x = x0.copy()
    ets = []
    cur = None
    for i in range(table.num_steps):
        t = float(table.timesteps[i])
        abar_t = float(table.coeffs[i, 0])
        abar_prev = float(table.coeffs[i, 1])
        e = eps_fn(x, t)
        if i != 1:
            ets.append(e)
        if i == 0:
            eps = e
            base = x
            cur = x.copy()
        elif i == 1:
            eps = (e + ets[-1]) / 2.0
            base = cur
        elif len(ets) == 2:
            eps = (3 * ets[-1] - ets[-2]) / 2.0
            base = x
        elif len(ets) == 3:
            eps = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12.0
            base = x
        else:
            eps = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3] - 9 * ets[-4]) / 24.0
            base = x
        x0_pred = (base - np.sqrt(1 - abar_t) * eps) / np.sqrt(abar_t)
        x = np.sqrt(abar_prev) * x0_pred + np.sqrt(1 - abar_prev) * eps
    return x


class TestPNDM:
    def test_table_structure(self):
        from sduss_tpu.samplers import PNDMSampler

        s = PNDMSampler()
        t = s.make_table(10)
        assert t.num_steps == 11  # corrector duplicates the second timestep
        assert t.timesteps[1] == t.timesteps[2]
        # evals 0 and 1 share the (t0 -> t1) alphabar transfer
        np.testing.assert_allclose(t.coeffs[0, :], t.coeffs[1, :])
        assert np.all(t.coeffs[:, 0] > 0)
        assert t.init_noise_sigma == 1.0

    def test_matches_reference_plms_simulator(self):
        from sduss_tpu.samplers import PNDMSampler

        s = PNDMSampler()
        table = s.make_table(8)
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)

        def eps_fn(x, t):
            return 0.1 * x + 0.001 * t

        want = _plms_reference(x0, eps_fn, s.make_table(8))

        x = jnp.asarray(x0)
        state = PNDMSampler.init_state(x)
        for i in range(table.num_steps):
            t = float(table.timesteps[i])
            c0 = jnp.asarray([table.coeffs[i, 0]])
            c1 = jnp.asarray([table.coeffs[i, 1]])
            e = 0.1 * x + 0.001 * t
            x, state = PNDMSampler.step_with_state(x, e, c0, c1, state)
            table.advance()
        np.testing.assert_allclose(np.asarray(x), want, rtol=1e-4, atol=1e-5)

    def test_batch_mixing_property(self):
        """Two requests at different schedule positions step identically
        batched vs alone (the core batching property, as for Euler)."""
        from sduss_tpu.samplers import PNDMSampler

        s = PNDMSampler()
        rng = np.random.default_rng(1)

        def run(xs, tables, states, n):
            xs = [jnp.asarray(x) for x in xs]
            for _ in range(n):
                for k in range(len(xs)):
                    t = tables[k]
                    e = 0.2 * xs[k]
                    c0 = jnp.asarray([t.coeffs[t.step, 0]])
                    c1 = jnp.asarray([t.coeffs[t.step, 1]])
                    xs[k], states[k] = PNDMSampler.step_with_state(
                        xs[k], e, c0, c1, states[k])
                    t.advance()
            return xs, states

        x_a = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
        x_b = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)

        # solo trajectories
        ta, tb = s.make_table(6), s.make_table(9)
        sa = PNDMSampler.init_state(jnp.asarray(x_a))
        sb = PNDMSampler.init_state(jnp.asarray(x_b))
        xs, _ = run([x_a], [ta], [sa], 4)
        solo_a = np.asarray(xs[0])
        xs, _ = run([x_b], [tb], [sb], 4)
        solo_b = np.asarray(xs[0])

        # batched: concat along batch, shared step call
        ta2, tb2 = s.make_table(6), s.make_table(9)
        x = jnp.asarray(np.concatenate([x_a, x_b]))
        state = PNDMSampler.init_state(x)
        for _ in range(4):
            e = 0.2 * x
            c0 = jnp.asarray([ta2.coeffs[ta2.step, 0], tb2.coeffs[tb2.step, 0]])
            c1 = jnp.asarray([ta2.coeffs[ta2.step, 1], tb2.coeffs[tb2.step, 1]])
            x, state = PNDMSampler.step_with_state(x, e, c0, c1, state)
            ta2.advance()
            tb2.advance()
        got = np.asarray(x)
        np.testing.assert_allclose(got[0:1], solo_a, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[1:2], solo_b, rtol=1e-5, atol=1e-6)
