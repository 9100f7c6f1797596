"""Flow-matching Euler sampler (SD-3.5 rectified flow schedule).

Rebuilds the batched FlowMatchEulerDiscreteScheduler behavior
(sduss/model_executor/diffusers/schedulers/scheduling_flow_match_euler_discrete.py:69-202):
sigma schedule from 1 -> 1/N with resolution-independent timestep shift
sigma' = shift*s / (1 + (shift-1)*s); step x_{i+1} = x_i + (s_{i+1} - s_i) * v.
The model input is NOT scaled (identity), and the initial latent is pure noise
(init_noise_sigma = 1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sduss_tpu.samplers.base import Sampler, SamplerTable, expand_to


class FlowMatchEulerSampler(Sampler):
    kind = "flow_match"

    def __init__(self, num_train_timesteps: int = 1000, shift: float = 3.0) -> None:
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift

    def _shift(self, s: np.ndarray) -> np.ndarray:
        return self.shift * s / (1.0 + (self.shift - 1.0) * s)

    def make_table(self, num_steps: int) -> SamplerTable:
        n = self.num_train_timesteps
        # Base (unshifted) sigma grid: linspace over [1, 1/n] in t/n units,
        # evaluated at num_steps points, then time-shifted.
        t = np.linspace(n, n / num_steps, num_steps, dtype=np.float64)
        sigmas = self._shift(t / n)
        timesteps = (sigmas * n).astype(np.float32)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        coeffs = np.stack([sigmas[:-1], sigmas[1:]], axis=1)
        return SamplerTable(
            kind=self.kind,
            timesteps=timesteps,
            coeffs=coeffs,
            init_noise_sigma=1.0,
        )

    @staticmethod
    def scale_model_input(x, coeff_t):
        return x

    @staticmethod
    def step(x, model_out, coeff_t, coeff_next, prediction_type: str = "flow"):
        xf = x.astype(jnp.float32)
        vf = model_out.astype(jnp.float32)
        sigma = expand_to(coeff_t.astype(jnp.float32), x.ndim)
        sigma_next = expand_to(coeff_next.astype(jnp.float32), x.ndim)
        prev = xf + (sigma_next - sigma) * vf
        return prev.astype(x.dtype)
