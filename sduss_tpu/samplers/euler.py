"""Euler-discrete sampler (SD-1.5 / SDXL denoising schedule).

Rebuilds the behavior of the reference's batched EulerDiscreteScheduler
(sduss/model_executor/diffusers/schedulers/scheduling_euler_discrete.py:71-274):
per-request sigma tables, input scaling x / sqrt(sigma^2+1), epsilon- or
v-prediction Euler ODE step x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * d.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sduss_tpu.samplers.base import (
    Sampler,
    SamplerTable,
    expand_to,
    leading_timesteps,
    linspace_timesteps,
    trailing_timesteps,
)


class EulerDiscreteSampler(Sampler):
    kind = "euler"

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "epsilon",
        timestep_spacing: str = "leading",
        steps_offset: int = 1,
        interpolation_type: str = "linear",
    ) -> None:
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        if interpolation_type != "linear":
            raise NotImplementedError("only linear sigma interpolation is supported")

        if beta_schedule == "scaled_linear":
            betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
        else:
            raise NotImplementedError(beta_schedule)
        alphas_cumprod = np.cumprod(1.0 - betas)
        # sigma_t = sqrt((1 - abar_t) / abar_t): the EDM-style noise level.
        self.train_sigmas = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)
        self.alphas_cumprod = alphas_cumprod

    def make_table(self, num_steps: int) -> SamplerTable:
        if self.timestep_spacing == "leading":
            ts = leading_timesteps(num_steps, self.num_train_timesteps, self.steps_offset)
        elif self.timestep_spacing == "linspace":
            ts = linspace_timesteps(num_steps, self.num_train_timesteps)
        elif self.timestep_spacing == "trailing":
            ts = trailing_timesteps(num_steps, self.num_train_timesteps)
        else:
            raise NotImplementedError(self.timestep_spacing)
        sigmas = np.interp(ts, np.arange(self.num_train_timesteps), self.train_sigmas)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        coeffs = np.stack([sigmas[:-1], sigmas[1:]], axis=1)
        if self.timestep_spacing in ("linspace", "trailing"):
            init_noise_sigma = float(sigmas.max())
        else:
            init_noise_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)
        table = SamplerTable(
            kind=self.kind,
            timesteps=ts.astype(np.float32),
            coeffs=coeffs,
            init_noise_sigma=init_noise_sigma,
        )
        table.prediction_type = self.prediction_type  # type: ignore[attr-defined]
        return table

    @staticmethod
    def scale_model_input(x, coeff_t):
        sigma = expand_to(coeff_t.astype(jnp.float32), x.ndim)
        return (x.astype(jnp.float32) / jnp.sqrt(sigma**2 + 1.0)).astype(x.dtype)

    def step(self, x, model_out, coeff_t, coeff_next,
             prediction_type: str = None):
        # default to the sampler's configured prediction type: call sites
        # pass only (x, out, c0, c1), so a v_prediction config would
        # otherwise silently run epsilon math
        prediction_type = prediction_type or self.prediction_type
        xf = x.astype(jnp.float32)
        ef = model_out.astype(jnp.float32)
        sigma = expand_to(coeff_t.astype(jnp.float32), x.ndim)
        sigma_next = expand_to(coeff_next.astype(jnp.float32), x.ndim)
        if prediction_type == "epsilon":
            pred_x0 = xf - sigma * ef
        elif prediction_type == "v_prediction":
            pred_x0 = ef * (-sigma / jnp.sqrt(sigma**2 + 1.0)) + xf / (sigma**2 + 1.0)
        elif prediction_type == "sample":
            pred_x0 = ef
        else:
            raise ValueError(prediction_type)
        derivative = (xf - pred_x0) / sigma
        prev = xf + derivative * (sigma_next - sigma)
        return prev.astype(x.dtype)
