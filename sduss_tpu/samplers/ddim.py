"""DDIM sampler (eta=0, deterministic).

The reference carries a batched PNDM scheduler for SD-1.5
(sduss/model_executor/diffusers/schedulers/scheduling_pndm.py); DDIM is the
single-step deterministic member of that family and covers the baseline
"SD-1.5 512x512, 10-step DDIM" config.  Coefficient rows store alphabar.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sduss_tpu.samplers.base import Sampler, SamplerTable, expand_to, leading_timesteps


class DDIMSampler(Sampler):
    kind = "ddim"

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        steps_offset: int = 1,
        set_alpha_to_one: bool = False,
        prediction_type: str = "epsilon",
    ) -> None:
        self.num_train_timesteps = num_train_timesteps
        self.steps_offset = steps_offset
        self.prediction_type = prediction_type
        if beta_schedule == "scaled_linear":
            betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
        else:
            raise NotImplementedError(beta_schedule)
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.final_alpha_cumprod = 1.0 if set_alpha_to_one else float(self.alphas_cumprod[0])

    def make_table(self, num_steps: int) -> SamplerTable:
        ts = leading_timesteps(num_steps, self.num_train_timesteps, self.steps_offset)
        # clip like PNDM._abar: leading spacing + steps_offset can reach
        # num_train_timesteps (e.g. 1000 steps, offset 1) — one past the end
        idx = np.clip(ts.astype(np.int64), 0, len(self.alphas_cumprod) - 1)
        ab = self.alphas_cumprod[idx]
        # Row i: [alphabar_t, alphabar_prev] — the full transfer for step i.
        ab_prev = np.concatenate([ab[1:], [self.final_alpha_cumprod]])
        coeffs = np.stack([ab, ab_prev], axis=1).astype(np.float32)
        return SamplerTable(
            kind=self.kind,
            timesteps=ts.astype(np.float32),
            coeffs=coeffs,
            init_noise_sigma=1.0,
        )

    @staticmethod
    def scale_model_input(x, coeff_t):
        return x

    def step(self, x, model_out, coeff_t, coeff_next,
             prediction_type: str = None):
        prediction_type = prediction_type or self.prediction_type
        xf = x.astype(jnp.float32)
        ef = model_out.astype(jnp.float32)
        ab_t = expand_to(coeff_t.astype(jnp.float32), x.ndim)
        ab_prev = expand_to(coeff_next.astype(jnp.float32), x.ndim)
        if prediction_type == "epsilon":
            pred_x0 = (xf - jnp.sqrt(1.0 - ab_t) * ef) / jnp.sqrt(ab_t)
            eps = ef
        elif prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(ab_t) * xf - jnp.sqrt(1.0 - ab_t) * ef
            eps = jnp.sqrt(ab_t) * ef + jnp.sqrt(1.0 - ab_t) * xf
        else:
            raise ValueError(prediction_type)
        prev = jnp.sqrt(ab_prev) * pred_x0 + jnp.sqrt(1.0 - ab_prev) * eps
        return prev.astype(x.dtype)
