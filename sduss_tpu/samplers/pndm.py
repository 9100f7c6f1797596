"""PNDM (PLMS) sampler — linear multistep with epsilon history.

Rebuilds the reference's batched PNDMScheduler
(sduss/model_executor/diffusers/schedulers/scheduling_pndm.py, 317 LoC) in the
framework's table/coefficient design (samplers/base.py), with
``skip_prk_steps=True`` semantics (the SD-1.5 serving default):

* model eval 0: first-order step, latents stored as ``cur``;
* model eval 1: Heun-style corrector at the SAME (t0 -> t1) transfer, blending
  (e0 + e1)/2 applied from ``cur`` (the duplicated second timestep in the
  schedule — PNDM uses num_steps + 1 model evaluations);
* later evals: Adams-Bashforth ladder over the last <=4 epsilons.

Unlike Euler/flow-match this sampler is stateful: each request carries an
epsilon history (B, 3, ...), the corrector base sample and a step counter,
threaded through the jitted step like the latents (``needs_state`` protocol).
Coefficient rows are [alphabar_t, alphabar_prev].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sduss_tpu.samplers.base import Sampler, SamplerTable, expand_to


class PNDMSampler(Sampler):
    kind = "pndm"
    needs_state = True

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        steps_offset: int = 1,
        prediction_type: str = "epsilon",
    ) -> None:
        if prediction_type != "epsilon":
            raise NotImplementedError("PNDM supports epsilon prediction only")
        self.num_train_timesteps = num_train_timesteps
        self.steps_offset = steps_offset
        if beta_schedule == "scaled_linear":
            betas = np.linspace(beta_start**0.5, beta_end**0.5,
                                num_train_timesteps, dtype=np.float64) ** 2
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                                dtype=np.float64)
        else:
            raise NotImplementedError(beta_schedule)
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.final_alpha_cumprod = float(self.alphas_cumprod[0])

    def _abar(self, t: np.ndarray) -> np.ndarray:
        idx = np.clip(t.astype(np.int64), 0, self.num_train_timesteps - 1)
        return self.alphas_cumprod[idx]

    def make_table(self, num_steps: int) -> SamplerTable:
        ratio = self.num_train_timesteps // num_steps
        asc = (np.arange(num_steps) * ratio).round().astype(np.int64) \
            + self.steps_offset
        desc = asc[::-1].copy()
        if num_steps == 1:
            # no corrector possible: a single first-order transfer to the
            # final alpha-bar (SamplingParams allows steps >= 1; the chained
            # corrector table below would index past its one entry)
            coeffs = np.asarray(
                [[self._abar(desc[:1])[0], self.final_alpha_cumprod]],
                np.float32)
            return SamplerTable(kind=self.kind,
                                timesteps=desc.astype(np.float32),
                                coeffs=coeffs, init_noise_sigma=1.0)
        # duplicate the second entry: eval 1 is the corrector at (t0 -> t1)
        ts = np.concatenate([desc[:1], desc[1:2], desc[1:]]).astype(np.float64)
        n_evals = len(ts)  # num_steps + 1

        abar_t = np.empty(n_evals)
        abar_prev = np.empty(n_evals)
        prev_of = np.concatenate([desc[1:], [desc[-1] - ratio]])
        # eval 0 and the corrector eval 1 share the (t0 -> t1) transfer.
        abar_t[0] = abar_t[1] = self._abar(desc[:1])[0]
        abar_prev[0] = abar_prev[1] = (self._abar(desc[1:2])[0]
                                       if num_steps > 1 else
                                       self._abar(prev_of[:1])[0])
        for i in range(2, n_evals):
            t = desc[i - 1]
            pt = prev_of[i - 1]
            abar_t[i] = self._abar(np.asarray([t]))[0]
            abar_prev[i] = (self._abar(np.asarray([pt]))[0] if pt >= 0
                            else self.final_alpha_cumprod)
        coeffs = np.stack([abar_t, abar_prev], axis=1).astype(np.float32)
        return SamplerTable(
            kind=self.kind,
            timesteps=ts.astype(np.float32),
            coeffs=coeffs,
            init_noise_sigma=1.0,
        )

    # -- per-request device state ---------------------------------------------

    @staticmethod
    def init_state(latents):
        """eps history (B,3,...), corrector base (B,...), counter (B,)."""
        b = latents.shape[0]
        return {
            "ets": jnp.zeros((b, 3) + latents.shape[1:], latents.dtype),
            "cur": jnp.zeros_like(latents),
            "count": jnp.zeros((b,), jnp.int32),
        }

    # -- traced math -----------------------------------------------------------

    @staticmethod
    def scale_model_input(x, coeff_t):
        return x  # PNDM does not scale the model input

    @staticmethod
    def step(x, model_out, coeff_t, coeff_next):  # pragma: no cover
        raise RuntimeError("PNDM is stateful; use step_with_state")

    @staticmethod
    def step_with_state(x, model_out, coeff_t, coeff_next, state):
        xf = x.astype(jnp.float32)
        e_now = model_out.astype(jnp.float32)
        ets = state["ets"].astype(jnp.float32)   # (B, 3, ...): newest first
        cur = state["cur"].astype(jnp.float32)
        count = state["count"]

        h0, h1, h2 = ets[:, 0], ets[:, 1], ets[:, 2]
        blend0 = e_now
        blend1 = (e_now + h0) / 2.0                                # corrector
        blend2 = (3.0 * e_now - h0) / 2.0
        blend3 = (23.0 * e_now - 16.0 * h0 + 5.0 * h1) / 12.0
        blend4 = (55.0 * e_now - 59.0 * h0 + 37.0 * h1 - 9.0 * h2) / 24.0
        c = count.reshape((-1,) + (1,) * (xf.ndim - 1))
        eps = jnp.where(c == 0, blend0,
              jnp.where(c == 1, blend1,
              jnp.where(c == 2, blend2,
              jnp.where(c == 3, blend3, blend4))))

        # eval 1 re-applies the (t0 -> t1) transfer from the stored sample
        base = jnp.where(c == 1, cur, xf)

        abar_t = expand_to(coeff_t.astype(jnp.float32), xf.ndim)
        abar_prev = expand_to(coeff_next.astype(jnp.float32), xf.ndim)
        x0 = (base - jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(abar_t)
        x_prev = jnp.sqrt(abar_prev) * x0 + jnp.sqrt(1.0 - abar_prev) * eps

        # history push is skipped on the corrector eval (count == 1)
        shifted = jnp.concatenate([e_now[:, None], ets[:, :2]], axis=1)
        push = (count != 1).reshape((-1,) + (1,) * ets.ndim)[:, 0]
        push = push.reshape((-1, 1) + (1,) * (xf.ndim - 1))
        new_ets = jnp.where(push, shifted, ets)
        new_cur = jnp.where(c == 0, xf, cur)
        new_state = {
            "ets": new_ets.astype(state["ets"].dtype),
            "cur": new_cur.astype(state["cur"].dtype),
            "count": count + 1,
        }
        return x_prev.astype(x.dtype), new_state
