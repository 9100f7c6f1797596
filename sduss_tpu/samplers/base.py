"""Batched noise samplers with per-request schedule state.

The reference extends diffusers schedulers with a ``batch_set_timesteps /
batch_scale_model_input / batch_step`` trio so that requests sitting at
*different* timesteps (and different total step counts) can share one model
forward (sduss/model_executor/diffusers/schedulers/scheduling_euler_discrete.py:71-274,
scheduling_flow_match_euler_discrete.py:69-202).

TPU-native design: schedule state is split into
  * a host-side, numpy ``SamplerTable`` per request (sigma/alphabar tables and
    the current step index) — cheap Python, never traced; and
  * pure, jit-traced step math that consumes only *dense arrays* gathered from
    the tables: per-sample coefficient rows of static shape (B, 2).

Every sampler family exposes the same coefficient layout, so one compiled
denoise-step function serves all requests regardless of where each one is in
its schedule — the batch axis is fully dynamic in content, fully static in
shape.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np


@dataclasses.dataclass
class SamplerTable:
    """Host-side schedule for one request.

    ``coeffs`` has shape (num_steps, 2): row i holds the SELF-CONTAINED
    traced-math coefficient pair [coeff_t, coeff_next] for step i (for
    Euler/flow-match: sigma_t/sigma_next; for DDIM/PNDM: alphabar_t/
    alphabar_prev — PNDM's corrector step makes "next row's coeff" the wrong
    pairing, so every row carries its own transfer).  ``timesteps`` has shape
    (num_steps,): the value fed to the model's time embedding at each step.
    """

    kind: str
    timesteps: np.ndarray
    coeffs: np.ndarray
    init_noise_sigma: float
    step: int = 0

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    @property
    def remaining_steps(self) -> int:
        return self.num_steps - self.step

    @property
    def done(self) -> bool:
        return self.step >= self.num_steps

    def current_timestep(self) -> float:
        return float(self.timesteps[self.step])

    def current_coeffs(self) -> np.ndarray:
        """(2,) row: [coeff_t, coeff_next] for the current step."""
        return self.coeffs[self.step]

    def advance(self) -> None:
        if self.done:
            raise RuntimeError("sampler table already exhausted")
        self.step += 1


def gather_timesteps(tables: Sequence[SamplerTable]) -> np.ndarray:
    """(B,) float32 model-timestep values for a batch of requests."""
    return np.asarray([t.current_timestep() for t in tables], dtype=np.float32)


def gather_coeffs(tables: Sequence[SamplerTable]) -> np.ndarray:
    """(B, 2) float32 [coeff_t, coeff_next] rows for a batch of requests."""
    out = np.empty((len(tables), 2), dtype=np.float32)
    for i, t in enumerate(tables):
        out[i] = t.current_coeffs()[:2]
    return out


class Sampler:
    """Family interface. Subclasses provide host tables + traced math."""

    kind: str = "base"
    # Stateful samplers (PNDM multistep history) carry a per-request device
    # state pytree threaded through the jitted step like the latents.
    needs_state: bool = False

    def make_table(self, num_steps: int) -> SamplerTable:
        raise NotImplementedError

    # --- traced math (jnp in, jnp out; shapes static) ---

    @staticmethod
    def scale_model_input(x, coeff_t):
        """Scale the latent before the model forward. ``coeff_t``: (B,)."""
        raise NotImplementedError

    @staticmethod
    def step(x, model_out, coeff_t, coeff_next):
        """One integration step. All per-sample coeffs are (B,)."""
        raise NotImplementedError


def expand_to(x, ndim: int):
    """Reshape a (B,) coefficient vector to (B, 1, 1, ...) for broadcasting."""
    return x.reshape(x.shape[0], *([1] * (ndim - 1)))


def leading_timesteps(num_steps: int, num_train_timesteps: int, steps_offset: int) -> np.ndarray:
    """'leading' timestep spacing (descending), as used by SD/SDXL configs."""
    ratio = num_train_timesteps // num_steps
    ts = (np.arange(num_steps) * ratio).round()[::-1].copy().astype(np.float32)
    return ts + steps_offset


def linspace_timesteps(num_steps: int, num_train_timesteps: int) -> np.ndarray:
    return np.linspace(0, num_train_timesteps - 1, num_steps, dtype=np.float32)[::-1].copy()


def trailing_timesteps(num_steps: int, num_train_timesteps: int) -> np.ndarray:
    ratio = num_train_timesteps / num_steps
    ts = np.arange(num_train_timesteps, 0, -ratio).round().astype(np.float32) - 1
    return ts
