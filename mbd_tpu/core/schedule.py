"""DDPM-style variance schedule for the MBD planner.

Matches the reference schedule semantics (mbd/planners/mbd_planner.py:84-92):
linear betas in [beta0, betaT] over Ndiffuse steps, alphas_bar = cumprod(1-beta),
sigmas = sqrt(1 - alphas_bar). The conditional posterior stds ``sigmas_cond``
are provided for completeness (the reference computes but never uses them: the
reverse update is a deterministic mean update).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DiffusionSchedule:
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_bar: jnp.ndarray
    sigmas: jnp.ndarray
    sigmas_cond: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.betas.shape[0]


def make_schedule(num_steps: int, beta0: float = 1e-4, betaT: float = 1e-2,
                  dtype=jnp.float32) -> DiffusionSchedule:
    betas = jnp.linspace(beta0, betaT, num_steps, dtype=dtype)
    alphas = 1.0 - betas
    alphas_bar = jnp.cumprod(alphas)
    sigmas = jnp.sqrt(1.0 - alphas_bar)
    sig2_cond = (1.0 - alphas) * (1.0 - jnp.sqrt(jnp.roll(alphas_bar, 1))) / (
        1.0 - alphas_bar)
    sigmas_cond = jnp.sqrt(sig2_cond).at[0].set(0.0)
    return DiffusionSchedule(betas, alphas, alphas_bar, sigmas, sigmas_cond)
