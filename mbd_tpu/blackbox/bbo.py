"""MBD as a general black-box optimizer (no dynamics model).

Re-implements the semantics of the reference's mbd/blackbox/mbd_opt.py:
diffuse a *population* of shape (Nsample, dim) — each reverse step perturbs
every member with N(0, σₜ), softmax-weights objective values across the
population, and collapses toward the weighted barycenter (broadcast to all
members, mbd_opt.py:64-80). Test functions (Ackley/Rastrigin/Levy, dim=800)
map the search cube [-1,1]^d to the function domain (mbd_opt.py:32-56).

TPU-first: the full Ndiffuse loop is one ``lax.scan`` device program and the
population axis is shardable over a mesh.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..core.schedule import make_schedule

A, B, C = 20.0, 0.2, 2.0 * jnp.pi


def _domain(fn_name: str) -> Tuple[float, float]:
    return (-5.0, 10.0) if fn_name == "Ackley" else (-5.0, 5.0)


def make_objective(fn_name: str, dim: int) -> Callable:
    x_min, x_max = _domain(fn_name)

    def to_domain(Y):
        return x_min + (x_max - x_min) * (Y + 1.0) / 2.0

    if fn_name == "Ackley":
        def fn(Y):
            X = to_domain(Y)
            p1 = -A * jnp.exp(-B / jnp.sqrt(dim) *
                              jnp.linalg.norm(X, axis=-1))
            p2 = -jnp.exp(jnp.mean(jnp.cos(C * X), axis=-1))
            return p1 + p2 + A + jnp.e
    elif fn_name == "Rastrigin":
        def fn(Y):
            X = to_domain(Y)
            return 10.0 * dim + jnp.sum(
                X ** 2 - 10.0 * jnp.cos(2.0 * jnp.pi * X), axis=-1)
    elif fn_name == "Levy":
        def fn(Y):
            X = to_domain(Y)
            w = 1.0 + (X - 1.0) / 4.0
            p1 = jnp.sin(jnp.pi * w[..., 0]) ** 2
            p2 = jnp.sum((w[..., :-1] - 1.0) ** 2 *
                         (1.0 + 10.0 * jnp.sin(jnp.pi * w[..., :-1] + 1.0) ** 2),
                         axis=-1)
            p3 = (w[..., -1] - 1.0) ** 2 * \
                (1.0 + jnp.sin(2.0 * jnp.pi * w[..., -1]) ** 2)
            return p1 + p2 + p3
    else:
        raise ValueError(fn_name)
    return fn


@dataclass
class BBOConfig:
    fn_name: str = "Rastrigin"
    dim: int = 800
    Nsample: int = 64
    Ndiffuse: int = 100
    temp_sample: float = 1.0
    beta0: float = 1e-4
    betaT: float = 1e-2


@dataclass
class BBOResult:
    evals: jax.Array     # cumulative objective evaluations per step
    J_trace: jax.Array   # best (max of -f) objective value per step
    mu_final: jax.Array  # final population


def optimize(cfg: BBOConfig, rng: jax.Array, jit: bool = True) -> BBOResult:
    fn = make_objective(cfg.fn_name, cfg.dim)
    sched = make_schedule(cfg.Ndiffuse, cfg.beta0, cfg.betaT)

    def reverse_once(carry, t):
        rng, mu = carry
        rng, key = jax.random.split(rng)
        Y0s = jnp.clip(
            jax.random.normal(key, (cfg.Nsample, cfg.dim)) * sched.sigmas[t]
            + mu, -1.0, 1.0)
        Js = -jax.vmap(fn)(Y0s)
        logp0 = (Js - Js.mean()) / jnp.maximum(Js.std(), 1e-8) \
            / cfg.temp_sample
        w = jax.nn.softmax(logp0)
        mu_next = jnp.einsum("n,ni->i", w, Y0s)
        return (rng, mu_next[None, :] + jnp.zeros_like(mu)), Js.max()

    def run(rng):
        mu0 = jnp.zeros((cfg.Nsample, cfg.dim)) \
            + jax.random.normal(rng, (cfg.Nsample, cfg.dim))
        steps = jnp.arange(cfg.Ndiffuse - 1, 0, -1)
        (_, mu), J = jax.lax.scan(reverse_once, (rng, mu0), steps)
        return mu, J

    if jit:
        run = jax.jit(run)
    mu, J_trace = run(rng)
    evals = jnp.arange(1, cfg.Ndiffuse) * cfg.Nsample
    return BBOResult(evals=evals, J_trace=J_trace, mu_final=mu)
