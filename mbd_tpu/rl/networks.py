"""Policy / value networks and running observation normalization.

Mirrors brax.training's network shapes: PPO policy MLP (32,)*4 emitting
(mu, log_sigma) for a tanh-squashed Normal, value MLP (256,)*5; SAC uses
(256, 256) actor/critic torsos. Plain flax.linen + optax.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct


class MLP(nn.Module):
    layer_sizes: Sequence[int]
    activate_final: bool = False

    @nn.compact
    def __call__(self, x):
        for i, size in enumerate(self.layer_sizes):
            x = nn.Dense(size, kernel_init=nn.initializers.lecun_uniform())(x)
            if i < len(self.layer_sizes) - 1 or self.activate_final:
                x = nn.swish(x)
        return x


class PolicyNet(nn.Module):
    action_size: int
    hidden: Sequence[int] = (32, 32, 32, 32)

    @nn.compact
    def __call__(self, obs):
        out = MLP(list(self.hidden) + [2 * self.action_size])(obs)
        mu, log_sigma = jnp.split(out, 2, axis=-1)
        return mu, log_sigma


class ValueNet(nn.Module):
    hidden: Sequence[int] = (256, 256, 256, 256, 256)

    @nn.compact
    def __call__(self, obs):
        return MLP(list(self.hidden) + [1])(obs).squeeze(-1)


class QNet(nn.Module):
    """Twin Q network (SAC)."""
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        q1 = MLP(list(self.hidden) + [1])(x).squeeze(-1)
        q2 = MLP(list(self.hidden) + [1])(x).squeeze(-1)
        return q1, q2


# --- tanh-squashed Normal ---------------------------------------------------

_LOG_SIG_MIN, _LOG_SIG_MAX = -5.0, 2.0


def sample_action(mu, log_sigma, key):
    """Returns (action in [-1,1], log_prob, pre-tanh sample)."""
    log_sigma = jnp.clip(log_sigma, _LOG_SIG_MIN, _LOG_SIG_MAX)
    sigma = jnp.exp(log_sigma)
    pre = mu + sigma * jax.random.normal(key, mu.shape)
    act = jnp.tanh(pre)
    logp = _normal_logp(pre, mu, sigma) - _tanh_correction(pre)
    return act, logp.sum(-1), pre


def log_prob(mu, log_sigma, pre_tanh):
    log_sigma = jnp.clip(log_sigma, _LOG_SIG_MIN, _LOG_SIG_MAX)
    sigma = jnp.exp(log_sigma)
    return (_normal_logp(pre_tanh, mu, sigma)
            - _tanh_correction(pre_tanh)).sum(-1)


def entropy_estimate(mu, log_sigma, key):
    """Sampled entropy of the squashed distribution (brax-style)."""
    log_sigma = jnp.clip(log_sigma, _LOG_SIG_MIN, _LOG_SIG_MAX)
    sigma = jnp.exp(log_sigma)
    pre = mu + sigma * jax.random.normal(key, mu.shape)
    logp = _normal_logp(pre, mu, sigma) - _tanh_correction(pre)
    return -logp.sum(-1)


def deterministic_action(mu, log_sigma):
    return jnp.tanh(mu)


def _normal_logp(x, mu, sigma):
    return -0.5 * ((x - mu) / sigma) ** 2 - jnp.log(sigma) \
        - 0.5 * jnp.log(2.0 * jnp.pi)


def _tanh_correction(pre):
    # log |d tanh / dx| = log(1 - tanh²) = 2(log2 - pre - softplus(-2 pre))
    return 2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre))


# --- running observation normalization --------------------------------------

@struct.dataclass
class RunningStats:
    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray

    @classmethod
    def create(cls, obs_size: int) -> "RunningStats":
        return cls(count=jnp.zeros(()), mean=jnp.zeros(obs_size),
                   m2=jnp.zeros(obs_size))

    def update(self, batch: jnp.ndarray) -> "RunningStats":
        """Chan's parallel Welford merge over all leading axes of ``batch``."""
        flat = batch.reshape(-1, batch.shape[-1])
        n_b = flat.shape[0]
        mu_b = flat.mean(0)
        m2_b = ((flat - mu_b) ** 2).sum(0)
        n_new = self.count + n_b
        delta = mu_b - self.mean
        new_mean = self.mean + delta * n_b / n_new
        new_m2 = self.m2 + m2_b + delta ** 2 * self.count * n_b / n_new
        return self.replace(count=n_new, mean=new_mean, m2=new_m2)

    def normalize(self, obs: jnp.ndarray) -> jnp.ndarray:
        var = self.m2 / jnp.maximum(self.count, 1.0)
        return (obs - self.mean) / jnp.sqrt(var + 1e-6)
