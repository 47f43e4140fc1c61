"""Env wrappers for RL training (brax.training-style semantics).

The reference trains through ``brax.training`` which wraps envs with episode
truncation and auto-reset (SURVEY §3.4). Same contracts here:

 - ``EpisodeWrapper``: marks ``done`` at ``episode_length`` steps and tracks
   ``truncation`` (so GAE can bootstrap through time-limit terminations).
 - ``AutoResetWrapper``: when an episode ends, replaces the state with the
   cached reset state (no re-randomization inside jit — brax semantics).

States carry wrapper bookkeeping in ``State.metrics``-adjacent ``info``
fields stored in the metrics dict (pytree-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..envs.base import State


class EpisodeWrapper:
    def __init__(self, env, episode_length: int, action_repeat: int = 1):
        self.env = env
        self.episode_length = episode_length
        self.action_repeat = action_repeat

    def reset(self, rng: jax.Array) -> State:
        state = self.env.reset(rng)
        metrics = dict(state.metrics)
        metrics["steps"] = jnp.zeros(())
        metrics["truncation"] = jnp.zeros(())
        return state.replace(metrics=metrics)

    def step(self, state: State, action: jax.Array) -> State:
        def f(state, _):
            return self.env.step(state, action), None

        state, _ = jax.lax.scan(f, state, None, self.action_repeat)
        steps = state.metrics["steps"] + self.action_repeat
        one = jnp.ones_like(state.done)
        done = jnp.where(steps >= self.episode_length, one, state.done)
        truncation = jnp.where(
            (steps >= self.episode_length) & (state.done == 0), one,
            jnp.zeros_like(state.done))
        metrics = dict(state.metrics)
        metrics["steps"] = steps
        metrics["truncation"] = truncation
        return state.replace(done=done, metrics=metrics)

    def __getattr__(self, name):
        return getattr(self.env, name)


class AutoResetWrapper:
    """On done, revert to the cached reset state (brax AutoResetWrapper)."""

    def __init__(self, env):
        self.env = env

    def reset(self, rng: jax.Array) -> State:
        state = self.env.reset(rng)
        metrics = dict(state.metrics)
        metrics["first_pipeline_state"] = state.pipeline_state
        metrics["first_obs"] = state.obs
        return state.replace(metrics=metrics)

    def step(self, state: State, action: jax.Array) -> State:
        # clear done before stepping (post-reset step)
        state = state.replace(done=jnp.zeros_like(state.done))
        metrics_in = state.metrics
        state = self.env.step(state, action)

        def where_done(x, y):
            done = state.done
            if done.ndim > 0:
                done = done.reshape(done.shape + (1,) * (x.ndim - done.ndim))
            return jnp.where(done, x, y)

        pipeline_state = jax.tree.map(
            where_done, metrics_in["first_pipeline_state"],
            state.pipeline_state)
        obs = where_done(metrics_in["first_obs"], state.obs)
        metrics = dict(state.metrics)
        metrics["steps"] = where_done(jnp.zeros_like(metrics["steps"]),
                                      metrics["steps"])
        metrics["first_pipeline_state"] = metrics_in["first_pipeline_state"]
        metrics["first_obs"] = metrics_in["first_obs"]
        return state.replace(pipeline_state=pipeline_state, obs=obs,
                             metrics=metrics)

    def __getattr__(self, name):
        return getattr(self.env, name)


def wrap_for_training(env, episode_length: int, action_repeat: int = 1):
    return AutoResetWrapper(EpisodeWrapper(env, episode_length,
                                           action_repeat))
