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


class DivergenceGuardWrapper:
    """Failure detection for RL training. The penalty-contact engine can
    blow up under the wild actions an untrained policy emits over
    1000-step episodes (the planners demote diverged rollouts for the same
    reason — planners/mbd.py; the reference trains through brax, which
    never NaNs, so it needs no equivalent). When the post-step state goes
    non-finite or joint speed passes the engine's divergence threshold,
    the step is rolled back to the pre-step state with ``done=1`` and the
    reward replaced by ``divergence_penalty`` — auto-reset then swaps in a
    fresh episode instead of NaNs poisoning the replay buffer / advantage
    estimates.

    ``divergence_penalty`` must be no better than the env's minimum
    achievable step reward — a hard 0 would make blowing the engine up
    reward-maximizing on envs whose legal rewards are negative (cartpole
    ≈ −1, humanoidtrack ≈ −0.6). The −10 default is below every suite
    env's per-step floor."""

    def __init__(self, env, divergence_penalty: float = -10.0):
        self.env = env
        self.divergence_penalty = divergence_penalty

    def reset(self, rng: jax.Array) -> State:
        return self.env.reset(rng)

    def step(self, state: State, action: jax.Array) -> State:
        from ..sim.batched import QD_DIVERGED

        nxt = self.env.step(state, action)
        ok = jnp.isfinite(nxt.obs).all() & jnp.isfinite(nxt.reward)
        for leaf in jax.tree.leaves(nxt.pipeline_state):
            ok = ok & jnp.isfinite(leaf).all()
        qd = getattr(nxt.pipeline_state, "qd", None)
        if qd is not None:
            ok = ok & (jnp.max(jnp.abs(qd)) < QD_DIVERGED)
        bad = ~ok

        def pick(prev, new):
            return jnp.where(bad, prev, new)

        pipeline_state = jax.tree.map(pick, state.pipeline_state,
                                      nxt.pipeline_state)
        return nxt.replace(
            pipeline_state=pipeline_state,
            obs=pick(state.obs, nxt.obs),
            reward=jnp.where(bad, jnp.full_like(nxt.reward,
                                                self.divergence_penalty),
                             nxt.reward),
            done=jnp.where(bad, jnp.ones_like(nxt.done), nxt.done))

    def __getattr__(self, name):
        return getattr(self.env, name)


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
    return AutoResetWrapper(EpisodeWrapper(
        DivergenceGuardWrapper(env), episode_length, action_repeat))
