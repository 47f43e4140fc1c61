"""Batch-last training environment: the TPU hot path for RL rollouts.

The reference trains through ``brax.training`` with ``vmap(env.step)``
(SURVEY §3.4) — batch-FIRST per-sample physics whose tiny [nv, 6]-ish
tensors waste almost the entire 8×128 TPU vector tile (see
sim/batched.py's module docstring). The planners already run all physics
batch-LAST through ``sim.batched``; this module gives RL training the same
engine: the per-env state is carried as q [nq, B] / qd [nv, B] inside the
unroll scan, the physics substeps are ``env_step_checked_b`` (lane-packed,
divergence-flagging), and observations / rewards / terminations come from
the envs' batch-last fast paths (``obs_qs_b`` / ``reward_qs_b`` /
``rl_done_qs_b``).

Semantics mirror rl/wrappers.py exactly (parity-tested in
tests/test_rl_batched_env.py):

 - DivergenceGuardWrapper: a step that leaves the validity envelope is
   rolled back to the pre-step state with done=1 and reward=-10
   (here detected per substep by env_step_checked_b — strictly at least
   as sensitive as the wrapper's post-step check).
 - EpisodeWrapper: done at ``episode_length`` steps, with ``truncation``
   marked so GAE can bootstrap through time limits.
 - AutoResetWrapper: on done, the cached FIRST reset state replaces the
   env's state (brax semantics — no re-randomization inside jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BatchedEnvState:
    """Batch-last training state: q [nq, B], qd [nv, B], obs [B, obs],
    steps [B] (steps since episode start)."""
    q: jnp.ndarray
    qd: jnp.ndarray
    obs: jnp.ndarray
    steps: jnp.ndarray


class BatchedTrainEnv:
    """Auto-reset, episode-truncated, divergence-guarded batch-last env."""

    def __init__(self, env, episode_length: int,
                 divergence_penalty: float = -10.0):
        if not (hasattr(env, "sys") and hasattr(env, "reward_qs_b")):
            raise ValueError(
                f"{type(env).__name__} has no batch-last fast path "
                "(sys + reward_qs_b) — use the vmap rollout")
        self.env = env
        self.sys = env.sys
        self.episode_length = episode_length
        self.divergence_penalty = divergence_penalty

    def reset(self, rng: jax.Array, num_envs: int) -> BatchedEnvState:
        """Vectorized reset via the env's own reset (exact per-seed reset
        noise), transposed into the batch-last layout. The returned state
        doubles as the cached auto-reset pool (brax semantics: episodes
        restart from their env's FIRST reset state)."""
        keys = jax.random.split(rng, num_envs)
        states = jax.vmap(self.env.reset)(keys)
        q = jnp.transpose(states.pipeline_state.q)         # [nq, B]
        qd = jnp.transpose(states.pipeline_state.qd)       # [nv, B]
        obs = jnp.transpose(self.env.obs_qs_b(q, qd))      # [B, obs]
        return BatchedEnvState(
            q=q, qd=qd, obs=obs,
            steps=jnp.zeros(num_envs, q.dtype))

    def step(self, state: BatchedEnvState, first: BatchedEnvState,
             actions: jax.Array):
        """One training step for all envs: actions [B, nu] →
        (next_state, reward [B], done [B], truncation [B]).

        ``first`` is the cached reset pool from :meth:`reset`."""
        from ..sim.batched import env_step_checked_b

        q0, qd0 = state.q, state.qd
        u = jnp.transpose(actions)                          # [nu, B]
        bad0 = jnp.zeros(q0.shape[1:], q0.dtype)
        q1, qd1, bad = env_step_checked_b(self.sys, q0, qd0, u,
                                          self.env.n_frames, bad0)
        bad = jnp.maximum(
            bad, 1.0 - jnp.isfinite(q1).all(axis=0).astype(q0.dtype))
        bad_row = bad[None]
        # divergence guard: roll back, penalize, terminate
        q1 = jnp.where(bad_row > 0, q0, q1)
        qd1 = jnp.where(bad_row > 0, qd0, qd1)
        reward = self.env.reward_qs_b(q1[None], qd1[None], u[None],
                                      q0, qd0)[0]           # [B]
        reward = jnp.where(bad > 0,
                           jnp.full_like(reward, self.divergence_penalty),
                           reward)
        env_done = jnp.maximum(self.env.rl_done_qs_b(q1, qd1), bad)

        steps = state.steps + 1.0
        at_limit = steps >= self.episode_length
        done = jnp.where(at_limit, jnp.ones_like(env_done), env_done)
        truncation = jnp.where(at_limit & (env_done == 0),
                               jnp.ones_like(done), jnp.zeros_like(done))

        # auto-reset from the cached pool
        d_row = done[None]
        q2 = jnp.where(d_row > 0, first.q, q1)
        qd2 = jnp.where(d_row > 0, first.qd, qd1)
        steps2 = jnp.where(done > 0, jnp.zeros_like(steps), steps)
        obs1 = jnp.transpose(self.env.obs_qs_b(q1, qd1))    # [B, obs]
        obs2 = jnp.where(done[:, None] > 0, first.obs, obs1)

        next_state = BatchedEnvState(q=q2, qd=qd2, obs=obs2, steps=steps2)
        return next_state, reward, done, truncation
