"""PushT: planar pushing of a T-shaped slider to a randomized goal pose.

Behavioral spec from the reference env (mbd/envs/pushT.py): generalized
backend, n_frames=5, gravity off; reset pins the pusher at (0.1, −0.15) and
randomizes the goal pose around (−0.4, 0.4, π) ± (0.2, 0.2, π/4) (:22-37);
reward = 1 − (‖r_goal − r_slider‖ + |Δθ|/π + max(‖pusher − slider‖ − 0.2, 0))
(:51-62); done = reward > 0.95; obs = [q, qd] (16-dim).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sim.system import load_mjcf
from .base import State
from .physics import PhysicsEnv, asset_path


class PushT(PhysicsEnv):
    def __init__(self):
        super().__init__(load_mjcf(asset_path("pushT.xml")), n_frames=5)

    def reset(self, rng: jax.Array) -> State:
        rng, rng_goal = jax.random.split(rng)
        q = self.sys.init_q
        q = q.at[:2].set(jnp.array([0.1, -0.15]))
        goal = jax.random.uniform(rng_goal, (3,), minval=-1.0, maxval=1.0) \
            * jnp.array([0.2, 0.2, jnp.pi / 4]) \
            + jnp.array([-0.4, 0.4, jnp.pi])
        q = q.at[5:].set(goal)
        qd = jnp.zeros(self.sys.nv)
        ps = self.pipeline_init(q, qd)
        return State(ps, self._obs(ps), self._reward(ps), self._done(ps))

    def step(self, state: State, action: jax.Array) -> State:
        ps = self.pipeline_step(state.pipeline_state, action)
        return state.replace(pipeline_state=ps, obs=self._obs(ps),
                             reward=self._reward(ps), done=self._done(ps))

    def _obs(self, ps) -> jax.Array:
        return jnp.concatenate([ps.q, ps.qd], axis=-1)

    def _reward(self, ps) -> jax.Array:
        r_goal, r_slider, r_pusher = ps.q[5:7], ps.q[2:4], ps.q[0:2]
        theta_goal, theta_slider = ps.q[7], ps.q[4]
        d_ps = jnp.maximum(jnp.linalg.norm(r_pusher - r_slider) - 0.2, 0.0)
        return 1.0 - (jnp.linalg.norm(r_goal - r_slider)
                      + jnp.abs(theta_goal - theta_slider) / jnp.pi
                      + d_ps)

    def _done(self, ps) -> jax.Array:
        return (self._reward(ps) > 0.95).astype(jnp.float32)

    @property
    def action_size(self) -> int:
        return 2

    @property
    def observation_size(self) -> int:
        return 16


    def rl_done_qs_b(self, q, qd):
        """step() terminates on success: reward > 0.95 (_done)."""
        r = self.reward_qs_b(q[None], qd[None], None, q, qd)[0]
        return (r > 0.95).astype(q.dtype)

    def reward_qs_b(self, qs, qds, us, q0, qd0):
        """Batch-last fast path: reward is a pure q function."""
        d_goal = jnp.sqrt(((qs[:, 5:7] - qs[:, 2:4]) ** 2).sum(1))
        d_theta = jnp.abs(qs[:, 7] - qs[:, 4]) / jnp.pi
        d_ps = jnp.maximum(
            jnp.sqrt(((qs[:, 0:2] - qs[:, 2:4]) ** 2).sum(1)) - 0.2, 0.0)
        return 1.0 - (d_goal + d_theta + d_ps)
