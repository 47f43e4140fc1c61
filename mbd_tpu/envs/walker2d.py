"""Walker2d: planar biped, forward-progress reward.

Behavioral spec from the reference env (mbd/envs/walker2d.py): positional
backend, n_frames=20, reset noise ±5e-3;
obs = [q with q[1] := torso z, clip(qd, ±10)] (walker2d.py:51-56);
reward = torso_x − 0.5·clip(|torso_z − 1.1|, −1, 1) (walker2d.py:58-63).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sim.system import load_mjcf
from .base import State
from .physics import PhysicsEnv, asset_path


class Walker2d(PhysicsEnv):
    def __init__(self):
        super().__init__(load_mjcf(asset_path("walker2d.xml")), n_frames=20)
        self._reset_noise = 5e-3

    def reset(self, rng: jax.Array) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        lo, hi = -self._reset_noise, self._reset_noise
        q = self.sys.init_q + jax.random.uniform(
            rng1, (self.sys.nq,), minval=lo, maxval=hi)
        qd = jax.random.uniform(rng2, (self.sys.nv,), minval=lo, maxval=hi)
        ps = self.pipeline_init(q, qd)
        return State(ps, self._obs(ps), jnp.asarray(0.0), jnp.asarray(0.0))

    def step(self, state: State, action: jax.Array) -> State:
        ps = self.pipeline_step(state.pipeline_state, action)
        return state.replace(pipeline_state=ps, obs=self._obs(ps),
                             reward=self._reward(ps), done=jnp.asarray(0.0))

    def _obs(self, ps) -> jax.Array:
        position = ps.q.at[1].set(ps.x.pos[0, 2])
        velocity = jnp.clip(ps.qd, -10.0, 10.0)
        return jnp.concatenate([position, velocity])

    def _reward(self, ps) -> jax.Array:
        return ps.x.pos[0, 0] - 0.5 * jnp.clip(
            jnp.abs(ps.x.pos[0, 2] - 1.1), -1.0, 1.0)


    def obs_qs_b(self, q, qd):
        """Batch-last _obs: position = q (torso z IS q[1] for this
        morphology — same shortcut reward_qs_b uses), velocity clipped."""
        return jnp.concatenate([q, jnp.clip(qd, -10.0, 10.0)], axis=0)

    def reward_qs_b(self, qs, qds, us, q0, qd0):
        """Batch-last fast path: torso (x, z) = (q[0], q[1])."""
        import jax.numpy as jnp
        return qs[:, 0] - 0.5 * jnp.clip(jnp.abs(qs[:, 1] - 1.1), -1.0, 1.0)
