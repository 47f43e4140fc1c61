"""HumanoidStandup: humanoid starting supine (torso z=0.15), stand-up reward.

Behavioral spec from the reference env (mbd/envs/humanoidstandup.py):
n_frames=7; reset noise ±0.01; obs = [q, qd];
reward = 1.5 − clip(|torso_z − 1.3|, −2, 1) − 0.1|torso_x| − 0.1|torso_y|
(humanoidstandup.py:50-56).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sim.system import load_mjcf
from .base import State
from .physics import PhysicsEnv, asset_path


class HumanoidStandup(PhysicsEnv):
    def __init__(self):
        super().__init__(load_mjcf(asset_path("humanoidstandup.xml")),
                         n_frames=7)

    def reset(self, rng: jax.Array) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        q = self.sys.init_q + jax.random.uniform(
            rng1, (self.sys.nq,), minval=-0.01, maxval=0.01)
        qd = jax.random.uniform(rng2, (self.sys.nv,), minval=-0.01,
                                maxval=0.01)
        ps = self.pipeline_init(q, qd)
        return State(ps, self._obs(ps), jnp.asarray(0.0), jnp.asarray(0.0))

    def step(self, state: State, action: jax.Array) -> State:
        ps = self.pipeline_step(state.pipeline_state, action)
        return state.replace(pipeline_state=ps, obs=self._obs(ps),
                             reward=self._reward(ps))

    def _obs(self, ps) -> jax.Array:
        return jnp.concatenate([ps.q, ps.qd], axis=-1)

    def _reward(self, ps) -> jax.Array:
        return (1.5
                - jnp.clip(jnp.abs(ps.x.pos[0, 2] - 1.3), -2.0, 1.0)
                - 0.1 * jnp.abs(ps.x.pos[0, 0])
                - 0.1 * jnp.abs(ps.x.pos[0, 1]))


    def reward_qs_b(self, qs, qds, us, q0, qd0):
        """Batch-last fast path: free root → torso pos = q[0:3]."""
        return (1.5
                - jnp.clip(jnp.abs(qs[:, 2] - 1.3), -2.0, 1.0)
                - 0.1 * jnp.abs(qs[:, 0])
                - 0.1 * jnp.abs(qs[:, 1]))
