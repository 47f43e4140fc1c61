"""Cartpole swing-up (reference: mbd/envs/cartpole.py).

Positional-backend semantics: sys.dt := 0.005, n_frames=4 (cartpole.py:17-19);
reset adds π to the pole angle plus ±0.01 noise (cartpole.py:29-33);
reward = cos(pole angle) − |cart velocity| (cartpole.py:44).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sim.system import load_mjcf
from .base import State
from .physics import PhysicsEnv, asset_path


class Cartpole(PhysicsEnv):
    def __init__(self):
        sys = load_mjcf(asset_path("cartpole.xml"))
        sys = sys.replace(dt=jnp.asarray(0.005, sys.dt.dtype))
        super().__init__(sys, n_frames=4)

    def reset(self, rng: jax.Array) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        q = self.sys.init_q + jax.random.uniform(
            rng1, (self.sys.nq,), minval=-0.01, maxval=0.01) \
            + jnp.array([0.0, jnp.pi])
        qd = jax.random.uniform(rng2, (self.sys.nv,), minval=-0.01,
                                maxval=0.01)
        ps = self.pipeline_init(q, qd)
        return State(ps, self._obs(ps), jnp.asarray(0.0), jnp.asarray(0.0))

    def step(self, state: State, action: jax.Array) -> State:
        ps = self.pipeline_step(state.pipeline_state, action)
        reward = jnp.cos(ps.q[1]) - jnp.abs(ps.qd[0])
        return state.replace(pipeline_state=ps, obs=self._obs(ps),
                             reward=reward, done=jnp.asarray(0.0))

    def _obs(self, ps) -> jax.Array:
        return jnp.concatenate([ps.q, ps.qd])

    @property
    def action_size(self) -> int:
        return 1


    def reward_qs_b(self, qs, qds, us, q0, qd0):
        """Batch-last fast path: reward is a pure (q, qd) function."""
        return jnp.cos(qs[:, 1]) - jnp.abs(qds[:, 0])
