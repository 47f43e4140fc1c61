"""Halfcheetah: planar runner, forward-velocity reward (brax-registry parity).

The reference pulls this env from the brax registry with
``backend="positional"`` (mbd/envs/__init__.py:30-31). Standard brax
halfcheetah semantics: reward = forward_velocity − 0.1·Σu²; velocity from
torso x displacement over env.dt; obs = [q[1:], qd] (17-dim); reset noise
±0.1 on q, N(0, 0.1) on qd; n_frames=5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sim.system import load_mjcf
from .base import State
from .physics import PhysicsEnv, asset_path


class Halfcheetah(PhysicsEnv):
    def __init__(self):
        super().__init__(load_mjcf(asset_path("halfcheetah.xml")), n_frames=5)

    def reset(self, rng: jax.Array) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        q = self.sys.init_q + jax.random.uniform(
            rng1, (self.sys.nq,), minval=-0.1, maxval=0.1)
        qd = 0.1 * jax.random.normal(rng2, (self.sys.nv,))
        ps = self.pipeline_init(q, qd)
        return State(ps, self._obs(ps), jnp.asarray(0.0), jnp.asarray(0.0))

    def step(self, state: State, action: jax.Array) -> State:
        ps0 = state.pipeline_state
        ps = self.pipeline_step(ps0, action)
        velocity = (ps.x.pos[0] - ps0.x.pos[0]) / self.dt
        reward = velocity[0] - 0.1 * jnp.sum(jnp.square(action))
        return state.replace(pipeline_state=ps, obs=self._obs(ps),
                             reward=reward, done=jnp.asarray(0.0))

    def _obs(self, ps) -> jax.Array:
        return jnp.concatenate([ps.q[1:], ps.qd])

    def traj_reward(self, ps_stack, us, ps0) -> jax.Array:
        x = ps_stack.x.pos[:, :, 0, :]                   # [H, B, 3]
        prev = jnp.concatenate(
            [jnp.broadcast_to(ps0.x.pos[0], x[:1].shape), x[:-1]], axis=0)
        vel = (x - prev) / self.dt
        ctrl_cost = 0.1 * jnp.sum(jnp.square(us), axis=-1)   # [B, H]
        return vel[..., 0] - jnp.transpose(ctrl_cost)


    def obs_qs_b(self, q, qd):
        """Batch-last _obs: [q[1:], qd] (root x excluded)."""
        return jnp.concatenate([q[1:], qd], axis=0)

    def reward_qs_b(self, qs, qds, us, q0, qd0):
        """Batch-last fast path: torso x = q[0]."""
        # q0[0:1] not q0[None, 0]: the latter lowers to a >2-D gather, which
        # Mosaic can't compile inside the Pallas rollout kernel
        prev = q0[0:1] if qs.shape[0] == 1 else \
            jnp.concatenate([q0[0:1], qs[:-1, 0]], axis=0)
        vel = (qs[:, 0] - prev) / self.dt
        return vel - 0.1 * (us ** 2).sum(1)
