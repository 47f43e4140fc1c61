"""Ant: quadruped, forward-velocity reward (brax-registry parity).

The reference pulls this env from the brax registry with
``backend="positional"`` (mbd/envs/__init__.py:30-31). Standard brax ant
semantics: reward = forward_velocity + healthy(1.0) − 0.5·Σu² (contact cost
off by default); velocity from torso x displacement over env.dt; done when
torso z leaves [0.2, 1.0]; obs = [q[2:], qd] (27-dim); reset noise ±0.1 on
q, N(0, 0.1) on qd; n_frames=5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sim.system import load_mjcf
from .base import State
from .physics import PhysicsEnv, asset_path


class Ant(PhysicsEnv):
    def __init__(self):
        super().__init__(load_mjcf(asset_path("ant.xml")), n_frames=5)

    def reset(self, rng: jax.Array) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        q = self.sys.init_q + jax.random.uniform(
            rng1, (self.sys.nq,), minval=-0.1, maxval=0.1)
        # keep the root quaternion valid
        quat = self.sys.init_q[3:7]
        q = q.at[3:7].set(quat / jnp.linalg.norm(quat))
        qd = 0.1 * jax.random.normal(rng2, (self.sys.nv,))
        ps = self.pipeline_init(q, qd)
        return State(ps, self._obs(ps), jnp.asarray(0.0), jnp.asarray(0.0))

    def step(self, state: State, action: jax.Array) -> State:
        ps0 = state.pipeline_state
        ps = self.pipeline_step(ps0, action)
        velocity = (ps.x.pos[0] - ps0.x.pos[0]) / self.dt
        ctrl_cost = 0.5 * jnp.sum(jnp.square(action))
        z = ps.x.pos[0, 2]
        healthy = jnp.where((z >= 0.2) & (z <= 1.0), 1.0, 0.0)
        reward = velocity[0] + healthy - ctrl_cost
        done = 1.0 - healthy
        return state.replace(pipeline_state=ps, obs=self._obs(ps),
                             reward=reward, done=done)

    def _obs(self, ps) -> jax.Array:
        return jnp.concatenate([ps.q[2:], ps.qd])

    def traj_reward(self, ps_stack, us, ps0) -> jax.Array:
        """[H, B] rewards; forward velocity from torso x displacement."""
        x = ps_stack.x.pos[:, :, 0, :]                   # [H, B, 3]
        prev = jnp.concatenate(
            [jnp.broadcast_to(ps0.x.pos[0], x[:1].shape), x[:-1]], axis=0)
        vel = (x - prev) / self.dt
        ctrl_cost = 0.5 * jnp.sum(jnp.square(us), axis=-1)   # us [B, H, nu]
        z = x[..., 2]
        healthy = jnp.where((z >= 0.2) & (z <= 1.0), 1.0, 0.0)
        return vel[..., 0] + healthy - jnp.transpose(ctrl_cost)


    def obs_qs_b(self, q, qd):
        """Batch-last _obs: [q[2:], qd] (root x/y excluded)."""
        return jnp.concatenate([q[2:], qd], axis=0)

    def rl_done_qs_b(self, q, qd):
        """step() terminates when unhealthy: torso z = q[2] outside
        [0.2, 1.0] (free root -> torso pos = q[0:3])."""
        healthy = (q[2] >= 0.2) & (q[2] <= 1.0)
        return 1.0 - healthy.astype(q.dtype)

    def reward_qs_b(self, qs, qds, us, q0, qd0):
        """Batch-last fast path: free root → torso pos = q[0:3]; velocity
        from x displacement over env.dt."""
        # q0[0:1] not q0[None, 0]: the latter lowers to a >2-D gather, which
        # Mosaic can't compile inside the Pallas rollout kernel
        prev = q0[0:1] if qs.shape[0] == 1 else \
            jnp.concatenate([q0[0:1], qs[:-1, 0]], axis=0)
        vel = (qs[:, 0] - prev) / self.dt
        healthy = jnp.where((qs[:, 2] >= 0.2) & (qs[:, 2] <= 1.0), 1.0, 0.0)
        ctrl_cost = 0.5 * (us ** 2).sum(1)
        return vel + healthy - ctrl_cost
