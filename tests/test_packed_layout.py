"""Sublane-packed batch layout: packed (8, N/8) rollouts must agree with
flat-batch and per-sample engines, including ragged N (pad + slice)."""

import jax
import jax.numpy as jnp
import numpy as np

from mbd_tpu import envs
from mbd_tpu.rollout.fused import rollout_rewards
from mbd_tpu.rollout.rollout import rollout_us
from mbd_tpu.sim import batched as BT


def test_fused_matches_vmap_ragged_batch():
    env = envs.get_env("hopper")
    N, H = 13, 6                      # N not a multiple of 8 → pad path
    state0 = env.reset(jax.random.PRNGKey(0))
    Y0s = jax.random.uniform(jax.random.PRNGKey(1),
                             (N, H, env.action_size), minval=-1, maxval=1)
    rews_fused, _, diverged = jax.jit(
        lambda s, y: rollout_rewards(env, s, y))(state0, Y0s)
    rews_vmap, _ = jax.jit(jax.vmap(
        lambda y: rollout_us(env.step, state0, y)))(Y0s)
    assert rews_fused.shape == (N, H)
    assert diverged.shape == (N,)
    np.testing.assert_allclose(np.asarray(rews_fused),
                               np.asarray(rews_vmap), atol=2e-3)


def test_engine_packed_equals_flat():
    """The engine itself must be batch-shape polymorphic: a (8, L) packed
    batch gives the same numbers as the flat (N,) batch."""
    env = envs.get_env("cartpole")
    sys = env.sys
    N = 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(np.tile(np.asarray(sys.init_q)[:, None], (1, N))
                    + rng.normal(size=(sys.nq, N)) * 0.05, jnp.float32)
    qd = jnp.asarray(rng.normal(size=(sys.nv, N)) * 0.2, jnp.float32)
    u = jnp.asarray(rng.normal(size=(sys.nu, N)) * 0.5, jnp.float32)

    qf, qdf = jax.jit(lambda a, b, c: BT.env_step_b(sys, a, b, c, 2))(
        q, qd, u)
    qp, qdp = jax.jit(lambda a, b, c: BT.env_step_b(sys, a, b, c, 2))(
        q.reshape(sys.nq, 8, 2), qd.reshape(sys.nv, 8, 2),
        u.reshape(sys.nu, 8, 2))
    np.testing.assert_allclose(np.asarray(qf),
                               np.asarray(qp).reshape(sys.nq, N), atol=1e-6)
    np.testing.assert_allclose(np.asarray(qdf),
                               np.asarray(qdp).reshape(sys.nv, N), atol=1e-6)
