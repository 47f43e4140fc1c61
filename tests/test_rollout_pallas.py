"""Pallas whole-rollout kernel parity (interpret mode on CPU)."""

import jax
import numpy as np
import pytest

from mbd_tpu import envs
from mbd_tpu.ops.rollout_pallas import rollout_rewards_pallas
from mbd_tpu.rollout.fused import rollout_rewards


@pytest.mark.parametrize("env_name", ["hopper", "cartpole"])
def test_pallas_rollout_matches_fused(env_name):
    env = envs.get_env(env_name)
    state0 = env.reset(jax.random.PRNGKey(0))
    Y0s = jax.random.uniform(
        jax.random.PRNGKey(1), (8, 10, env.action_size),
        minval=-1, maxval=1)
    r_ref, _, bad_ref = jax.jit(
        lambda s, y: rollout_rewards(env, s, y))(state0, Y0s)
    r_pl, bad_pl = rollout_rewards_pallas(env, state0, Y0s, b_tile=8,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(r_ref), np.asarray(r_pl),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bad_ref), np.asarray(bad_pl))


def test_pallas_rollout_pads_ragged_batch():
    env = envs.get_env("cartpole")
    state0 = env.reset(jax.random.PRNGKey(0))
    Y0s = jax.random.uniform(jax.random.PRNGKey(1), (5, 6, 1),
                             minval=-1, maxval=1)
    r, bad = rollout_rewards_pallas(env, state0, Y0s, b_tile=8,
                                    interpret=True)
    assert r.shape == (5, 6) and bad.shape == (5,)
    assert np.isfinite(np.asarray(r)).all()
