"""Multi-chip PPO: the num_envs axis shards over a 1-D mesh under GSPMD.

The sharded program is the SAME program — placement only — so a meshed
run on the virtual 8-device CPU mesh must reproduce the single-device
run's results exactly (XLA inserts the data-parallel collectives; no
algorithmic change, unlike per-device-minibatch PPO variants).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from mbd_tpu import envs
from mbd_tpu.rl import ppo


def _tiny_cfg():
    return ppo.PPOConfig(num_timesteps=256, num_evals=1, num_envs=16,
                         unroll_length=4, num_minibatches=2,
                         num_updates_per_batch=1, episode_length=8,
                         num_eval_envs=4, seed=0)


def test_meshed_ppo_matches_single_device():
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh (conftest sets 8)")
    env = envs.get_env("hopper")
    cfg = _tiny_cfg()
    mesh = Mesh(np.array(jax.devices()), ("env",))
    _, params_m, hist_m = ppo.train(env, cfg, mesh=mesh)
    _, params_s, hist_s = ppo.train(env, cfg)
    # same program modulo placement: results match to GSPMD-reassociation
    # rounding (the cross-device grad reduction may sum in a different
    # order; observed drift ~1e-6 through adam)
    np.testing.assert_allclose(hist_m[0]["eval/episode_reward"],
                               hist_s[0]["eval/episode_reward"],
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(params_m.policy),
                    jax.tree.leaves(params_s.policy)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_meshed_ppo_rejects_bad_config():
    env = envs.get_env("hopper")
    mesh = Mesh(np.array(jax.devices()), ("env",))
    cfg = ppo.PPOConfig(num_envs=len(jax.devices()) + 1)
    with pytest.raises(ValueError):
        ppo.train(env, cfg, mesh=mesh)
    car = envs.get_env("car2d")     # analytic: no batch-last path
    with pytest.raises(ValueError):
        ppo.train(car, ppo.PPOConfig(num_envs=len(jax.devices())),
                  mesh=mesh)
