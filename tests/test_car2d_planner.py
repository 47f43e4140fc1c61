"""End-to-end: MBD + path-integral planners solve car2d on CPU.

This mirrors the reference's de-facto acceptance check (final mean reward
printed by run_mbd.py); car2d is the analytic CPU-fast env so thresholds are
tight enough to catch planner regressions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbd_tpu import envs
from mbd_tpu.planners import mbd, path_integral


@pytest.fixture(scope="module")
def env():
    return envs.get_env("car2d")


def test_car2d_env_contract(env):
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (3,)
    assert env.action_size == 2 and env.observation_size == 3
    s1 = jax.jit(env.step)(state, jnp.array([0.0, 1.0]))
    assert s1.pipeline_state.shape == (3,)
    # moving forward from start: theta=3pi/2 → heading -x; position changes
    assert not np.allclose(np.asarray(s1.pipeline_state),
                           np.asarray(state.pipeline_state))


def test_car2d_collision_freezes_state(env):
    state = env.reset(jax.random.PRNGKey(0))
    # place car right next to an obstacle facing it: obstacle at (0,0)
    q = jnp.array([-0.35, 0.0, jnp.pi / 2])  # heading +x toward (0,0)
    state = state.replace(pipeline_state=q, obs=q)
    s1 = env.step(state, jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(s1.pipeline_state), np.asarray(q))


def test_car2d_reward_shape(env):
    # reward is 1 at the goal, 0 far away
    assert float(env._reward(jnp.array([0.5, 0.0, 0.0]))) == pytest.approx(1.0)
    assert float(env._reward(jnp.array([-2.0, 0.0, 0.0]))) == pytest.approx(0.0)


@pytest.mark.slow
def test_mbd_demo_solves_car2d(env):
    """car2d's reward is exactly zero beyond 0.2 of the goal, so (like the
    reference) the planner needs demo conditioning for a dense signal; the
    RRT demo guides it through the U-shaped wall to the goal."""
    from mbd_tpu.rollout import rollout_us

    cfg = mbd.MBDConfig(Nsample=2048, Hsample=50, Ndiffuse=100,
                        temp_sample=0.1, enable_demo=True)
    res = mbd.plan(env, cfg, jax.random.PRNGKey(0))
    assert res.Ybars.shape == (99, 50, 2)
    state = env.reset(jax.random.PRNGKey(0))
    _, qs = rollout_us(env.step, state, res.Ybars[-1])
    dist = np.linalg.norm(np.asarray(qs[:, :2]) - np.array([0.5, 0.0]),
                          axis=-1)
    assert dist.min() < 0.2          # reaches the goal region
    assert float(res.final_reward) > 0.05


@pytest.mark.slow
def test_mbd_without_demo_runs(env):
    cfg = mbd.MBDConfig(Nsample=256, Hsample=50, Ndiffuse=50,
                        temp_sample=0.1)
    res = mbd.plan(env, cfg, jax.random.PRNGKey(0))
    assert np.isfinite(float(res.final_reward))


@pytest.mark.slow
@pytest.mark.parametrize("method", ["mppi", "cma-es", "cem"])
def test_path_integral_runs_car2d(env, method):
    cfg = path_integral.PathIntegralConfig(
        update_method=method, Nsample=256, Hsample=50, Nrefine=30)
    res = path_integral.plan(env, cfg, jax.random.PRNGKey(0))
    assert res.mu_0ts.shape == (29, 50, 2)
    assert np.isfinite(float(res.final_reward))


def test_mbd_sharded_matches_single_device(env):
    """Sample-sharded run over the 8-device CPU mesh must agree with the
    unsharded program (same RNG stream → same math, modulo reduction order)."""
    from mbd_tpu.parallel import sample_mesh

    cfg = mbd.MBDConfig(Nsample=64, Hsample=10, Ndiffuse=10)
    r1 = mbd.plan(env, cfg, jax.random.PRNGKey(0))
    mesh = sample_mesh()
    r2 = mbd.plan(env, cfg, jax.random.PRNGKey(0), mesh=mesh)
    np.testing.assert_allclose(np.asarray(r1.Ybars), np.asarray(r2.Ybars),
                               atol=1e-4)
