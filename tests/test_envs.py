"""Env contract tests: sizes, stability, reward formulas, jit-ability.

The heavier humanoid scenes only run a couple of steps here (compile cost);
planner-level behavior is covered by the integration tests and bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbd_tpu import envs

# (name, observation_size, action_size)
SPECS = [
    ("cartpole", 4, 1),
    ("hopper", 12, 3),
    ("walker2d", 18, 6),
    ("ant", 27, 8),
    ("halfcheetah", 17, 6),
    ("pushT", 16, 2),
    ("humanoidrun", 47, 17),
    ("humanoidstandup", 47, 17),
    ("humanoidtrack", 57, 17),
    ("car2d", 3, 2),
]


@pytest.mark.parametrize("name,obs_size,act_size", SPECS)
def test_env_contract(name, obs_size, act_size):
    env = envs.get_env(name)
    assert env.observation_size == obs_size
    assert env.action_size == act_size
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (obs_size,)
    s1 = jax.jit(env.step)(state, jnp.zeros(act_size))
    assert np.isfinite(np.asarray(s1.obs)).all()
    assert np.isfinite(float(s1.reward))


def test_reset_determinism_under_fixed_key():
    env = envs.get_env("hopper")
    s1 = env.reset(jax.random.PRNGKey(7))
    s2 = env.reset(jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(s1.obs), np.asarray(s2.obs))


def test_hopper_reward_formula():
    """reward = torso_x − 0.5·clip(|torso_z − 1.0|, −1, 1)."""
    env = envs.get_env("hopper")
    state = env.reset(jax.random.PRNGKey(0))
    s1 = jax.jit(env.step)(state, jnp.zeros(3))
    ps = s1.pipeline_state
    want = float(ps.x.pos[0, 0]) - 0.5 * np.clip(
        abs(float(ps.x.pos[0, 2]) - 1.0), -1.0, 1.0)
    assert float(s1.reward) == pytest.approx(want, abs=1e-5)


def test_pushT_reset_randomizes_goal():
    env = envs.get_env("pushT")
    g1 = np.asarray(env.reset(jax.random.PRNGKey(0)).pipeline_state.q[5:])
    g2 = np.asarray(env.reset(jax.random.PRNGKey(1)).pipeline_state.q[5:])
    assert not np.allclose(g1, g2)
    # pusher pinned at the reference's fixed start
    q = np.asarray(env.reset(jax.random.PRNGKey(0)).pipeline_state.q)
    np.testing.assert_allclose(q[:2], [0.1, -0.15], atol=1e-6)


def test_humanoidtrack_demo_api():
    env = envs.get_env("humanoidtrack")
    assert env.xref.shape == (5, 50, 3)
    assert env.rew_xref == 1.0
    # logpd of a rollout equal to the demo itself is 0 (perfect tracking)
    class FakePS:
        pass

    # build a fake stacked pipeline-state pytree with x.pos matching xref
    state = env.reset(jax.random.PRNGKey(0))
    nlink = state.pipeline_state.x.pos.shape[0]
    pos = jnp.zeros((50, nlink, 3))
    pos = pos.at[:, env.track_body_idx].set(env.xref.transpose(1, 0, 2))
    ps = jax.tree.map(lambda x: jnp.broadcast_to(x, (50,) + x.shape),
                      state.pipeline_state)
    ps = ps.replace(x=ps.x.replace(pos=pos))
    logpd = float(env.eval_xref_logpd(ps))
    assert logpd == pytest.approx(0.0, abs=1e-6)


def test_traj_xref_logpd_qs_matches_link_state_path():
    """The q-trace demo scorer (Pallas engine's demo branch) must agree
    with the link-state-based traj_xref_logpd on the same trajectories."""
    from mbd_tpu.rollout.fused import states_from_qs

    env = envs.get_env("humanoidtrack")
    H, B = 5, 4
    rng = jax.random.PRNGKey(2)
    qs = env.sys.init_q[None, :, None] + 0.05 * jax.random.normal(
        rng, (H, env.sys.nq, B))
    qds = jnp.zeros((H, env.sys.nv, B))
    ps = states_from_qs(env.sys, qs, qds)
    logpd_ref = env.traj_xref_logpd(ps)
    logpd_qs = env.traj_xref_logpd_qs(qs)
    np.testing.assert_allclose(np.asarray(logpd_ref),
                               np.asarray(logpd_qs), atol=1e-5)
    assert np.asarray(logpd_qs).std() > 0


def test_humanoidtrack_walk_mode():
    """The walk demo clip (shipped but never loaded by the reference —
    mbd/envs/humanoidtrack.py:33 hardcodes jog) is a first-class mode."""
    env = envs.get_env("humanoidtrack_walk")
    assert env.xref.shape == (5, 50, 3)
    jog = envs.get_env("humanoidtrack")
    assert not np.allclose(np.asarray(env.xref), np.asarray(jog.xref))
