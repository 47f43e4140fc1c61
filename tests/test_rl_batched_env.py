"""Parity: the batch-last RL training env (rl/batched_env.py) against the
wrapped vmap path (rl/wrappers.py) it replaces on the hot path.

Same reset keys + same action sequence → same observations, rewards,
done and truncation flags, including the morphology shortcuts (e.g.
hopper's obs torso-z substitution must equal the FK value) and the
EpisodeWrapper/AutoResetWrapper bookkeeping (truncation at the step
limit, restart from the cached first state). Engines differ (vmap
pipeline vs lane-packed batched), so values match to engine-parity
tolerance, not bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbd_tpu import envs
from mbd_tpu.rl.batched_env import BatchedTrainEnv
from mbd_tpu.rl.wrappers import wrap_for_training

B = 4
EP_LEN = 4
N_STEPS = 6      # crosses the truncation boundary


def _run_vmap(env, keys, acts):
    wrapped = wrap_for_training(env, EP_LEN, 1)
    state = jax.vmap(wrapped.reset)(keys)
    out = []
    step = jax.jit(jax.vmap(wrapped.step))
    for t in range(N_STEPS):
        nxt = step(state, acts[t])
        out.append(dict(obs=np.asarray(state.obs),
                        reward=np.asarray(nxt.reward),
                        done=np.asarray(nxt.done),
                        trunc=np.asarray(nxt.metrics["truncation"]),
                        next_obs=np.asarray(nxt.obs)))
        state = nxt
    return out


def _run_batched(env, rng, acts):
    bt = BatchedTrainEnv(env, EP_LEN)
    state = jax.jit(bt.reset, static_argnums=1)(rng, B)
    first = state
    out = []
    step = jax.jit(bt.step)
    for t in range(N_STEPS):
        nxt, rew, done, trunc = step(state, first, acts[t])
        out.append(dict(obs=np.asarray(state.obs), reward=np.asarray(rew),
                        done=np.asarray(done), trunc=np.asarray(trunc),
                        next_obs=np.asarray(nxt.obs)))
        state = nxt
    return out


@pytest.mark.parametrize("env_name", ["hopper", "ant"])
def test_batched_train_env_matches_wrapped_vmap(env_name):
    env = envs.get_env(env_name)
    rng = jax.random.PRNGKey(7)
    keys = jax.random.split(rng, B)
    # batched reset must consume the same per-env keys
    acts = 0.3 * jax.random.normal(
        jax.random.PRNGKey(3), (N_STEPS, B, env.action_size))

    ref = _run_vmap(env, keys, acts)

    bt = BatchedTrainEnv(env, EP_LEN)
    # reset through the same vmapped env.reset keys for exactness
    states = jax.vmap(env.reset)(keys)
    from mbd_tpu.rl.batched_env import BatchedEnvState
    q = jnp.transpose(states.pipeline_state.q)
    qd = jnp.transpose(states.pipeline_state.qd)
    state = BatchedEnvState(q=q, qd=qd,
                            obs=jnp.transpose(env.obs_qs_b(q, qd)),
                            steps=jnp.zeros(B, q.dtype))
    first = state
    step = jax.jit(bt.step)
    for t in range(N_STEPS):
        nxt, rew, done, trunc = step(state, first, acts[t])
        np.testing.assert_allclose(
            np.asarray(state.obs), ref[t]["obs"], rtol=2e-4, atol=2e-4,
            err_msg=f"{env_name} obs diverged at step {t}")
        np.testing.assert_allclose(
            np.asarray(rew), ref[t]["reward"], rtol=2e-3, atol=2e-3,
            err_msg=f"{env_name} reward diverged at step {t}")
        np.testing.assert_array_equal(
            np.asarray(done), ref[t]["done"],
            err_msg=f"{env_name} done diverged at step {t}")
        np.testing.assert_array_equal(
            np.asarray(trunc), ref[t]["trunc"],
            err_msg=f"{env_name} truncation diverged at step {t}")
        state = nxt


def test_truncation_and_autoreset_bookkeeping():
    env = envs.get_env("hopper")
    bt = BatchedTrainEnv(env, EP_LEN)
    state = jax.jit(bt.reset, static_argnums=1)(jax.random.PRNGKey(0), B)
    first = state
    acts = jnp.zeros((B, env.action_size))
    step = jax.jit(bt.step)
    for t in range(EP_LEN - 1):
        state, _, done, trunc = step(state, first, acts)
        assert not np.asarray(done).any()
        assert not np.asarray(trunc).any()
    state, _, done, trunc = step(state, first, acts)
    assert np.asarray(done).all(), "episode limit must set done"
    assert np.asarray(trunc).all(), "time-limit done is a truncation"
    # auto-reset: back to the cached first state
    np.testing.assert_array_equal(np.asarray(state.q), np.asarray(first.q))
    np.testing.assert_array_equal(np.asarray(state.obs),
                                  np.asarray(first.obs))
    assert (np.asarray(state.steps) == 0).all()
