"""Pallas whole-rollout kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
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


def test_pallas_qs_trace_matches_fused():
    """The kernel's optional q-trace output (demo branch support) must
    match the fused engine's rollout positions exactly. Cheap env (hopper)
    — the q-trace mechanism is env-independent; the humanoidtrack demo
    scorer itself is covered by test_envs.py::test_traj_xref_logpd_qs."""
    from mbd_tpu.rollout.fused import SUBLANES, rollout_qs

    env = envs.get_env("hopper")
    state0 = env.reset(jax.random.PRNGKey(0))
    N, H = 8, 10
    Y0s = jax.random.uniform(
        jax.random.PRNGKey(1), (N, H, env.action_size), minval=-1, maxval=1)
    r_pl, bad_pl, qs_pl = rollout_rewards_pallas(env, state0, Y0s, b_tile=8,
                                                 interpret=True, need_qs=True)
    assert qs_pl.shape == (H, env.sys.nq, N)
    # reference q trace from the fused engine (same packing layout)
    U = jnp.transpose(Y0s, (1, 2, 0)).reshape(H, env.action_size,
                                              SUBLANES, N // SUBLANES)
    q0 = jnp.broadcast_to(state0.pipeline_state.q[:, None, None],
                          (env.sys.nq, SUBLANES, N // SUBLANES))
    qd0 = jnp.broadcast_to(state0.pipeline_state.qd[:, None, None],
                           (env.sys.nv, SUBLANES, N // SUBLANES))
    qs_ref, _, _ = jax.jit(
        lambda a, b, c: rollout_qs(env.sys, env.n_frames, a, b, c))(
            q0, qd0, U)
    np.testing.assert_allclose(
        np.asarray(qs_ref.reshape(H, env.sys.nq, N)),
        np.asarray(qs_pl), atol=1e-5)


@pytest.mark.tpu
def test_pallas_inkernel_demo_logpd_matches_qs_scorer():
    """The in-kernel demo scoring (SMEM xref + per-step FK accumulation)
    must equal the q-trace scorer on the same kernel outputs. TPU-only:
    the interpreter is impractically slow for the 19-link humanoid (the
    same check ran compiled on hardware with max|diff| 6e-8)."""
    env = envs.get_env("humanoidtrack")
    state0 = env.reset(jax.random.PRNGKey(0))
    Y0s = jax.random.uniform(
        jax.random.PRNGKey(1), (64, 50, env.action_size),
        minval=-1, maxval=1)
    r, bad, qs, logpd_k = jax.jit(
        lambda s, y: rollout_rewards_pallas(env, s, y, need_qs=True,
                                            demo=True))(state0, Y0s)
    logpd_ref = env.traj_xref_logpd_qs(qs)
    np.testing.assert_allclose(np.asarray(logpd_ref), np.asarray(logpd_k),
                               atol=1e-5)
    assert np.isfinite(np.asarray(r)).all()
    assert np.asarray(logpd_k).std() > 0


def test_pallas_rollout_pads_ragged_batch():
    env = envs.get_env("cartpole")
    state0 = env.reset(jax.random.PRNGKey(0))
    Y0s = jax.random.uniform(jax.random.PRNGKey(1), (5, 6, 1),
                             minval=-1, maxval=1)
    r, bad = rollout_rewards_pallas(env, state0, Y0s, b_tile=8,
                                    interpret=True)
    assert r.shape == (5, 6) and bad.shape == (5,)
    assert np.isfinite(np.asarray(r)).all()


def test_vmem_limit_selection():
    """The scoped-VMEM raise is opt-in: default tiles keep the compiler
    default (byte-identical lowering — preserves the persistent compile
    cache), super-default tiles auto-raise (new shapes that overflow the
    ~16 MB default on the humanoids), and the planners' OOM-retry
    context overrides everything while active and restores on exit."""
    from mbd_tpu.ops import rollout_pallas as rp

    assert rp.vmem_limit_for(512) is None
    assert rp.vmem_limit_for(rp.DEFAULT_B_TILE) is None
    assert rp.vmem_limit_for(2048) == rp.VMEM_LIMIT_BYTES
    with rp.raised_vmem_limit():
        assert rp.vmem_limit_for(512) == rp.VMEM_LIMIT_BYTES
        with rp.raised_vmem_limit(7 * 2**20):
            assert rp.vmem_limit_for(4096) == 7 * 2**20
        assert rp.vmem_limit_for(512) == rp.VMEM_LIMIT_BYTES
    assert rp.vmem_limit_for(512) is None
