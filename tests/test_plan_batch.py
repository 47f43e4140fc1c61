"""Seed-batched planning (mbd.plan_batch) parity with the serial harness.

The reference runs its multi-seed acceptance harness as a serial loop
(mbd/scripts/run_mbd.py:17-39). plan_batch folds the seed axis into the
engines' sample axis; per-seed results must match plan() run seed-by-seed
(same RNG chains) to f32 rollout tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbd_tpu import envs
from mbd_tpu.planners import mbd

CFG = dict(Nsample=32, Hsample=8, Ndiffuse=6, temp_sample=0.1)


@pytest.mark.slow
def test_plan_batch_matches_serial_fused():
    env = envs.get_env("hopper")
    cfg = mbd.MBDConfig(**CFG)
    rngs = jnp.stack([jax.random.PRNGKey(s) for s in range(2)])
    batch = mbd.plan_batch(env, cfg, rngs, engine="fused")
    assert batch.Ybars.shape == (2, cfg.Ndiffuse - 1, cfg.Hsample,
                                 env.action_size)
    assert batch.final_diverged.shape == (2,)
    assert not np.asarray(batch.final_diverged).any()
    for s in range(2):
        serial = mbd.plan(env, cfg, jax.random.PRNGKey(s), engine="fused")
        np.testing.assert_allclose(np.asarray(serial.rews_trace),
                                   np.asarray(batch.rews_trace[s]),
                                   atol=5e-3)
        np.testing.assert_allclose(float(serial.final_reward),
                                   float(batch.final_reward[s]), atol=5e-3)


@pytest.mark.slow
def test_plan_batch_vmap_engine_car2d():
    env = envs.get_env("car2d")
    cfg = mbd.MBDConfig(**CFG)
    rngs = jnp.stack([jax.random.PRNGKey(s) for s in range(2)])
    batch = mbd.plan_batch(env, cfg, rngs, engine="vmap")
    serial = mbd.plan(env, cfg, jax.random.PRNGKey(0), engine="vmap")
    np.testing.assert_allclose(np.asarray(serial.rews_trace),
                               np.asarray(batch.rews_trace[0]), atol=5e-3)
    np.testing.assert_allclose(float(serial.final_reward),
                               float(batch.final_reward[0]), atol=5e-3)


@pytest.mark.slow
def test_plan_batch_demo_vmap_car2d():
    """Seed-batched demo-conditioned denoise (car2d): exercises the
    per-seed demo-fusion reductions (max/renormalize along axis 1) against
    the serial planner. (The humanoid demo envs are too compile-heavy for
    the CPU CI — XLA flags the unrolled 19-link engine as a "very slow
    compile"; their pallas q-trace path is unit-covered in
    test_rollout_pallas/test_envs and integration-covered by the
    tpu-marked test below + docs/RESULTS.json demo rows.)"""
    env = envs.get_env("car2d")
    cfg = mbd.MBDConfig(Nsample=32, Hsample=8, Ndiffuse=6, temp_sample=0.1,
                        enable_demo=True)
    rngs = jnp.stack([jax.random.PRNGKey(s) for s in range(2)])
    batch = mbd.plan_batch(env, cfg, rngs, engine="vmap")
    serial = mbd.plan(env, cfg, jax.random.PRNGKey(1), engine="vmap")
    np.testing.assert_allclose(np.asarray(serial.rews_trace),
                               np.asarray(batch.rews_trace[1]), atol=5e-3)
    assert np.isfinite(np.asarray(batch.final_reward)).all()


@pytest.mark.tpu
def test_plan_batch_demo_pallas_tpu():
    """On real TPU hardware: seed-batched demo-conditioned humanoidtrack
    on the Pallas engine (in-kernel q-trace + folded-FK demo scoring)
    agrees with the serial fused path."""
    env = envs.get_env("humanoidtrack")
    cfg = mbd.MBDConfig(Nsample=64, Hsample=50, Ndiffuse=6,
                        temp_sample=0.1, enable_demo=True)
    rngs = jnp.stack([jax.random.PRNGKey(s) for s in range(2)])
    batch = mbd.plan_batch(env, cfg, rngs, engine="pallas")
    serial = mbd.plan(env, cfg, jax.random.PRNGKey(0), engine="fused")
    np.testing.assert_allclose(np.asarray(serial.rews_trace),
                               np.asarray(batch.rews_trace[0]), atol=5e-3)


@pytest.mark.slow
def test_path_integral_plan_batch_matches_serial():
    """Engine-level serial-vs-batched parity for the path-integral
    planner. One update method suffices here: the seed-fold mechanics
    (per-seed sampling/eval/masking/softmax) are method-independent, and
    plan_batch applies the method-specific update as jax.vmap of the
    exact serial update function — whose batching semantics
    test_path_integral_batched_updates_match_loop pins for all three
    methods without compiling six planner programs."""
    from mbd_tpu.planners import path_integral as pi

    env = envs.get_env("hopper")
    cfg = pi.PathIntegralConfig(update_method="mppi", Nsample=32,
                                Hsample=8, Nrefine=6)
    rngs = jnp.stack([jax.random.PRNGKey(s) for s in range(2)])
    batch = pi.plan_batch(env, cfg, rngs, engine="fused")
    serial = pi.plan(env, cfg, jax.random.PRNGKey(1), engine="fused")
    np.testing.assert_allclose(np.asarray(serial.rews_trace),
                               np.asarray(batch.rews_trace[1]), atol=5e-3)
    np.testing.assert_allclose(float(serial.final_reward),
                               float(batch.final_reward[1]), atol=5e-3)


@pytest.mark.parametrize("method", ["mppi", "cem", "cma-es"])
def test_path_integral_batched_updates_match_loop(method):
    """plan_batch's per-seed update (jax.vmap(update_fn) with the valid
    mask riding along, path_integral.py::plan_batch) must equal a python
    loop of the serial update rule — pins the axis conventions for every
    method, including demotion masking, without any engine compile."""
    from mbd_tpu.planners import path_integral as pi

    rng = np.random.RandomState(0)
    S, N, H, nu = 3, 16, 5, 2
    cfg = pi.PathIntegralConfig(update_method=method, Nsample=N,
                                Hsample=H, cem_elite=4)
    fn = pi._UPDATE_FNS[method]
    weights = jax.nn.softmax(jnp.asarray(rng.randn(S, N)), axis=1)
    Y0s = jnp.asarray(rng.randn(S, N, H, nu), jnp.float32)
    sigma = jnp.asarray(np.abs(rng.randn(S)), jnp.float32)
    mu = jnp.asarray(rng.randn(S, H, nu), jnp.float32)
    valid = jnp.asarray(rng.rand(S, N) > 0.3)

    batched = jax.vmap(
        lambda w, y, s, m, v: fn(w, y, s, m, cfg, valid=v))(
        weights, Y0s, sigma, mu, valid)
    for s in range(S):
        mu_s, sig_s = fn(weights[s], Y0s[s], sigma[s], mu[s], cfg,
                         valid=valid[s])
        np.testing.assert_allclose(np.asarray(batched[0][s]),
                                   np.asarray(mu_s), atol=1e-6)
        np.testing.assert_allclose(float(batched[1][s]), float(sig_s),
                                   atol=1e-6)
