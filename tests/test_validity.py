"""Validity-envelope tests: the engine flags non-physical rollouts and the
planners neither weight nor publish them.

Round-2 verdict items 1-2: the headline humanoidrun number rode rollouts the
engine itself flagged (torso 5.7 m below the floor). These tests pin the
tightened envelope (QD_DIVERGED, root-penetration sensors) and the
divergence-honest planner plumbing (zero softmax weight for flagged
samples, clean CEM elites, final_diverged reporting).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbd_tpu import envs
from mbd_tpu.sim import batched as BT
from mbd_tpu.sim import kinematics


def _root_heights(sys, q):
    sens = BT._height_sensors(sys)
    assert sens is not None
    sensors, floor_z = sens
    return [float(q[qadr]) + off for qadr, off in sensors], floor_z


@pytest.mark.parametrize("name", ["hopper", "walker2d", "halfcheetah",
                                  "ant"])
def test_height_sensors_match_fk(name):
    """q[qadr]+offset must equal the FK world-z of the root body, at reset
    pose and at a displaced pose."""
    env = envs.get_env(name)
    sys = env.sys
    sens = BT._height_sensors(sys)
    assert sens is not None, f"{name} should expose a root height sensor"
    sensors, floor_z = sens
    assert floor_z == 0.0

    for dz in (0.0, -1.7, 0.9):
        q = np.array(jax.device_get(sys.init_q), np.float64)
        # displace the first sensor coordinate and check FK agreement
        qadr, off = sensors[0]
        q[qadr] += dz
        kin = kinematics.fk(sys, jnp.asarray(q, jnp.float32))
        h = float(q[qadr]) + off
        # the sensor tracks the body carrying that joint
        jid = [j for j in range(sys.njnt)
               if sys.jnt_qposadr[j] in (qadr, qadr - 2)][0]
        b = sys.jnt_bodyid[jid]
        np.testing.assert_allclose(h, float(kin.xpos[b, 2]), atol=1e-5)


def test_no_height_sensor_where_none_applies():
    # pushT/cartpole have no z-measuring root coordinate (or no floor
    # plane): the sensor must be absent, leaving only the qd flag; the
    # humanoids' free roots expose q[2] directly
    for name in ("pushT", "cartpole"):
        assert BT._height_sensors(envs.get_env(name).sys) is None
    for name in ("humanoidrun", "humanoidstandup", "humanoidtrack"):
        sensors, floor_z = BT._height_sensors(envs.get_env(name).sys)
        assert sensors == [(2, 0.0)] and floor_z == 0.0


def test_checked_step_flags_sunk_root_hopper():
    env = envs.get_env("hopper")
    sys = env.sys
    sensors, floor_z = BT._height_sensors(sys)
    B = (8, 1)
    q0 = jnp.broadcast_to(
        jnp.asarray(sys.init_q)[:, None, None], (sys.nq,) + B)
    qd0 = jnp.zeros((sys.nv,) + B)
    u = jnp.zeros((sys.nu,) + B)

    step = jax.jit(lambda q, qd: BT.env_step_checked_b(
        sys, q, qd, u, 1, jnp.zeros(B)))

    # clean reset state: not flagged
    _, _, bad = step(q0, qd0)
    assert not np.asarray(bad).any()

    # root sunk 2 m below the floor: flagged
    qadr, off = sensors[0]
    q_sunk = q0.at[qadr].add(-2.0 - off - float(jax.device_get(
        sys.init_q)[qadr]))
    _, _, bad = step(q_sunk, qd0)
    assert np.asarray(bad).all()

    # joint speed beyond the envelope: flagged
    qd_fast = qd0.at[-1].set(BT.QD_DIVERGED * 1.5)
    _, _, bad = step(q0, qd_fast)
    assert np.asarray(bad).all()


def test_qd_envelope_tightened():
    # VERDICT r2 weak #2: 200 rad/s was 4x the engine's stated ~50 rad/s
    # validity envelope; the flag must sit at <= 2x
    assert BT.QD_DIVERGED <= 100.0


def test_cem_elites_exclude_demoted():
    """Majority-diverged batch: CEM elites must all be clean samples."""
    from mbd_tpu.planners.path_integral import (PathIntegralConfig,
                                                cem_update, cma_es_update)

    N, H, nu = 16, 4, 2
    rng = np.random.default_rng(0)
    Y0s = jnp.asarray(rng.uniform(-1, 1, (N, H, nu)), jnp.float32)
    valid = jnp.asarray([True] * 4 + [False] * 12)
    # diverged samples got (zeroed) weights; clean ones share the mass
    weights = jnp.where(valid, 0.25, 0.0)
    cfg = PathIntegralConfig(update_method="cem", cem_elite=10)

    mu, _ = cem_update(weights, Y0s, jnp.asarray(1.0), Y0s[0], cfg,
                       valid=valid)
    expect = np.asarray(Y0s[:4]).mean(axis=0)
    np.testing.assert_allclose(np.asarray(mu), expect, atol=1e-6)

    # CMA-ES sigma adaptation sees only clean samples (zero weights)
    mu2, sig = cma_es_update(weights, Y0s, jnp.asarray(1.0), Y0s[0], cfg,
                             valid=valid)
    err = np.asarray(Y0s[:4]) - np.asarray(Y0s[0])
    want = np.sqrt((0.25 * err ** 2).sum(axis=0)).mean()
    np.testing.assert_allclose(float(sig), max(want, 1e-3), rtol=1e-5)


def test_plan_reports_final_diverged_car2d():
    from mbd_tpu.planners import mbd

    env = envs.get_env("car2d")
    cfg = mbd.MBDConfig(Nsample=16, Hsample=6, Ndiffuse=4)
    res = mbd.plan(env, cfg, jax.random.PRNGKey(0), engine="vmap")
    assert res.final_diverged is not None
    assert not bool(res.final_diverged)
