"""Engine oracle tests: our batched dynamics vs the MuJoCo C library.

MuJoCo is used as ground truth for kinematics and smooth dynamics (the
reference delegates these to brax; our fidelity bar for contacts is
behavioral/reward parity, tested separately).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mbd_tpu.envs.physics import asset_path
from mbd_tpu.sim import dynamics as D
from mbd_tpu.sim import kinematics as K
from mbd_tpu.sim import pipeline as P
from mbd_tpu.sim.system import load_mjcf

SCENES = ["cartpole", "hopper", "walker2d", "ant", "halfcheetah", "pushT",
          "humanoidrun", "humanoidstandup", "humanoidtrack"]


def _rand_state(m, seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    q = m.qpos0 + rng.normal(size=m.nq) * scale
    for j in range(m.njnt):
        if m.jnt_type[j] == 0:
            adr = m.jnt_qposadr[j]
            q[adr + 3:adr + 7] /= np.linalg.norm(q[adr + 3:adr + 7])
    qd = rng.normal(size=m.nv) * 0.5
    return q, qd


@pytest.mark.parametrize("scene", SCENES)
def test_fk_matches_mujoco(scene):
    path = asset_path(f"{scene}.xml")
    m = mujoco.MjModel.from_xml_path(path)
    d = mujoco.MjData(m)
    sys = load_mjcf(path)
    q, _ = _rand_state(m)
    d.qpos[:] = q
    mujoco.mj_kinematics(m, d)
    kin = K.fk(sys, jnp.asarray(q, jnp.float32))
    np.testing.assert_allclose(np.asarray(kin.xpos), d.xpos, atol=1e-5)
    qerr = np.minimum(
        np.abs(np.asarray(kin.xquat) - d.xquat).max(axis=-1),
        np.abs(np.asarray(kin.xquat) + d.xquat).max(axis=-1)).max()
    assert qerr < 1e-5


@pytest.mark.parametrize("scene", SCENES)
def test_mass_matrix_and_bias_match_mujoco(scene):
    path = asset_path(f"{scene}.xml")
    m = mujoco.MjModel.from_xml_path(path)
    d = mujoco.MjData(m)
    sys = load_mjcf(path)
    q, qd = _rand_state(m)
    d.qpos[:] = q
    d.qvel[:] = qd
    mujoco.mj_forward(m, d)
    Mfull = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, Mfull)
    kin = K.fk(sys, jnp.asarray(q, jnp.float32))
    M, bias, _, _ = D.smooth_terms(sys, kin, jnp.asarray(qd, jnp.float32))
    scale = max(np.abs(Mfull).max(), 1.0)
    np.testing.assert_allclose(np.asarray(M), Mfull, atol=2e-4 * scale)
    bscale = max(np.abs(d.qfrc_bias).max(), 1.0)
    np.testing.assert_allclose(np.asarray(bias), d.qfrc_bias,
                               atol=5e-4 * bscale)


def test_cartpole_trajectory_matches_mujoco_euler():
    """Smooth-regime stepping is near-bitwise vs MuJoCo's Euler integrator."""
    path = asset_path("cartpole.xml")
    m = mujoco.MjModel.from_xml_path(path)
    m.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER
    d = mujoco.MjData(m)
    sys = load_mjcf(path)
    q0 = m.qpos0 + np.array([0.0, np.pi + 0.2])
    qd0 = np.array([0.0, 0.5])
    d.qpos[:] = q0
    d.qvel[:] = qd0
    st = P.pipeline_init(sys, jnp.asarray(q0, jnp.float32),
                         jnp.asarray(qd0, jnp.float32))
    step = jax.jit(lambda s: P.pipeline_step(sys, s, jnp.zeros(1), 1))
    for _ in range(100):
        mujoco.mj_step(m, d)
        st = step(st)
    np.testing.assert_allclose(np.asarray(st.q), d.qpos, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st.qd), d.qvel, atol=1e-2)


def test_standup_contact_equilibrium_matches_mujoco():
    """Penalty contacts settle a lying humanoid at MuJoCo's rest height."""
    path = asset_path("humanoidstandup.xml")
    m = mujoco.MjModel.from_xml_path(path)
    d = mujoco.MjData(m)
    sys = load_mjcf(path)
    d.qpos[:] = m.qpos0
    st = P.pipeline_init(sys, jnp.asarray(m.qpos0, jnp.float32),
                         jnp.zeros(sys.nv))
    step = jax.jit(lambda s: P.pipeline_step(sys, s, jnp.zeros(sys.nu), 1))
    for _ in range(170):  # ~1 s
        mujoco.mj_step(m, d)
        st = step(st)
    ours = float(st.x.pos[0, 2])
    theirs = float(d.xpos[1, 2])
    assert abs(ours - theirs) < 0.05, (ours, theirs)
    assert ours > 0.0  # does not sink through the floor


def test_free_joint_qvel_convention():
    """Free-joint qd[3:6] is body-local angular velocity (MuJoCo parity)."""
    xml = """<mujoco><option gravity="0 0 0"/><worldbody>
    <body name="b" pos="0 0 1"><joint type="free"/>
    <geom type="sphere" size="0.1" mass="1"/></body>
    </worldbody></mujoco>"""
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".xml") as f:
        f.write(xml)
        f.flush()
        sys = load_mjcf(f.name)
    # body rotated 90° about z; local x angular velocity = world y
    q = jnp.asarray(np.array(
        [0, 0, 1, np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]), jnp.float32)
    qd = jnp.zeros(6).at[3].set(1.0)
    st = P.make_state(sys, q, qd)
    np.testing.assert_allclose(np.asarray(st.xd.ang[0]), [0.0, 1.0, 0.0],
                               atol=1e-6)
