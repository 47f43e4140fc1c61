"""Unit tests: quaternion/spatial math against scipy + numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from mbd_tpu.core import math as m


def _rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_mul_matches_scipy(rng):
    for _ in range(10):
        a, b = _rand_quat(rng), _rand_quat(rng)
        got = np.asarray(m.quat_mul(jnp.asarray(a), jnp.asarray(b)))
        # scipy uses xyzw
        ra = R.from_quat(np.roll(a, -1))
        rb = R.from_quat(np.roll(b, -1))
        want = np.roll((ra * rb).as_quat(), 1)
        if np.sign(want[0]) != np.sign(got[0]):
            want = -want
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    for _ in range(10):
        q = _rand_quat(rng)
        v = rng.normal(size=3)
        got = np.asarray(m.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        want = R.from_quat(np.roll(q, -1)).apply(v)
        np.testing.assert_allclose(got, want, atol=1e-6)
        # inverse rotation round-trips
        back = np.asarray(m.quat_rotate_inv(jnp.asarray(q), jnp.asarray(got)))
        np.testing.assert_allclose(back, v, atol=1e-5)


def test_quat_to_mat(rng):
    q = _rand_quat(rng)
    got = np.asarray(m.quat_to_mat(jnp.asarray(q)))
    want = R.from_quat(np.roll(q, -1)).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_quat_integrate_constant_omega(rng):
    # integrating omega=z*pi over dt=1 rotates pi about z
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    omega = jnp.array([0.0, 0.0, np.pi])
    q1 = m.quat_integrate(q0, omega, 1.0)
    want = R.from_rotvec([0, 0, np.pi]).as_quat()
    got = np.roll(np.asarray(q1), -1)
    if np.sign(got[2]) != np.sign(want[2]):
        want = -want
    np.testing.assert_allclose(got, want, atol=1e-6)
    # zero omega is identity-safe
    q2 = m.quat_integrate(q0, jnp.zeros(3), 0.1)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q0), atol=1e-7)


def test_spatial_inertia_point_mass():
    # point mass at c: force f at origin ↦ torque c × f
    mass = jnp.asarray(2.0)
    com = jnp.array([1.0, 2.0, 3.0])
    I = m.spatial_inertia(mass, jnp.zeros((3, 3)), com)
    # linear acceleration a maps to force m*a and torque m*c×a
    a = np.array([0.0, 0.0, -9.81])
    f = np.asarray(I) @ np.concatenate([np.zeros(3), a])
    np.testing.assert_allclose(f[3:], 2.0 * a, atol=1e-5)
    np.testing.assert_allclose(f[:3], 2.0 * np.cross(com, a), atol=1e-5)


def test_motion_cross_force_cross_duality(rng):
    # d/dt (v·f) consistency: (v ×m m)·f = -m·(v ×f* f)
    v = jnp.asarray(rng.normal(size=6))
    mvec = jnp.asarray(rng.normal(size=6))
    f = jnp.asarray(rng.normal(size=6))
    lhs = jnp.dot(m.motion_cross(v, mvec), f)
    rhs = -jnp.dot(mvec, m.force_cross(v, f))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_schedule_matches_reference_formulas():
    from mbd_tpu.core.schedule import make_schedule

    sched = make_schedule(100, 1e-4, 1e-2)
    betas = np.linspace(1e-4, 1e-2, 100)
    alphas = 1 - betas
    abar = np.cumprod(alphas)
    np.testing.assert_allclose(np.asarray(sched.alphas_bar), abar, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sched.sigmas), np.sqrt(1 - abar),
                               rtol=1e-4)
    assert float(sched.sigmas_cond[0]) == 0.0
