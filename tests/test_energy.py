"""Energy-conservation regression tests (the anti-trampoline contract).

Locks the fix in sim/contact.py / sim/batched.py: contacts and joint limits
may store or dissipate mechanical energy but never inject it (docs/
ENERGY_AUDIT.md). Uses hopper — the cheapest contact scene — and checks the
same defect the audit tool tracks:

    defect(t) = [KE + PE](t) − [KE + PE](0) − W_actuators(t) + W_damping(t)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbd_tpu import envs
from mbd_tpu.sim import dynamics, kinematics
from mbd_tpu.sim import pipeline as P


def _audit(env, us, seed=0):
    """One jitted scan over the whole rollout (the eager per-substep loop
    cost ~1 min/test on the 1-core CI host; this compiles once and reuses
    the persistent cache across runs)."""
    sys_ = env.sys
    rng_reset = jax.random.split(jax.random.PRNGKey(seed))[1]
    st = env.reset(rng_reset)
    g = 9.81
    damping = jnp.asarray(sys_.dof_damping)
    h = float(np.asarray(sys_.dt))

    def energy(q, qd):
        kin = kinematics.fk(sys_, q)
        M, _, _, _ = dynamics.smooth_terms(sys_, kin, qd)
        return 0.5 * qd @ (M @ qd) + \
            (sys_.body_mass[1:] * g * kin.xpos[1:, 2]).sum()

    def step(carry, u):
        q, qd, W, Wd = carry
        tau = dynamics.actuator_force(sys_, u)

        def sub(c, _):
            q, qd, W, Wd = c
            qn, qdn = P._substep(sys_, q, qd, u)
            qd_mid = 0.5 * (qd + qdn)
            return (qn, qdn, W + (tau @ qd_mid) * h,
                    Wd + (damping * qd_mid ** 2).sum() * h), None

        (q, qd, W, Wd), _ = jax.lax.scan(
            sub, (q, qd, W, Wd), None, length=env.n_frames)
        return (q, qd, W, Wd), (energy(q, qd) - W + Wd,
                                jnp.abs(qd).max())

    @jax.jit
    def run(q0, qd0, us):
        e0 = energy(q0, qd0)
        zero = jnp.zeros((), q0.dtype)
        (q, qd, _, _), (series, peaks) = jax.lax.scan(
            step, (q0, qd0, zero, zero), us)
        return series - e0, peaks, q, qd

    defects, qd_peaks, q, qd = run(jnp.asarray(st.pipeline_state.q),
                                   jnp.asarray(st.pipeline_state.qd),
                                   jnp.asarray(us, jnp.float32))
    return np.asarray(defects), np.asarray(qd_peaks), (q, qd)


@pytest.mark.slow
def test_zero_ctrl_drop_is_dissipative():
    env = envs.get_env("hopper")
    us = np.zeros((25, env.action_size))
    defects, _, _ = _audit(env, us)
    # small positive slack for integrator/trapezoid error on the drop impact
    assert defects.max() < 1.0, f"energy injected: defect {defects.max():.2f}"
    # the collapse must actually dissipate by the end
    assert defects[-1] < 0.0


@pytest.mark.slow
def test_bangbang_ctrl_is_dissipative():
    """Full-torque excitation: all motion must be paid for by actuator work."""
    env = envs.get_env("hopper")
    H, nu = 25, env.action_size
    us = np.sign(np.sin(np.arange(H)[:, None] * 0.7
                        + np.arange(nu)[None] * 1.3))
    defects, _, _ = _audit(env, us)
    assert defects.max() < 1.0, f"energy injected: defect {defects.max():.2f}"


@pytest.mark.slow
def test_multi_contact_drop_is_dissipative():
    """Ant free-fall onto four feet — the round-3 regression case.

    Pre-PGS, each of the simultaneous contacts (and limit springs)
    cancelled the full approach velocity it predicted from the same
    pre-constraint snapshot (Jacobi), so the summed impulse catapulted the
    root ballistic to 18–32 m (docs/ENERGY_AUDIT.md round-3 section). The
    Gauss–Seidel sweep must keep the coupled landing dissipative."""
    env = envs.get_env("ant")
    us = np.zeros((25, env.action_size))
    defects, _, (q, _) = _audit(env, us)
    assert defects.max() < 1.0, f"energy injected: defect {defects.max():.2f}"
    # and the root must end near the floor, not on a ballistic arc
    assert float(q[2]) < 1.0, f"root at z={float(q[2]):.2f} m after drop"


@pytest.mark.slow
def test_contact_bounce_bounded():
    """A body slammed into the plane may leave the impact with at most the
    bounded Baumgarte pushout velocity (V_PUSH_MAX), never a trampoline kick."""
    from mbd_tpu.sim.contact import V_PUSH_MAX

    env = envs.get_env("hopper")
    rng_reset = jax.random.split(jax.random.PRNGKey(0))[1]
    st = env.reset(rng_reset)
    q = jnp.asarray(st.pipeline_state.q)
    qd = jnp.asarray(st.pipeline_state.qd).at[1].set(-3.0)  # slam root-z down
    sys_ = env.sys
    substep = jax.jit(lambda q, qd: P._substep(sys_, q, qd,
                                               jnp.zeros(env.action_size)))
    vz_after_impact = []
    for _ in range(120):   # 0.24 s — through impact and rebound
        q, qd = substep(q, qd)
        vz_after_impact.append(float(qd[1]))
    # rebound velocity of the root: bounded by pushout + pendulum slack (the
    # unactuated leg can convert a little rotational energy back), far below
    # the -3 m/s a trampoline would return
    assert max(vz_after_impact) < max(3.0 * V_PUSH_MAX, 0.75), (
        f"bounce {max(vz_after_impact):.2f} m/s from a 3 m/s slam")
