"""The batched dynamics pipeline: substep loop + state structs.

Step semantics (one substep, MuJoCo-Euler-like with implicit joint damping):
  kin   = fk(q)
  M, b  = smooth_terms(q, qd)                      (CRBA + RNEA, exact)
  τ     = actuators + springs + limit penalty + contact penalty − bias
  qacc  = (M + h·diag(damping))⁻¹ (τ − damping·qd)  (damping-implicit Euler)
  qd'   = qd + h·qacc
  q'    = q ⊕ h·qd'   (quaternion exp-map for free joints, MuJoCo local-ω
                       convention)

An env step runs ``n_frames`` substeps under ``lax.scan`` — with the whole
thing inside ``vmap`` over Nsample the hot loop is fixed-shape dense batched
linear algebra, sized [B, nv, nv] (nv ≤ 28): exactly the regime the TPU
VPU/MXU wants.

``PipelineState`` mirrors the fields reference envs consume from brax
(pipeline_state.q/.qd/.x.pos/.xd.vel — e.g. mbd/envs/hopper.py:49-65,
mbd/envs/humanoidtrack.py:87-106): ``x`` holds world link poses (bodies
excluding world), ``xd`` world link velocities at the body-frame origin.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct

from ..core.math import quat_from_axis_angle, quat_mul
from . import collision, contact, dynamics, kinematics
from .system import FREE, HINGE, SLIDE, System


@struct.dataclass
class X:
    pos: jnp.ndarray   # (nlink, 3)
    rot: jnp.ndarray   # (nlink, 4)


@struct.dataclass
class Xd:
    vel: jnp.ndarray   # (nlink, 3) velocity of body-frame origin, world
    ang: jnp.ndarray   # (nlink, 3) angular velocity, world


@struct.dataclass
class PipelineState:
    q: jnp.ndarray
    qd: jnp.ndarray
    x: X
    xd: Xd


def make_state(sys: System, q: jnp.ndarray, qd: jnp.ndarray) -> PipelineState:
    kin = kinematics.fk(sys, q)
    v_b = kinematics.body_velocities(sys, kin, qd)
    ang = v_b[1:, :3]
    # velocity of body origin p: v(p) = lin_O + ω × p
    vel = v_b[1:, 3:] + jnp.cross(ang, kin.xpos[1:])
    return PipelineState(
        q=q, qd=qd,
        x=X(pos=kin.xpos[1:], rot=kin.xquat[1:]),
        xd=Xd(vel=vel, ang=ang),
    )


def pipeline_init(sys: System, q: jnp.ndarray,
                  qd: jnp.ndarray) -> PipelineState:
    return make_state(sys, q, qd)


def integrate_pos(sys: System, q: jnp.ndarray, qd: jnp.ndarray,
                  dt) -> jnp.ndarray:
    """q ⊕ dt·qd with MuJoCo conventions (free-joint ω is body-local).

    1-dof joints integrate in one vectorized scatter; free joints (at most a
    couple per scene) use the quaternion exponential map.
    """
    import numpy as np

    qadr_1, dadr_1, free_j = [], [], []
    for j in range(sys.njnt):
        jt = sys.jnt_type[j]
        if jt == FREE:
            free_j.append(j)
        elif jt in (HINGE, SLIDE):
            qadr_1.append(sys.jnt_qposadr[j])
            dadr_1.append(sys.jnt_dofadr[j])
        else:
            raise NotImplementedError
    qn = q
    if qadr_1:
        qa = np.asarray(qadr_1, np.int32)
        da = np.asarray(dadr_1, np.int32)
        qn = qn.at[qa].add(dt * qd[da])
    for j in free_j:
        qadr, dadr = sys.jnt_qposadr[j], sys.jnt_dofadr[j]
        qn = qn.at[qadr:qadr + 3].add(dt * qd[dadr:dadr + 3])
        quat = q[qadr + 3:qadr + 7]
        w_local = qd[dadr + 3:dadr + 6]
        angle = jnp.linalg.norm(w_local) * dt
        axis = w_local / jnp.maximum(jnp.linalg.norm(w_local), 1e-12)
        dq = quat_from_axis_angle(axis, angle)
        quat_new = quat_mul(quat, dq)
        quat_new = quat_new / jnp.linalg.norm(quat_new)
        qn = qn.at[qadr + 3:qadr + 7].set(quat_new)
    return qn


def _substep(sys: System, q: jnp.ndarray, qd: jnp.ndarray,
             ctrl: jnp.ndarray):
    h = sys.dt
    kin = kinematics.fk(sys, q)
    M, qfrc_bias, v_b, _ = dynamics.smooth_terms(sys, kin, qd)

    M_imp = M + h * jnp.diag(sys.dof_damping
                             + dynamics.limit_implicit_damping(sys, q))
    L = jax.scipy.linalg.cho_factor(M_imp, lower=True)
    Minv = jax.scipy.linalg.cho_solve(L, jnp.eye(sys.nv, dtype=q.dtype))

    tau = dynamics.actuator_force(sys, ctrl)
    tau = tau + dynamics.passive_force(sys, q, qd)

    rhs = tau - qfrc_bias - sys.dof_damping * qd
    # contacts + joint limits solved together as one PGS sweep (limits
    # are 1-dof unilateral constraints — see dynamics.limit_constraints)
    lim = dynamics.limit_constraints(sys, q)
    if sys.contact_pairs or lim is not None:
        con = None
        if sys.contact_pairs:
            gpos, gquat = kinematics.geom_poses(sys, kin)
            con = collision.collide(sys, gpos, gquat)
        # rhs (pre-constraint) feeds the predicted-velocity impulse cap
        rhs = rhs + contact.contact_force(sys, kin, v_b, con, Minv, rhs,
                                          qd, lim)
    qacc = Minv @ rhs

    qd_new = qd + h * qacc
    q_new = integrate_pos(sys, q, qd_new, h)
    return q_new, qd_new


def pipeline_step(sys: System, state: PipelineState, ctrl: jnp.ndarray,
                  n_frames: int) -> PipelineState:
    def body(carry, _):
        q, qd = carry
        q, qd = _substep(sys, q, qd, ctrl)
        return (q, qd), None

    (q, qd), _ = jax.lax.scan(body, (state.q, state.qd), None,
                              length=n_frames)
    return make_state(sys, q, qd)
