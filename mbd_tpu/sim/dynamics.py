"""Smooth articulated dynamics as dense masked einsums (TPU-first).

Replaces brax's per-link scatter/gather pipelines (the reference's
``backend="positional"``/``"generalized"``, SURVEY §2.B) with a formulation
where every stage is a batched dense contraction over static topology masks:

  CRBA   : M[i,j]  = S_i · (I^c_{body(i)} S_j), masked by dof ancestry
  RNEA   : C_i     = S_i · Σ_{b ∈ subtree(body(i))} f_b, with
           f_b = I_b a_b + v_b ×f* (I_b v_b), a_b from per-dof Ṡ q̇ terms
  gravity: the a₀ = −g trick folds gravity into the bias force

Under ``vmap`` over Nsample these become [B, nv, 6] × [B, 6, nv]-shaped
contractions + [nv, nv] mask products — MXU-friendly at batch scale, no
data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.math import force_cross, motion_cross, quat_to_mat, quat_rotate, \
    spatial_inertia
from .kinematics import Kin
from .system import System


def body_spatial_inertias(sys: System, kin: Kin) -> jnp.ndarray:
    """(nbody, 6, 6) world-frame spatial inertia of each body about origin."""
    com = kin.xpos + quat_rotate(kin.xquat, sys.body_ipos)
    # rotational inertia about CoM in world axes
    from ..core.math import quat_mul
    iq = quat_mul(kin.xquat, sys.body_iquat)
    R = quat_to_mat(iq)
    I_diag = sys.body_inertia[..., None] * jnp.swapaxes(R, -1, -2)
    I_world = R @ I_diag
    return spatial_inertia(sys.body_mass, I_world, com)


def mass_matrix(sys: System, kin: Kin, I_b: jnp.ndarray) -> jnp.ndarray:
    """(nv, nv) joint-space inertia matrix via composite-rigid-body.

    I^c_b = Σ_{d ∈ subtree(b)} I_d  (mask_subtree einsum)
    M[i,j] = S_j^T I^c_{body(i)} S_i for body(j) ancestor-or-self of body(i),
    symmetrized; armature added on the diagonal.
    """
    Ic = jnp.einsum("bd,dxy->bxy", sys.mask_subtree, I_b)   # (nbody,6,6)
    dof_body = np.asarray(sys.dof_bodyid)
    Ic_dof = Ic[dof_body]                                   # (nv,6,6)
    F = jnp.einsum("ixy,iy->ix", Ic_dof, kin.S)             # (nv,6)
    M_raw = jnp.einsum("ix,jx->ij", F, kin.S)               # (nv,nv)
    D = sys.mask_dof_dof
    M = D * M_raw + (1.0 - D) * D.T * M_raw.T
    return M + jnp.diag(sys.dof_armature)


def smooth_terms(sys: System, kin: Kin, qd: jnp.ndarray):
    """All smooth dynamics quantities in one pass.

    Returns (M, qfrc_bias, v_b, I_b):
      M         (nv, nv)  mass matrix (with armature)
      qfrc_bias (nv,)     C qd + G  (sign: qacc = M⁻¹(tau − qfrc_bias))
      v_b       (nbody,6) world spatial velocities
      I_b       (nbody,6,6) world spatial inertias
    """
    dof_body = np.asarray(sys.dof_bodyid)

    I_b = body_spatial_inertias(sys, kin)
    M = mass_matrix(sys, kin, I_b)

    # body velocities
    W = kin.S * qd[:, None]                                  # (nv,6)
    v_b = sys.mask_ancdof_body @ W                           # (nbody,6)

    # bias accelerations: a_b = −g + Σ_{i∈ancdofs(b)} Ṡ_i q̇_i with
    # Ṡ_i = v_partial_i ×m S_i, v_partial_i = velocity from strictly earlier
    # dofs only (MuJoCo cdof_dot semantics for multi-dof bodies)
    v_partial = sys.mask_dof_prevdof @ W                     # (nv,6)
    Sdot_qd = motion_cross(v_partial, W)                     # (nv,6)
    a_b = sys.mask_ancdof_body @ Sdot_qd                     # (nbody,6)
    g_spatial = jnp.concatenate([jnp.zeros(3, qd.dtype), -sys.gravity])
    a_b = a_b + g_spatial

    # spatial forces
    Iv = jnp.einsum("bxy,by->bx", I_b, v_b)
    f_b = jnp.einsum("bxy,by->bx", I_b, a_b) + force_cross(v_b, Iv)

    # project into joint space: C_i = S_i · Σ_{d∈subtree(body(i))} f_d
    f_sub = sys.mask_subtree @ f_b                           # (nbody,6)
    qfrc_bias = jnp.einsum("ix,ix->i", kin.S, f_sub[dof_body])
    return M, qfrc_bias, v_b, I_b


def _onedof_maps(sys: System):
    """Static (qadr, dadr) index arrays for all 1-dof (hinge/slide) joints,
    and the limited subset. Built from static tuples at trace time."""
    qadr, dadr, lim = [], [], []
    for j in range(sys.njnt):
        if sys.jnt_type[j] in (2, 3):
            qadr.append(sys.jnt_qposadr[j])
            dadr.append(sys.jnt_dofadr[j])
            lim.append(j)
    return np.asarray(qadr, np.int32), np.asarray(dadr, np.int32), \
        np.asarray(lim, np.int32)


def passive_force(sys: System, q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    """Joint springs −k·(q − q_spring) mapped to dofs (damping is implicit
    in the integrator; see pipeline)."""
    qadr, dadr, jids = _onedof_maps(sys)
    if len(dadr) == 0:
        return jnp.zeros(sys.nv, q.dtype)
    k = sys.jnt_stiffness[jids]
    spring = -k * (q[qadr] - sys.qpos_spring[qadr])
    return jnp.zeros(sys.nv, q.dtype).at[dadr].set(spring)


def limit_constraints(sys: System, q: jnp.ndarray):
    """Joint limits as unilateral 1-dof constraints for the PGS sweep
    (sim/contact.py): returns (dadr (L,) int, sign (L,) float,
    violation (L,) jnp) with one lower (+1) and one upper (-1) entry per
    limited 1-dof joint, ordered by joint id — the SAME order
    sim/batched.py builds its limit list, so the engines stay in parity —
    or None when nothing is limited.

    The earlier explicit limit-penalty torque (per-dof rest-pose
    effective mass, per-dof velocity-cancelling cap) ignored coupling
    through M⁻¹: many joints slamming their limits at once each
    cancelled their own violating velocity and the summed impulse
    catapulted the root (humanoid drop rebounding at 0.8× impact speed).
    Limit damping stays implicit (limit_implicit_damping)."""
    import numpy as np
    qadr_all, dadr_all, jids_all = _onedof_maps(sys)
    keep = [i for i, j in enumerate(jids_all) if sys.jnt_limited[j]]
    if not keep:
        return None
    keep = np.asarray(keep, np.int32)
    qadr, dadr, jids = qadr_all[keep], dadr_all[keep], jids_all[keep]
    lo = sys.jnt_range[jids, 0]
    hi = sys.jnt_range[jids, 1]
    qj = q[qadr]
    below = jnp.maximum(lo - qj, 0.0)
    above = jnp.maximum(qj - hi, 0.0)
    L = len(keep)
    out_dadr = np.empty(2 * L, np.int32)
    out_sign = np.empty(2 * L, np.float64)
    out_dadr[0::2] = dadr
    out_dadr[1::2] = dadr
    out_sign[0::2] = 1.0
    out_sign[1::2] = -1.0
    vio = jnp.stack([below, above], axis=1).reshape(-1)
    return out_dadr, out_sign, vio


def limit_implicit_damping(sys: System, q: jnp.ndarray) -> jnp.ndarray:
    """(nv,) extra diagonal damping when a joint is beyond its limit,
    to be added (×h) to the implicit integrator matrix."""
    qadr_all, dadr_all, jids_all = _onedof_maps(sys)
    keep = [i for i, j in enumerate(jids_all) if sys.jnt_limited[j]]
    out = jnp.zeros(sys.nv, q.dtype)
    if not keep:
        return out
    keep = np.asarray(keep, np.int32)
    qadr, dadr, jids = qadr_all[keep], dadr_all[keep], jids_all[keep]
    lo = sys.jnt_range[jids, 0]
    hi = sys.jnt_range[jids, 1]
    qj = q[qadr]
    active = ((qj < lo) | (qj > hi)).astype(q.dtype)
    d_lim = sys.limit_damping * sys.dof_limit_meff[dadr] * active
    return out.at[dadr].set(d_lim)


def actuator_force(sys: System, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Motor torques: gear · clip(ctrl, ctrlrange) on the joint's first dof."""
    u = jnp.clip(ctrl, sys.actuator_ctrlrange[:, 0],
                 sys.actuator_ctrlrange[:, 1])
    force = sys.actuator_gear * u
    dadr = np.asarray([sys.jnt_dofadr[sys.actuator_jntid[a]]
                       for a in range(sys.nu)], np.int32)
    return jnp.zeros(sys.nv, ctrl.dtype).at[dadr].add(force)
