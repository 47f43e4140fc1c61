"""Forward kinematics: world poses + per-dof motion subspaces.

The tree walk is a static Python loop over bodies (MuJoCo guarantees
parent-before-child ordering; nbody ≤ ~20 for all our scenes), so under
``vmap`` every op is a small batched elementwise kernel and the whole walk
fuses. The output ``S`` (nv, 6) — world-frame motion subspace per dof about
the world origin, [ang, lin] — is what turns the downstream dynamics
(CRBA/RNEA/Jacobians) into dense masked einsums; see sim/dynamics.py.

Spatial conventions as in core/math.py. Joint-frame composition follows
MuJoCo semantics: body frame = parent ∘ (body_pos, body_quat), then each
joint applied in declaration order about its local anchor/axis; free joints
place the body directly in world coordinates (and their angular qd is
body-local — verified against MuJoCo, see tests/test_sim_oracle.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math import quat_from_axis_angle, quat_mul, quat_rotate, quat_to_mat
from .system import FREE, HINGE, SLIDE, System


class Kin(NamedTuple):
    xpos: jnp.ndarray    # (nbody, 3) body frame origin, world
    xquat: jnp.ndarray   # (nbody, 4) body frame orientation, world
    S: jnp.ndarray       # (nv, 6) motion subspace per dof, world, [ang, lin]


def _body_joints(sys: System, b: int):
    return [j for j in range(sys.njnt) if sys.jnt_bodyid[j] == b]


def fk(sys: System, q: jnp.ndarray) -> Kin:
    """Compute world body poses and dof subspaces from generalized position.

    ``q`` may carry leading batch dims? No — keep it single-sample; batch via
    vmap (the planner always vmaps the full step).
    """
    dtype = q.dtype
    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1.0, 0.0, 0.0, 0.0], dtype)]
    S_rows = [None] * sys.nv

    for b in range(1, sys.nbody):
        p = sys.body_parentid[b]
        pos = xpos[p] + quat_rotate(xquat[p], sys.body_pos[b])
        quat = quat_mul(xquat[p], sys.body_quat[b])

        for j in _body_joints(sys, b):
            jt = sys.jnt_type[j]
            qadr, dadr = sys.jnt_qposadr[j], sys.jnt_dofadr[j]
            if jt == FREE:
                pos = q[qadr:qadr + 3]
                quat = q[qadr + 3:qadr + 7]
                quat = quat / jnp.linalg.norm(quat)
                R = quat_to_mat(quat)
                zero3 = jnp.zeros(3, dtype)
                for k in range(3):
                    e = jnp.zeros(3, dtype).at[k].set(1.0)
                    S_rows[dadr + k] = jnp.concatenate([zero3, e])
                for k in range(3):
                    w = R[:, k]
                    S_rows[dadr + 3 + k] = jnp.concatenate(
                        [w, jnp.cross(pos, w)])
            elif jt == HINGE:
                # MuJoCo rotates by (q - qpos0) — the `ref` attribute
                theta = q[qadr] - sys.init_q[qadr]
                axis_w = quat_rotate(quat, sys.jnt_axis[j])
                anchor_w = pos + quat_rotate(quat, sys.jnt_pos[j])
                dq = quat_from_axis_angle(sys.jnt_axis[j], theta)
                quat_new = quat_mul(quat, dq)
                pos = anchor_w - quat_rotate(quat_new, sys.jnt_pos[j])
                quat = quat_new
                S_rows[dadr] = jnp.concatenate(
                    [axis_w, jnp.cross(anchor_w, axis_w)])
            elif jt == SLIDE:
                axis_w = quat_rotate(quat, sys.jnt_axis[j])
                pos = pos + axis_w * (q[qadr] - sys.init_q[qadr])
                S_rows[dadr] = jnp.concatenate(
                    [jnp.zeros(3, dtype), axis_w])
            else:
                raise NotImplementedError(f"joint type {jt}")

        xpos.append(pos)
        xquat.append(quat)

    return Kin(xpos=jnp.stack(xpos), xquat=jnp.stack(xquat),
               S=jnp.stack(S_rows))


def geom_poses(sys: System, kin: Kin):
    """World positions/orientations of all geoms: (ngeom,3), (ngeom,4)."""
    bid = jnp.asarray(sys.geom_bodyid)
    bpos = kin.xpos[bid]
    bquat = kin.xquat[bid]
    gpos = bpos + quat_rotate(bquat, sys.geom_pos)
    gquat = quat_mul(bquat, sys.geom_quat)
    return gpos, gquat


def body_velocities(sys: System, kin: Kin, qd: jnp.ndarray) -> jnp.ndarray:
    """World spatial velocity (about world origin) of every body: (nbody, 6).

    v_b = Σ_{i ∈ ancestor dofs of b} S_i qd_i — one masked matmul.
    """
    W = kin.S * qd[:, None]                       # (nv, 6)
    return sys.mask_ancdof_body @ W               # (nbody, 6)
