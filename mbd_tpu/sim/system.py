"""System: device-ready model description for the batched rigid-body engine.

Replaces the reference's dependency on ``brax.io.mjcf`` + brax ``System``
(SURVEY §2.B; reference usage at e.g. mbd/envs/humanoidrun.py:15,
mbd/envs/hopper.py:13). The MuJoCo C library is used **only at load time**
to compile MJCF into sizes/inertias/topology; at runtime everything is our
own JAX pytree and kernels.

Design: all numeric model parameters are jnp leaves; all *structural*
information (tree topology, joint types, addresses, contact-pair lists) is
baked into static aux fields (tuples) so a ``System`` can be closed over or
passed through ``jit`` without retracing on value changes. Dense boolean
masks derived from the topology (ancestor/subtree relations) are
precomputed here once; the dynamics then reduces to masked einsums —
no gather/scatter trees on device (TPU-first layout).

MuJoCo conventions kept at the API boundary (verified empirically):
 - quaternions are wxyz
 - free joint qpos = [pos(3), quat(4)]; qvel = [v_world_of_body_origin(3),
   omega_body_local(3)]
 - bodies are topologically ordered (parent index < child index)
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

# Joint types (MuJoCo mjtJoint values)
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3
# Geom types (MuJoCo mjtGeom values)
PLANE, SPHERE, CAPSULE, ELLIPSOID, CYLINDER, BOX = 0, 2, 3, 4, 5, 6

# Contact pair kinds handled by the engine (see sim/collision.py)
PAIR_PLANE_SPHERE = 0
PAIR_PLANE_CAPSULE = 1
PAIR_CAPSULE_CAPSULE = 2
PAIR_SPHERE_BOX = 3


@struct.dataclass
class System:
    # --- static structure (hashable aux data) ---
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nu: int = struct.field(pytree_node=False)
    nbody: int = struct.field(pytree_node=False)      # includes world (id 0)
    njnt: int = struct.field(pytree_node=False)
    ngeom: int = struct.field(pytree_node=False)
    body_parentid: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_type: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_qposadr: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_dofadr: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_limited: Tuple[bool, ...] = struct.field(pytree_node=False)
    dof_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_type: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
    actuator_jntid: Tuple[int, ...] = struct.field(pytree_node=False)
    link_names: Tuple[str, ...] = struct.field(pytree_node=False)
    # static contact pair list: (kind, geom_a, geom_b) with a/b ordered so
    # the primitive expected first by `kind` comes first
    contact_pairs: Tuple[Tuple[int, int, int], ...] = struct.field(
        pytree_node=False)

    # --- numeric model parameters (jnp leaves) ---
    dt: jnp.ndarray                  # substep timestep (XML option/timestep)
    gravity: jnp.ndarray             # (3,)
    body_pos: jnp.ndarray            # (nbody, 3) frame offset in parent
    body_quat: jnp.ndarray           # (nbody, 4)
    body_ipos: jnp.ndarray           # (nbody, 3) CoM offset in body frame
    body_iquat: jnp.ndarray          # (nbody, 4) inertia frame orientation
    body_mass: jnp.ndarray           # (nbody,)
    body_inertia: jnp.ndarray        # (nbody, 3) diagonal in inertia frame
    jnt_axis: jnp.ndarray            # (njnt, 3)
    jnt_pos: jnp.ndarray             # (njnt, 3) anchor in body frame
    jnt_range: jnp.ndarray           # (njnt, 2)
    jnt_stiffness: jnp.ndarray       # (njnt,)
    qpos_spring: jnp.ndarray         # (nq,) spring reference pose
    dof_armature: jnp.ndarray        # (nv,)
    dof_damping: jnp.ndarray         # (nv,)
    dof_limit_meff: jnp.ndarray      # (nv,) rest-pose 1/(M(q0)⁻¹)_ii — the
    # effective inertia used by the joint-limit penalty (precomputed on the
    # host; exact at q0, bounded error elsewhere, free at runtime)
    geom_pos: jnp.ndarray            # (ngeom, 3) offset in body frame
    geom_quat: jnp.ndarray           # (ngeom, 4)
    geom_size: jnp.ndarray           # (ngeom, 3)
    geom_friction: jnp.ndarray       # (ngeom, 3) [slide, torsion, roll]
    geom_rgba: jnp.ndarray           # (ngeom, 4) (visualization)
    actuator_gear: jnp.ndarray       # (nu,)
    actuator_ctrlrange: jnp.ndarray  # (nu, 2)
    init_q: jnp.ndarray              # (nq,)

    # penalty-solver gains (seeded from the XML brax custom numerics when
    # present — e.g. humanoidrun.xml constraint_stiffness=27000 — else
    # defaults; calibrated per env for reward parity)
    contact_stiffness: jnp.ndarray
    contact_damping: jnp.ndarray
    friction_vel_tol: jnp.ndarray    # regularized-Coulomb velocity scale
    limit_stiffness: jnp.ndarray
    limit_damping: jnp.ndarray

    # --- dense topology masks (jnp leaves, derived, static values) ---
    # ancdof_body[b, i] = 1 if dof i is on an ancestor-or-self body of b
    mask_ancdof_body: jnp.ndarray    # (nbody, nv)
    # ancbody_dof[i, j] = 1 if body(dof j) is ancestor-or-self of body(dof i)
    mask_dof_dof: jnp.ndarray        # (nv, nv)
    # prevdof[i, j] = 1 if dof j is on a strict-ancestor body of body(dof i),
    # or on the same body with j < i. This is the "partial velocity" mask for
    # Ṡ terms: MuJoCo's cdof_dot for dof i uses only earlier contributions.
    mask_dof_prevdof: jnp.ndarray    # (nv, nv)
    # subtree[b, d] = 1 if body d is in the subtree rooted at b
    mask_subtree: jnp.ndarray        # (nbody, nbody)

    # --- convenience sizes (parity with reference sys API) ---
    def q_size(self) -> int:
        return self.nq

    def qd_size(self) -> int:
        return self.nv

    def act_size(self) -> int:
        return self.nu


def _ancestors(parentid, b):
    # note: MuJoCo's world body (id 0) lists itself as its own parent
    out = []
    while True:
        out.append(b)
        if b == 0:
            return out
        b = parentid[b]


# Solver gains in ACCELERATION units (MuJoCo solref (0.02, 1) equivalent:
# k = 1/timeconst², b = 2/timeconst); forces are scaled by the effective
# mass at each constraint (see sim/contact.py), so these are stable across
# morphologies and timesteps.
_DEFAULT_GAINS = dict(contact_stiffness=2500.0, contact_damping=100.0,
                      friction_vel_tol=0.05, limit_stiffness=2500.0,
                      limit_damping=100.0)


def load_mjcf(path: str, dtype=jnp.float32) -> System:
    """Compile an MJCF file with MuJoCo and freeze it into a System pytree."""
    import mujoco

    m = mujoco.MjModel.from_xml_path(path)
    return from_mjmodel(m, dtype=dtype)


def from_mjmodel(m: Any, dtype=jnp.float32) -> System:
    import mujoco

    if np.any(m.jnt_type == mujoco.mjtJoint.mjJNT_BALL):
        raise NotImplementedError("ball joints not supported")

    parentid = tuple(int(p) for p in m.body_parentid)
    nbody, nv = m.nbody, m.nv

    # dense topology masks
    anc_sets = [set(_ancestors(parentid, b)) for b in range(nbody)]
    mask_subtree = np.zeros((nbody, nbody), np.float32)
    for d in range(nbody):
        for b in anc_sets[d]:
            mask_subtree[b, d] = 1.0
    dof_bodyid = tuple(int(b) for b in m.dof_bodyid)
    mask_ancdof_body = np.zeros((nbody, nv), np.float32)
    for b in range(nbody):
        for i in range(nv):
            if dof_bodyid[i] in anc_sets[b]:
                mask_ancdof_body[b, i] = 1.0
    # per-dof joint id and free-rotational flag (for the Ṡ partial-velocity
    # convention below)
    dof_jntid = [0] * nv
    for j in range(m.njnt):
        dadr = int(m.jnt_dofadr[j])
        ndof = {0: 6, 1: 3, 2: 1, 3: 1}[int(m.jnt_type[j])]
        for k in range(ndof):
            dof_jntid[dadr + k] = j

    mask_dof_dof = np.zeros((nv, nv), np.float32)
    mask_dof_prevdof = np.zeros((nv, nv), np.float32)
    for i in range(nv):
        bi = dof_bodyid[i]
        ji = dof_jntid[i]
        free_rot = (int(m.jnt_type[ji]) == 0 and
                    i >= int(m.jnt_dofadr[ji]) + 3)
        for j in range(nv):
            bj = dof_bodyid[j]
            if bj in anc_sets[bi]:
                mask_dof_dof[i, j] = 1.0
                if bj != bi:
                    mask_dof_prevdof[i, j] = 1.0
                elif free_rot:
                    # free-joint rotational dofs: velocity from the joint's
                    # own translations (and earlier joints), but not from
                    # sibling rotations (MuJoCo mj_comVel convention,
                    # verified empirically — see tests/test_sim_oracle.py)
                    if j < int(m.jnt_dofadr[ji]) + 3:
                        mask_dof_prevdof[i, j] = 1.0
                elif j < i:
                    mask_dof_prevdof[i, j] = 1.0

    # contact pair list under the MuJoCo contype/conaffinity mask, excluding
    # same-body and parent-child pairs (MuJoCo's default exclusions)
    pairs = []
    gt = m.geom_type
    for a in range(m.ngeom):
        for b in range(a + 1, m.ngeom):
            ba, bb = int(m.geom_bodyid[a]), int(m.geom_bodyid[b])
            if ba == bb:
                continue
            # MuJoCo's parent-child exclusion does NOT apply when the
            # parent is the world body (floor↔root-body contacts are real)
            if (parentid[bb] == ba and ba != 0) or \
               (parentid[ba] == bb and bb != 0):
                continue
            ok = (m.geom_contype[a] & m.geom_conaffinity[b]) or \
                 (m.geom_contype[b] & m.geom_conaffinity[a])
            if not ok:
                continue
            ta, tb = int(gt[a]), int(gt[b])
            kinds = {
                (PLANE, SPHERE): (PAIR_PLANE_SPHERE, a, b),
                (SPHERE, PLANE): (PAIR_PLANE_SPHERE, b, a),
                (PLANE, CAPSULE): (PAIR_PLANE_CAPSULE, a, b),
                (CAPSULE, PLANE): (PAIR_PLANE_CAPSULE, b, a),
                (CAPSULE, CAPSULE): (PAIR_CAPSULE_CAPSULE, a, b),
                (SPHERE, BOX): (PAIR_SPHERE_BOX, a, b),
                (BOX, SPHERE): (PAIR_SPHERE_BOX, b, a),
            }
            if (ta, tb) not in kinds:
                raise NotImplementedError(
                    f"unsupported contact pair geom types ({ta},{tb})")
            pairs.append(kinds[(ta, tb)])

    # custom numeric overrides (brax-tuned solver constants in the XMLs)
    customs = {}
    for i in range(m.nnumeric):
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_NUMERIC, i)
        adr, dim = m.numeric_adr[i], m.numeric_size[i]
        customs[name] = np.array(m.numeric_data[adr:adr + dim])
    # (the brax custom numerics in the XMLs — constraint_stiffness etc. —
    # parameterize brax's positional solver and don't transfer to the
    # effective-mass model; they are intentionally ignored)
    del customs
    gains = dict(_DEFAULT_GAINS)

    # actuators: motors on joints only
    act_jntid = []
    for u in range(m.nu):
        if m.actuator_trntype[u] != mujoco.mjtTrn.mjTRN_JOINT:
            raise NotImplementedError("only joint-transmission actuators")
        act_jntid.append(int(m.actuator_trnid[u, 0]))
    ctrlrange = np.array(m.actuator_ctrlrange, np.float64).copy()
    unlimited = ~m.actuator_ctrllimited.astype(bool)
    ctrlrange[unlimited] = [-1e9, 1e9]

    link_names = tuple(
        mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, b) or f"body{b}"
        for b in range(1, nbody))

    # rest-pose effective inertia per dof (for the limit penalty)
    d0 = mujoco.MjData(m)
    d0.qpos[:] = m.qpos0
    mujoco.mj_forward(m, d0)
    M0 = np.zeros((nv, nv))
    mujoco.mj_fullM(m, d0, M0)
    Minv0_diag = np.diag(np.linalg.inv(M0))
    dof_limit_meff = 1.0 / np.maximum(Minv0_diag, 1e-12)

    a = lambda x: jnp.asarray(np.array(x), dtype=dtype)  # noqa: E731
    return System(
        nq=int(m.nq), nv=int(nv), nu=int(m.nu), nbody=int(nbody),
        njnt=int(m.njnt), ngeom=int(m.ngeom),
        body_parentid=parentid,
        jnt_type=tuple(int(t) for t in m.jnt_type),
        jnt_bodyid=tuple(int(b) for b in m.jnt_bodyid),
        jnt_qposadr=tuple(int(x) for x in m.jnt_qposadr),
        jnt_dofadr=tuple(int(x) for x in m.jnt_dofadr),
        jnt_limited=tuple(bool(x) for x in m.jnt_limited),
        dof_bodyid=dof_bodyid,
        geom_type=tuple(int(t) for t in m.geom_type),
        geom_bodyid=tuple(int(b) for b in m.geom_bodyid),
        actuator_jntid=tuple(act_jntid),
        link_names=link_names,
        contact_pairs=tuple(pairs),
        dt=a(m.opt.timestep),
        gravity=a(m.opt.gravity),
        body_pos=a(m.body_pos), body_quat=a(m.body_quat),
        body_ipos=a(m.body_ipos), body_iquat=a(m.body_iquat),
        body_mass=a(m.body_mass), body_inertia=a(m.body_inertia),
        jnt_axis=a(m.jnt_axis), jnt_pos=a(m.jnt_pos),
        jnt_range=a(m.jnt_range),
        jnt_stiffness=a(m.jnt_stiffness),
        qpos_spring=a(m.qpos_spring),
        dof_armature=a(m.dof_armature), dof_damping=a(m.dof_damping),
        dof_limit_meff=a(dof_limit_meff),
        geom_pos=a(m.geom_pos), geom_quat=a(m.geom_quat),
        geom_size=a(m.geom_size), geom_friction=a(m.geom_friction),
        geom_rgba=a(m.geom_rgba),
        actuator_gear=a(m.actuator_gear[:, 0]),
        actuator_ctrlrange=a(ctrlrange),
        init_q=a(m.qpos0),
        contact_stiffness=a(gains["contact_stiffness"]),
        contact_damping=a(gains["contact_damping"]),
        friction_vel_tol=a(gains["friction_vel_tol"]),
        limit_stiffness=a(gains["limit_stiffness"]),
        limit_damping=a(gains["limit_damping"]),
        mask_ancdof_body=a(mask_ancdof_body),
        mask_dof_dof=a(mask_dof_dof),
        mask_dof_prevdof=a(mask_dof_prevdof),
        mask_subtree=a(mask_subtree),
    )
