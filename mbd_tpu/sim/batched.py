"""Batch-last ("sample-major") engine core: the TPU hot path.

The vmap engine (sim/pipeline.py) is correctness-first: per-sample tensors
are tiny ([B, nv, 6] etc. with nv≤28), so on TPU each op wastes almost the
entire 8×128 vector tile and the batched Cholesky hits slow library paths.
This module re-expresses the SAME dynamics with the batch axis LAST and
every model-structure contraction unrolled over the static topology:

  * state is q [nq, B], qd [nv, B] — B lives on TPU lanes
  * every physics quantity is a small stack of [B]-wide rows
  * CRBA/RNEA/Jacobian sums unroll over the nonzeros of the static
    ancestry masks (so sparsity costs nothing)
  * the M⁻¹ solve is a Cholesky unrolled over nv as [B]-wide FMAs

Every op is an elementwise [*, B] kernel that XLA fuses and tiles across
lanes — and the identical code runs unchanged inside a Pallas kernel body
(ops/rollout_pallas.py) where the whole H×n_frames rollout loops in VMEM.

Numerics match sim/pipeline.py (same formulas, same integrator); parity is
enforced by tests/test_batched_engine.py.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .system import FREE, HINGE, PLANE, SLIDE, System
from .system import (PAIR_CAPSULE_CAPSULE, PAIR_PLANE_CAPSULE,
                     PAIR_PLANE_SPHERE, PAIR_SPHERE_BOX)

Arr = jnp.ndarray   # [*B] or [k, *B]

# The batch ``B`` below is a SHAPE (tuple), not an int: callers may pass a
# flat (N,) batch or a VPU-register-shaped (8, N//8) batch. The sublane-
# packed form is the fast one on TPU: a [k≤6, N] row only fills k of the 8
# sublanes of every (8, 128) f32 vector register, wasting ≥ 5/8 of VPU
# throughput; [k, 8, N//8] rows are full registers. All engine math is
# elementwise over the batch, so the code below is written once, batch-shape
# polymorphic.


def _bshape(B) -> tuple:
    return (B,) if isinstance(B, int) else tuple(B)


def constv(vals, B, dtype) -> Arr:
    """[k, *B] constant built from python scalars (no captured device
    constants — required for use inside Pallas kernels)."""
    Bs = _bshape(B)
    return jnp.stack([jnp.full(Bs, float(x), dtype) for x in vals])


# ---------------------------------------------------------------------------
# precompute variant: compile-time vs runtime trade (trace-time switch)
# ---------------------------------------------------------------------------
# Two forms of the heavy per-substep precompute (world spatial inertias;
# PGS constraint rows / tree solves) — same formulas, same accumulation
# order, same PGS sweep; a compiled SUBSTEP is bit-identical across
# variants (tests/test_precompute_variants.py). Inside a full rollout
# program XLA may fuse the two traces differently and reassociate f32,
# so long chaotic trajectories can drift at rounding level — judge
# planner rewards by level, not bitwise (same caveat as any trace-level
# change; .claude/skills/verify). Opposite compile/runtime trades, both
# measured on the humanoidrun denoise (TPU v5e, 2026-08-19):
#
#   "stacked" (default): body-/constraint-stacked builders, ONE tree solve
#       over a [C, *B] stack. Minutes-class cold compiles (full humanoid
#       bench in ~5 min vs ~90 min unrolled; fused humanoid harness rows
#       ~8 min vs >2 h), 8.3M env-steps/s (docs/BENCH_LIVE_r05.json).
#   "unrolled": per-body / per-constraint sparse builders — each tree
#       solve touches only the dofs its constraint actually reaches, so
#       fewer flops execute: ~37% faster (11.4M env-steps/s,
#       docs/BENCH_LIVE_r04.json) but hour-class cold Mosaic/XLA compiles
#       on humanoid-sized morphologies.
#
# The switch is read at TRACE time. Use the context manager around the
# jit/trace of the step you want, e.g.
#     with batched.precompute_variant("unrolled"):
#         fn = jax.jit(step); fn(...)   # first call must trace inside
PRECOMPUTE_VARIANT = "stacked"


@contextlib.contextmanager
def precompute_variant(name: str):
    if name not in ("stacked", "unrolled"):
        raise ValueError(f"unknown precompute variant: {name!r}")
    global PRECOMPUTE_VARIANT
    prev = PRECOMPUTE_VARIANT
    PRECOMPUTE_VARIANT = name
    try:
        yield
    finally:
        PRECOMPUTE_VARIANT = prev


# ---------------------------------------------------------------------------
# component-first (cf) quaternion/vec helpers: arrays are [3, B] / [4, B]
# ---------------------------------------------------------------------------

def qmul(a: Arr, b: Arr) -> Arr:
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def qrot(q: Arr, v: Arr) -> Arr:
    """Rotate [3, B] vector by [4, B] quaternion."""
    w = q[0]
    qv = q[1:]
    t = 2.0 * cross(qv, v)
    return v + w * t + cross(qv, t)


def cross(a: Arr, b: Arr) -> Arr:
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def dot3(a: Arr, b: Arr) -> Arr:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


# Axis-1 variants of the component-first helpers: operands carry an extra
# LEADING stacking axis ([C, 3, *B] / [C, 4, *B]). Used wherever per-body /
# per-constraint quantities are built stacked — one set of wide elementwise
# ops instead of per-item re-emission (the per-item form's slice/reshape
# churn dominated substep compile time). Formulas and accumulation order
# match the [k, *B] helpers exactly, so values are bit-identical per item.

def cross_c(a: Arr, b: Arr) -> Arr:
    return jnp.stack([a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
                      a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
                      a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]], axis=1)


def dot3_c(a: Arr, b: Arr) -> Arr:
    return a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1] + a[:, 2] * b[:, 2]


def qmul_c(a: Arr, b: Arr) -> Arr:
    aw, ax, ay, az = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    bw, bx, by, bz = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=1)


def qrot_c(q: Arr, v: Arr) -> Arr:
    w = q[:, 0]
    qv = q[:, 1:]
    t = 2.0 * cross_c(qv, v)
    return v + w[:, None] * t + cross_c(qv, t)


def quat_to_cols_c(q: Arr) -> Tuple[Arr, Arr, Arr]:
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    c0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y + w * z),
                    2 * (x * z - w * y)], axis=1)
    c1 = jnp.stack([2 * (x * y - w * z), 1 - 2 * (x * x + z * z),
                    2 * (y * z + w * x)], axis=1)
    c2 = jnp.stack([2 * (x * z + w * y), 2 * (y * z - w * x),
                    1 - 2 * (x * x + y * y)], axis=1)
    return c0, c1, c2


def quat_to_cols(q: Arr) -> Tuple[Arr, Arr, Arr]:
    """Columns of R(q) as three [3, B] vectors."""
    w, x, y, z = q
    c0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y + w * z),
                    2 * (x * z - w * y)])
    c1 = jnp.stack([2 * (x * y - w * z), 1 - 2 * (x * x + z * z),
                    2 * (y * z + w * x)])
    c2 = jnp.stack([2 * (x * z + w * y), 2 * (y * z - w * x),
                    1 - 2 * (x * x + y * y)])
    return c0, c1, c2


def axis_angle_quat(axis_const: np.ndarray, theta: Arr) -> Arr:
    """Quaternion [4, B] for rotation of theta [B] about a CONSTANT axis."""
    half = 0.5 * theta
    s = jnp.sin(half)
    return jnp.stack([jnp.cos(half), axis_const[0] * s, axis_const[1] * s,
                      axis_const[2] * s])


# ---------------------------------------------------------------------------
# FK (batch-last)
# ---------------------------------------------------------------------------

class KinB(NamedTuple):
    xpos: List[Arr]     # nbody × [3, B]
    xquat: List[Arr]    # nbody × [4, B]
    S: List[Arr]        # nv × [6, B]  ([ang, lin] about world origin)


def _body_joints(sys: System, b: int):
    return [j for j in range(sys.njnt) if sys.jnt_bodyid[j] == b]


def fk_b(sys: System, q: Arr) -> KinB:
    B = q.shape[1:]
    dtype = q.dtype
    np_ = lambda x: np.asarray(x)  # noqa: E731
    zero3 = jnp.zeros((3,) + B, dtype)
    init_q = np.asarray(sys.init_q)

    xpos: List[Arr] = [zero3]
    xquat: List[Arr] = [jnp.concatenate(
        [jnp.ones((1,) + B, dtype), jnp.zeros((3,) + B, dtype)])]
    S: List[Arr] = [None] * sys.nv

    body_pos = np_(sys.body_pos)
    body_quat = np_(sys.body_quat)
    jnt_axis = np_(sys.jnt_axis)
    jnt_pos = np_(sys.jnt_pos)

    def const3(v):
        return constv(v, B, dtype)

    for b in range(1, sys.nbody):
        p = sys.body_parentid[b]
        pos = xpos[p] + qrot(xquat[p], const3(body_pos[b]))
        quat = qmul(xquat[p], constv(body_quat[b], B, dtype))

        for j in _body_joints(sys, b):
            jt = sys.jnt_type[j]
            qadr, dadr = sys.jnt_qposadr[j], sys.jnt_dofadr[j]
            if jt == FREE:
                pos = q[qadr:qadr + 3]
                quat = q[qadr + 3:qadr + 7]
                quat = quat / jnp.sqrt((quat * quat).sum(0))
                c0, c1, c2 = quat_to_cols(quat)
                zB = jnp.zeros((3,) + B, dtype)
                for k in range(3):
                    e = constv([1.0 if i == k else 0.0 for i in range(3)],
                               B, dtype)
                    S[dadr + k] = jnp.concatenate([zB, e])
                for k, w in enumerate((c0, c1, c2)):
                    S[dadr + 3 + k] = jnp.concatenate([w, cross(pos, w)])
            elif jt == HINGE:
                theta = q[qadr] - init_q[qadr]
                axis_w = qrot(quat, const3(jnt_axis[j]))
                anchor_w = pos + qrot(quat, const3(jnt_pos[j]))
                dq = axis_angle_quat(jnt_axis[j], theta)
                quat = qmul(quat, dq)
                pos = anchor_w - qrot(quat, const3(jnt_pos[j]))
                S[dadr] = jnp.concatenate([axis_w, cross(anchor_w, axis_w)])
            elif jt == SLIDE:
                axis_w = qrot(quat, const3(jnt_axis[j]))
                pos = pos + axis_w * (q[qadr] - init_q[qadr])
                S[dadr] = jnp.concatenate([jnp.zeros((3,) + B, dtype),
                                           axis_w])
            else:
                raise NotImplementedError
        xpos.append(pos)
        xquat.append(quat)
    return KinB(xpos, xquat, S)


# ---------------------------------------------------------------------------
# smooth dynamics (batch-last, sparsity-unrolled)
# ---------------------------------------------------------------------------

def _anc_dofs(sys: System, b: int) -> List[int]:
    """Dof indices on ancestor-or-self bodies of b (static)."""
    mask = np.asarray(jax.device_get(sys.mask_ancdof_body))
    return [i for i in range(sys.nv) if mask[b, i] > 0]


class TopoCache:
    """Static topology unroll info, computed once per System."""

    def __init__(self, sys: System):
        A = np.asarray(sys.mask_ancdof_body)
        self.ancdof_body = [
            [i for i in range(sys.nv) if A[b, i] > 0]
            for b in range(sys.nbody)]
        D = np.asarray(sys.mask_dof_dof)
        self.dof_pairs = [(i, j) for i in range(sys.nv)
                          for j in range(sys.nv)
                          if j <= i and (D[i, j] > 0 or D[j, i] > 0)]
        P = np.asarray(sys.mask_dof_prevdof)
        self.prevdof = [[j for j in range(sys.nv) if P[i, j] > 0]
                        for i in range(sys.nv)]
        Sub = np.asarray(sys.mask_subtree)
        self.subtree = [[d for d in range(sys.nbody) if Sub[b, d] > 0]
                        for b in range(sys.nbody)]
        self.dof_body = list(sys.dof_bodyid)
        # M sparsity pattern as lower-triangular index set
        self.M_lower = {}
        for (i, j) in self.dof_pairs:
            self.M_lower[(i, j)] = True


_TOPO_CACHE: Dict[tuple, TopoCache] = {}


def topo(sys: System) -> TopoCache:
    # key on the FULL static structure (all hashable aux tuples): these
    # fields determine every mask TopoCache derives. (An id()-based key can
    # silently collide when ids are reused after GC — wrong physics.)
    key = (sys.nq, sys.nv, sys.nu, sys.nbody, sys.njnt, sys.ngeom,
           sys.body_parentid, sys.jnt_type, sys.jnt_bodyid, sys.jnt_qposadr,
           sys.jnt_dofadr, sys.jnt_limited, sys.dof_bodyid, sys.geom_type,
           sys.geom_bodyid, sys.actuator_jntid, sys.contact_pairs)
    if key not in _TOPO_CACHE:
        _TOPO_CACHE[key] = TopoCache(sys)
    return _TOPO_CACHE[key]


def _spatial_inertia_one(sys: System, kin: KinB, b: int) -> List[List[Arr]]:
    """6×6 world spatial inertia of body b as a nested list of [B] rows —
    the "unrolled" precompute-variant form (per-body python-scalar
    constants folded into the ops; sparse, but re-emits every component
    slice nbody× → hour-class humanoid compiles; see precompute_variant).
    """
    dtype = kin.xpos[1].dtype
    B = kin.xpos[1].shape[1:]
    m = float(np.asarray(sys.body_mass)[b])
    ipos = np.asarray(sys.body_ipos)[b]
    iquat = np.asarray(sys.body_iquat)[b]
    diag = np.asarray(sys.body_inertia)[b]

    const = lambda v: constv(v, B, dtype)  # noqa: E731
    com = kin.xpos[b] + qrot(kin.xquat[b], const(ipos))
    iq = qmul(kin.xquat[b], const(iquat))
    c0, c1, c2 = quat_to_cols(iq)
    # I_rot = R diag Rᵀ = Σ_k diag_k c_k c_kᵀ
    cols = (c0, c1, c2)
    Irot = [[sum(float(diag[k]) * cols[k][a] * cols[k][bb]
                 for k in range(3)) for bb in range(3)] for a in range(3)]
    cx, cy, cz = com[0], com[1], com[2]
    # m (c·c δ_ab − c_a c_b) added to I_rot gives I about origin
    c2sum = cx * cx + cy * cy + cz * cz
    comv = (cx, cy, cz)
    I = [[None] * 6 for _ in range(6)]
    for a in range(3):
        for bb in range(3):
            extra = m * ((c2sum if a == bb else 0.0) - comv[a] * comv[bb])
            I[a][bb] = Irot[a][bb] + extra
    # top-right m c× ; bottom-left m c×ᵀ ; bottom-right m I₃
    zeroB = jnp.zeros(B, dtype)
    cxm = [[zeroB, -m * cz, m * cy],
           [m * cz, zeroB, -m * cx],
           [-m * cy, m * cx, zeroB]]
    for a in range(3):
        for bb in range(3):
            I[a][3 + bb] = cxm[a][bb]
            I[3 + a][bb] = cxm[bb][a]
            I[3 + a][3 + bb] = jnp.full((), m, dtype) + zeroB \
                if a == bb else zeroB
    return I


def spatial_inertia_all(sys: System, kin: KinB) -> List[List[List[Arr]]]:
    """6×6 world spatial inertias of ALL bodies as nested lists of [B] rows.

    I = [[ I_rot + m c×c×ᵀ,  m c× ], [ m c×ᵀ, m·1 ]] about world origin,
    per body. Built ONCE on body-stacked [nbody−1, ·, *B] arrays and sliced
    back per (body, entry): the earlier per-body build re-emitted every
    component slice/reshape nbody× and was the single largest HLO-emission
    source in a humanoid substep (~19k of ~40k StableHLO lines), inflating
    fused-XLA and Mosaic compile times. Values bit-match the per-body form
    (identical formulas and accumulation order, elementwise over the stack).
    Returns I_all with I_all[0] = None (world body).

    Under precompute_variant("unrolled") the per-body form is emitted
    instead — fewer executed flops, hour-class humanoid compiles (see the
    variant-switch note at the top of this module).
    """
    if PRECOMPUTE_VARIANT == "unrolled":
        return [None] + [_spatial_inertia_one(sys, kin, b)
                         for b in range(1, sys.nbody)]
    dtype = kin.xpos[1].dtype
    B = kin.xpos[1].shape[1:]
    nb1 = sys.nbody - 1
    bodies = range(1, sys.nbody)
    # Body-stacked static constants, built from python scalars via
    # constv/jnp.full (full [*B] broadcast per entry). NEVER jnp.asarray a
    # numpy array here: that materializes a device constant which the
    # Pallas whole-rollout kernel cannot capture ("captures constants
    # [f32[nb1], ...]" at trace time) — same constraint sgn_stack in
    # contact_qfrc_b documents. The fulls are broadcasts that never leave
    # VMEM, so this costs nothing on either engine.
    m_np = np.asarray(sys.body_mass)[1:]
    ipos_np = np.asarray(sys.body_ipos)[1:]
    iquat_np = np.asarray(sys.body_iquat)[1:]
    diag_np = np.asarray(sys.body_inertia)[1:]
    m = jnp.stack([jnp.full(B, float(m_np[i]), dtype)
                   for i in range(nb1)])                     # [nb1, *B]
    ipos = jnp.stack([constv(ipos_np[i], B, dtype)
                      for i in range(nb1)])                  # [nb1, 3, *B]
    iquat = jnp.stack([constv(iquat_np[i], B, dtype)
                       for i in range(nb1)])                 # [nb1, 4, *B]
    dcol = [jnp.stack([jnp.full(B, float(diag_np[i, k]), dtype)
                       for i in range(nb1)]) for k in range(3)]

    xpos = jnp.stack([kin.xpos[b] for b in bodies])    # [nb1, 3, *B]
    xquat = jnp.stack([kin.xquat[b] for b in bodies])  # [nb1, 4, *B]

    com = xpos + qrot_c(xquat, ipos)
    iq = qmul_c(xquat, iquat)
    c0, c1, c2 = quat_to_cols_c(iq)
    # I_rot = R diag Rᵀ = Σ_k diag_k c_k c_kᵀ
    cols = (c0, c1, c2)
    Irot = [[sum(dcol[k] * cols[k][:, a] * cols[k][:, bb]
                 for k in range(3)) for bb in range(3)] for a in range(3)]
    cx, cy, cz = com[:, 0], com[:, 1], com[:, 2]
    # m (c·c δ_ab − c_a c_b) added to I_rot gives I about origin
    c2sum = cx * cx + cy * cy + cz * cz
    comv = (cx, cy, cz)
    I = [[None] * 6 for _ in range(6)]   # entries [nb1, *B]
    for a in range(3):
        for bb in range(3):
            extra = m * ((c2sum if a == bb else 0.0) - comv[a] * comv[bb])
            I[a][bb] = Irot[a][bb] + extra
    # top-right m c× ; bottom-left m c×ᵀ ; bottom-right m I₃
    zero = jnp.zeros((nb1,) + B, dtype)
    cxm = [[zero, -m * cz, m * cy],
           [m * cz, zero, -m * cx],
           [-m * cy, m * cx, zero]]
    mfull = m + zero
    for a in range(3):
        for bb in range(3):
            I[a][3 + bb] = cxm[a][bb]
            I[3 + a][bb] = cxm[bb][a]
            I[3 + a][3 + bb] = mfull if a == bb else zero
    out: List = [None]
    for bi in range(nb1):
        out.append([[I[a][cc][bi] for cc in range(6)] for a in range(6)])
    return out


def smooth_b(sys: System, kin: KinB, qd: Arr):
    """Returns (M_low dict[(i,j)→[B]], bias [nv×[B]], v_b list, I_sub).

    Same math as dynamics.smooth_terms, unrolled over static sparsity.
    """
    tc = topo(sys)
    dtype = qd.dtype
    B = qd.shape[1:]

    # per-body spatial inertias (about origin), built body-stacked
    I_b = spatial_inertia_all(sys, kin)

    # dofs directly on each body (static)
    own_dofs = [[i for i in range(sys.nv) if tc.dof_body[i] == b]
                for b in range(sys.nbody)]
    children = [[c for c in range(1, sys.nbody)
                 if sys.body_parentid[c] == b] for b in range(sys.nbody)]

    # composite (subtree) inertias by reverse tree accumulation
    Ic = [None] * sys.nbody
    for b in range(sys.nbody - 1, 0, -1):
        out = [row[:] for row in I_b[b]]
        for c in children[b]:
            Icc = Ic[c]
            for a in range(6):
                for cc in range(6):
                    out[a][cc] = out[a][cc] + Icc[a][cc]
        Ic[b] = out

    # W_i = S_i qd_i ; body velocities by forward tree accumulation
    W = [kin.S[i] * qd[i] for i in range(sys.nv)]
    v_b = [jnp.zeros((6,) + B, dtype)]
    for b in range(1, sys.nbody):
        v = v_b[sys.body_parentid[b]]
        for i in own_dofs[b]:
            v = v + W[i]
        v_b.append(v)

    # mass matrix: M[i,j] = S_j · (Ic_{body(i)} S_i)
    def matvec6(Imat, v):
        rows = [sum(Imat[a][c] * v[c] for c in range(6)) for a in range(6)]
        return jnp.stack(rows)

    F = [None] * sys.nv
    for i in range(sys.nv):
        F[i] = matvec6(Ic[tc.dof_body[i]], kin.S[i])
    M_low: Dict[Tuple[int, int], Arr] = {}
    for (i, j) in tc.dof_pairs:
        M_low[(i, j)] = (F[i] * kin.S[j]).sum(0)
    arm = np.asarray(sys.dof_armature)
    for i in range(sys.nv):
        M_low[(i, i)] = M_low[(i, i)] + float(arm[i])

    # bias: a_b = −g + Σ Ṡ_i q̇_i with Ṡ_i = v_partial_i ×m S_i
    def crm(v, m):
        vang, vlin = v[:3], v[3:]
        mang, mlin = m[:3], m[3:]
        return jnp.concatenate([cross(vang, mang),
                                cross(vang, mlin) + cross(vlin, mang)])

    # per-dof partial velocity: parent-body velocity + earlier same-body
    # dofs (free-joint rotations see translations only — tc.prevdof)
    Sdot_qd = []
    for i in range(sys.nv):
        b = tc.dof_body[i]
        vp = v_b[sys.body_parentid[b]]
        extra = [j for j in tc.prevdof[i] if tc.dof_body[j] == b]
        for j in extra:
            vp = vp + W[j]
        Sdot_qd.append(crm(vp, W[i]))

    g = np.asarray(sys.gravity)
    g_sp = np.concatenate([np.zeros(3), -g])
    a_b = [constv(g_sp, B, dtype)]
    for b in range(1, sys.nbody):
        a = a_b[sys.body_parentid[b]]
        for i in own_dofs[b]:
            a = a + Sdot_qd[i]
        a_b.append(a)

    def crf(v, f):
        vang, vlin = v[:3], v[3:]
        fang, flin = f[:3], f[3:]
        return jnp.concatenate([cross(vang, fang) + cross(vlin, flin),
                                cross(vang, flin)])

    f_b = [None] * sys.nbody
    for b in range(1, sys.nbody):
        Ib = I_b[b]
        Iv = matvec6(Ib, v_b[b])
        Ia = matvec6(Ib, a_b[b])
        f_b[b] = Ia + crf(v_b[b], Iv)

    # subtree force sums by reverse accumulation
    f_sub = [None] * sys.nbody
    for b in range(sys.nbody - 1, 0, -1):
        fs = f_b[b]
        for c in children[b]:
            fs = fs + f_sub[c]
        f_sub[b] = fs

    bias = [(kin.S[i] * f_sub[tc.dof_body[i]]).sum(0)
            for i in range(sys.nv)]

    return M_low, bias, v_b


# ---------------------------------------------------------------------------
# unrolled dense Cholesky solve over the static nv (batch-wide)
# ---------------------------------------------------------------------------

class LDL(NamedTuple):
    L: Dict[Tuple[int, int], Arr]   # strictly-lower factor entries (i, j<i)
    Dg: List[Arr]
    dof_parent: Tuple[int, ...]
    nv: int


def _dof_parents(sys: System) -> Tuple[int, ...]:
    """dof-tree parent: largest j < i with body(j) ancestor-or-self of
    body(i); −1 at roots. M's sparsity pattern is exactly the ancestor
    paths of this tree."""
    D = np.asarray(sys.mask_dof_dof)
    out = []
    for i in range(sys.nv):
        anc = [j for j in range(i) if D[i, j] > 0]
        out.append(anc[-1] if anc else -1)
    return tuple(out)


def ldl_factor(M_low: Dict[Tuple[int, int], Arr], sys: System,
               extra_diag: List = None) -> LDL:
    """Featherstone tree-sparse LᵀDL factorization (RBDA §6.5).

    Eliminates leaf-most dofs first, so a tree-structured M factors with
    ZERO fill: L has entries only at (dof, ancestor) positions. Ops are
    Σ_k depth(k)² [B]-wide FMAs instead of nv³/6.
    """
    nv = sys.nv
    parent = _dof_parents(sys)
    H: Dict[Tuple[int, int], Arr] = dict(M_low)
    if extra_diag is not None:
        for i in range(nv):
            if extra_diag[i] is not None:
                H[(i, i)] = H[(i, i)] + extra_diag[i]

    for k in range(nv - 1, -1, -1):
        i = parent[k]
        inv_d = 1.0 / H[(k, k)]
        while i >= 0:
            a = H[(k, i)] * inv_d
            j = i
            while j >= 0:
                H[(i, j)] = H[(i, j)] - a * H[(k, j)]
                j = parent[j]
            H[(k, i)] = a
            i = parent[i]

    L = {key: v for key, v in H.items() if key[0] != key[1]}
    Dg = [H[(i, i)] for i in range(nv)]
    return LDL(L, Dg, parent, nv)


def ldl_diag_inv(f: LDL, i: int) -> Arr:
    """(M⁻¹)_ii via the factorization: M⁻¹ = L⁻¹ D⁻¹ L⁻ᵀ, so
    (M⁻¹)_ii = Σ_k z_k²/D_k with z = L⁻ᵀ e_i, which lives only on the
    ancestor path of i — O(depth²) [B]-wide FMAs."""
    path = []
    j = i
    while j >= 0:
        path.append(j)
        j = f.dof_parent[j]
    # backward substitution along the path (Lᵀ z = e_i); z[i] ≡ 1
    z: Dict[int, Arr] = {}
    for a in path:                  # leaf→root order
        if a != i and a not in z:
            continue
        va = 1.0 if a == i else z[a]
        j = f.dof_parent[a]
        while j >= 0:
            Laj = f.L.get((a, j))
            if Laj is not None:
                t = Laj if isinstance(va, float) else Laj * va
                z[j] = -t if j not in z else z[j] - t
            j = f.dof_parent[j]
    out = 1.0 / f.Dg[i]
    for a, va in z.items():
        out = out + va * va / f.Dg[a]
    return out


def ldl_solve(f: LDL, rhs: List[Arr]) -> List[Arr]:
    """Solve (LᵀDL) x = rhs along the dof tree. rhs entries may be None
    (structural zeros)."""
    x: List[Arr] = list(rhs)
    # Lᵀ y = rhs (leaf → root)
    for i in range(f.nv - 1, -1, -1):
        if x[i] is None:
            continue
        j = f.dof_parent[i]
        while j >= 0:
            t = f.L[(i, j)] * x[i]
            x[j] = -t if x[j] is None else x[j] - t
            j = f.dof_parent[j]
    for i in range(f.nv):
        if x[i] is not None:
            x[i] = x[i] / f.Dg[i]
    # L x = y (root → leaf)
    for i in range(f.nv):
        j = f.dof_parent[i]
        while j >= 0:
            if x[j] is not None:
                t = f.L[(i, j)] * x[j]
                x[i] = -t if x[i] is None else x[i] - t
            j = f.dof_parent[j]
    return x


# ---------------------------------------------------------------------------
# collision + contact (batch-last)
# ---------------------------------------------------------------------------

class ContactB(NamedTuple):
    pos: Arr      # [3, B]
    normal: Arr   # [3, B]
    depth: Arr    # [B]
    mu: float
    body_a: int
    body_b: int


def _geom_world(sys: System, kin: KinB, g: int):
    dtype = kin.xpos[1].dtype
    B = kin.xpos[1].shape[1:]
    b = sys.geom_bodyid[g]
    gp = np.asarray(sys.geom_pos)[g]
    gq = np.asarray(sys.geom_quat)[g]
    cp = lambda v: constv(v, B, dtype)  # noqa: E731
    if b == 0:
        return cp(gp), cp(gq)
    pos = kin.xpos[b] + qrot(kin.xquat[b], cp(gp))
    quat = qmul(kin.xquat[b], cp(gq))
    return pos, quat


def collide_b(sys: System, kin: KinB) -> List[ContactB]:
    out: List[ContactB] = []
    size = np.asarray(sys.geom_size)
    fric = np.asarray(sys.geom_friction)
    dtype = kin.xpos[1].dtype
    B = kin.xpos[1].shape[1:]

    def zhat(q):
        c0, c1, c2 = quat_to_cols(q)
        return c2

    for kind, ga, gb in sys.contact_pairs:
        mu = float(max(fric[ga, 0], fric[gb, 0]))
        ba, bb = sys.geom_bodyid[ga], sys.geom_bodyid[gb]
        pa, qa = _geom_world(sys, kin, ga)
        pb, qb = _geom_world(sys, kin, gb)
        if kind == PAIR_PLANE_SPHERE:
            n = zhat(qa)
            r = float(size[gb, 0])
            dist = dot3(n, pb - pa) - r
            pos = pb - n * (r + 0.5 * dist)
            out.append(ContactB(pos, n, -dist, mu, ba, bb))
        elif kind == PAIR_PLANE_CAPSULE:
            n = zhat(qa)
            axis = zhat(qb)
            r, hl = float(size[gb, 0]), float(size[gb, 1])
            for sgn in (1.0, -1.0):
                e = pb + axis * (hl * sgn)
                dist = dot3(n, e - pa) - r
                pos = e - n * (r + 0.5 * dist)
                out.append(ContactB(pos, n, -dist, mu, ba, bb))
        elif kind == PAIR_CAPSULE_CAPSULE:
            r1, hl1 = float(size[ga, 0]), float(size[ga, 1])
            r2, hl2 = float(size[gb, 0]), float(size[gb, 1])
            d1, d2 = zhat(qa), zhat(qb)
            rvec = pa - pb
            bq = dot3(d1, d2)
            c = dot3(d1, rvec)
            fq = dot3(d2, rvec)
            denom = 1.0 - bq * bq
            denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
            s = jnp.clip((bq * fq - c) / denom, -hl1, hl1)
            t = jnp.clip(bq * s + fq, -hl2, hl2)
            s = jnp.clip(bq * t - c, -hl1, hl1)
            c1p = pa + d1 * s
            c2p = pb + d2 * t
            delta = c2p - c1p
            dist = jnp.sqrt(dot3(delta, delta))
            n = delta / jnp.maximum(dist, 1e-9)
            depth = (r1 + r2) - dist
            pos = 0.5 * (c1p + n * r1 + c2p - n * r2)
            out.append(ContactB(pos, n, depth, mu, ba, bb))
        elif kind == PAIR_SPHERE_BOX:
            r = float(size[ga, 0])
            bs = size[gb]
            c0, c1, c2 = quat_to_cols(qb)
            d = pa - pb
            pl = jnp.stack([dot3(c0, d), dot3(c1, d), dot3(c2, d)])
            # full batch shape, not [3,1,..,1]: Mosaic can't broadcast along
            # sublanes and lanes at once inside the Pallas kernel (and a
            # jnp.full is free — it never leaves VMEM)
            bs_c = constv(bs, B, dtype)
            clamped = jnp.clip(pl, -bs_c, bs_c)
            delta = pl - clamped
            dist_out = jnp.sqrt(dot3(delta, delta))
            outside = dist_out > 1e-9
            n_out = -delta / jnp.maximum(dist_out, 1e-9)
            depth_out = r - dist_out
            face_dist = bs_c - jnp.abs(pl)
            kmin = jnp.argmin(face_dist, axis=0)
            # one-hot mask-sum instead of take_along_axis: the axis is only
            # 3 wide, and the batched gather take_along_axis lowers to is
            # both slower on the VPU and unsupported by Mosaic (>2-D gather)
            # inside the Pallas rollout kernel
            onehot = jnp.stack(
                [jnp.where(kmin == a, 1.0, 0.0) for a in range(3)])
            sign = jnp.sign((pl * onehot).sum(axis=0))
            n_in = -sign * onehot
            depth_in = r + (face_dist * onehot).sum(axis=0)
            n_local = jnp.where(outside, n_out, n_in)
            depth = jnp.where(outside, depth_out, depth_in)
            surf = jnp.where(outside, clamped, pl)
            # rotate local → world: n = R n_local
            rot = lambda v: c0 * v[0] + c1 * v[1] + c2 * v[2]
            out.append(ContactB(pb + rot(surf), rot(n_local), depth, mu,
                                ba, bb))
        else:
            raise NotImplementedError
    return out


def _precompute_rows_unrolled(sys: System, kin: KinB, v_b: List[Arr],
                              cons: List[ContactB], fac: LDL,
                              rhs: List[Arr], h: float, qd: Arr,
                              limits: List[Tuple[int, float, Arr]]):
    """Per-constraint sparse precompute — the "unrolled" variant form
    (docs/BENCH_LIVE_r04.json's kernel). One ldl_solve per constraint row,
    each touching only the dofs the constraint reaches (structural-zero
    rows stay None through the tree sweeps), then stacked to the same
    [C, nv, *B] / [C, *B] arrays the shared PGS sweep consumes. Fewer
    executed flops than the stacked ONE-solve form, C× more emitted HLO
    (hour-class humanoid compiles — see precompute_variant)."""
    from .contact import BAUMGARTE_BETA, V_PUSH_MAX

    tc = topo(sys)
    k = float(np.asarray(sys.contact_stiffness))
    bdamp = float(np.asarray(sys.contact_damping))
    eps = float(np.asarray(sys.friction_vel_tol))
    k_lim = float(np.asarray(sys.limit_stiffness))

    # per-contact static data (Jacobian rows, effective mass, caps) — the
    # ldl_solve per contact happens ONCE, outside the sweep loop
    pre = []
    for con in cons:
        dofs_b = tc.ancdof_body[con.body_b]
        dofs_a = tc.ancdof_body[con.body_a]
        sgn = {i: 1.0 for i in dofs_b}
        for i in dofs_a:
            sgn[i] = sgn.get(i, 0.0) - 1.0
        dofs = [i for i, s in sgn.items() if s != 0.0]

        p, n = con.pos, con.normal

        def pvel(b):
            vang, vlin = v_b[b][:3], v_b[b][3:]
            return vlin + cross(vang, p)

        v_rel = pvel(con.body_b) - pvel(con.body_a)
        vn = dot3(v_rel, n)
        vt = v_rel - vn * n

        # normal Jacobian row (sparse over dofs)
        pxn = cross(p, n)
        Jn = {}
        for i in dofs:
            S = kin.S[i]
            Jn[i] = sgn[i] * (S[0] * pxn[0] + S[1] * pxn[1] + S[2] * pxn[2]
                              + S[3] * n[0] + S[4] * n[1] + S[5] * n[2])
        jn_rows = [Jn.get(i) for i in range(sys.nv)]
        MinvJ = ldl_solve(fac, jn_rows)
        jmj = None
        for i in dofs:
            t = Jn[i] * MinvJ[i]
            jmj = t if jmj is None else jmj + t
        m_eff = 1.0 / (jmj + 1e-8)

        active = con.depth > 0.0
        a_ref = jnp.maximum(k * con.depth - bdamp * vn, 0.0)
        fn_max = m_eff * a_ref * active
        v_bias = jnp.minimum(
            BAUMGARTE_BETA * jnp.maximum(con.depth, 0.0) / h, V_PUSH_MAX)
        # spatial force row for unit normal force (friction tied in at μ,
        # direction fixed from the pre-contact tangent velocity)
        t_dir = vt / jnp.sqrt(dot3(vt, vt) + eps * eps)
        d = n - con.mu * t_dir
        pxd = cross(p, d)
        rows = {}
        for i in dofs:
            S = kin.S[i]
            rows[i] = sgn[i] * (S[0] * pxd[0] + S[1] * pxd[1]
                                + S[2] * pxd[2] + S[3] * d[0]
                                + S[4] * d[1] + S[5] * d[2])
        pre.append((dofs, MinvJ, m_eff, vn, v_bias, fn_max, rows))

    # joint limits as 1-dof unilateral constraints: Jacobian row s·e_d,
    # exact effective mass from the SAME implicit-damped factorization,
    # spring reference k_lim·violation, bounded Baumgarte pushout —
    # identical solver semantics to contacts
    minvE_cache: Dict[int, List] = {}
    for dadr, s, vio in limits:
        if dadr not in minvE_cache:
            e_rows: List = [None] * sys.nv
            e_rows[dadr] = jnp.ones_like(vio)
            minvE_cache[dadr] = ldl_solve(fac, e_rows)
        MinvE = minvE_cache[dadr]
        MinvJ = [None if x is None else s * x for x in MinvE]
        m_eff = 1.0 / (MinvE[dadr] + 1e-8)
        active = vio > 0.0
        vn = s * qd[dadr]
        v_bias = jnp.minimum(BAUMGARTE_BETA * vio / h, V_PUSH_MAX)
        fn_max = m_eff * k_lim * vio * active
        pre.append(([dadr], MinvJ, m_eff, vn, v_bias, fn_max, {dadr: s}))

    B = rhs[0].shape
    dtype = rhs[0].dtype
    zero = jnp.zeros(B, dtype)

    def stack_rows(getter):
        return jnp.stack([jnp.stack([getter(e, i) for i in range(sys.nv)])
                          for e in pre])                    # [C, nv, *B]

    MinvJ_st = stack_rows(
        lambda e, i: zero if e[1][i] is None else e[1][i] + zero)
    rows_st = stack_rows(lambda e, i: e[6].get(i, zero) + zero)
    m_eff_st = jnp.stack([e[2] + zero for e in pre])        # [C, *B]
    vn_st = jnp.stack([e[3] + zero for e in pre])
    vbias_st = jnp.stack([e[4] + zero for e in pre])
    fnmax_st = jnp.stack([e[5] + zero for e in pre])
    return MinvJ_st, rows_st, m_eff_st, vn_st, vbias_st, fnmax_st


def _precompute_rows_stacked(sys: System, kin: KinB, v_b: List[Arr],
                             cons: List[ContactB], fac: LDL,
                             rhs: List[Arr], h: float, qd: Arr,
                             limits: List[Tuple[int, float, Arr]]):
    """Constraint-stacked precompute — the default variant (see
    precompute_variant). The pre-compute (Jacobian rows, M⁻¹J, effective
    masses, caps) is homogeneous ACROSS constraint rows, so it is built
    stacked on a leading [C] axis and the C tree solves collapse into ONE
    ldl_solve over [C, *B] entries. The per-row "unrolled" variant calls
    ldl_solve C times with code-unrolled tree sweeps — for humanoid scenes
    (~40 contact points + 34 limit rows) that alone emitted tens of
    thousands of HLO ops and pushed fused-XLA compiles past 2 h and Mosaic
    kernel compiles past 1 h; the stacked form is the same math on the
    same factorization, C× fewer ops. All broadcasts below keep the
    trailing batch dims exact (leading-dim rank promotion only), which
    Mosaic lowers fine inside the Pallas rollout kernel.
    """
    from .contact import BAUMGARTE_BETA, V_PUSH_MAX

    tc = topo(sys)
    k = float(np.asarray(sys.contact_stiffness))
    bdamp = float(np.asarray(sys.contact_damping))
    eps = float(np.asarray(sys.friction_vel_tol))
    k_lim = float(np.asarray(sys.limit_stiffness))
    Cc, Cl = len(cons), len(limits)
    C = Cc + Cl
    B = rhs[0].shape
    dtype = rhs[0].dtype
    nv = sys.nv

    # static per-constraint dof signs (numpy): contacts ±1 over the
    # ancestor dofs of the two bodies, limits s·e_dadr
    sgn_np = np.zeros((C, nv))
    for ci, con in enumerate(cons):
        for i in tc.ancdof_body[con.body_b]:
            sgn_np[ci, i] += 1.0
        for i in tc.ancdof_body[con.body_a]:
            sgn_np[ci, i] -= 1.0
    for li, (dadr, s, _) in enumerate(limits):
        sgn_np[Cc + li, dadr] = s

    def sgn_stack(lo, hi):
        # [C', nv, *B] sign masks from python scalars (constv): Pallas
        # kernels cannot capture device constants, and the fulls are
        # {-1, 0, +1} broadcasts that never leave VMEM
        return jnp.stack([constv(sgn_np[c], B, dtype)
                          for c in range(lo, hi)])

    S_st = jnp.stack(kin.S)                                # [nv, 6, *B]

    def jrows(w_st, sgn_b):
        """Signed Jacobian row stack: sgn[c,i] · Σ_k S[i,k]·w[c,k],
        [C', nv, *B]. Accumulation order matches the old per-row form
        (k = 0..5, angular then linear)."""
        C_ = w_st.shape[0]
        acc = None
        for kk in range(6):
            Sk = jnp.broadcast_to(S_st[:, kk][None], (C_, nv) + B)
            wk = jnp.broadcast_to(w_st[:, kk][:, None], (C_, nv) + B)
            acc = Sk * wk if acc is None else acc + Sk * wk
        return sgn_b * acc

    J_parts, row_parts = [], []
    vn_parts, vbias_parts, cap_parts = [], [], []

    if Cc:
        pos_st = jnp.stack([c.pos for c in cons])          # [Cc, 3, *B]
        nrm_st = jnp.stack([c.normal for c in cons])
        dep_st = jnp.stack([c.depth for c in cons])        # [Cc, *B]
        mu_st = constv([c.mu for c in cons], B, dtype)
        vb_b = jnp.stack([v_b[c.body_b] for c in cons])    # [Cc, 6, *B]
        vb_a = jnp.stack([v_b[c.body_a] for c in cons])

        def pvel(vb):
            return vb[:, 3:] + cross_c(vb[:, :3], pos_st)

        v_rel = pvel(vb_b) - pvel(vb_a)
        vn_c = dot3_c(v_rel, nrm_st)
        vt = v_rel - vn_c[:, None] * nrm_st
        # spatial force row for unit normal force (friction tied in at μ,
        # direction fixed from the pre-contact tangent velocity)
        t_dir = vt / jnp.sqrt(dot3_c(vt, vt) + eps * eps)[:, None]
        d = nrm_st - mu_st[:, None] * t_dir
        sgn_c = sgn_stack(0, Cc)
        J_parts.append(jrows(
            jnp.concatenate([cross_c(pos_st, nrm_st), nrm_st], axis=1),
            sgn_c))
        row_parts.append(jrows(
            jnp.concatenate([cross_c(pos_st, d), d], axis=1), sgn_c))
        a_ref = jnp.maximum(k * dep_st - bdamp * vn_c, 0.0)
        vn_parts.append(vn_c)
        vbias_parts.append(jnp.minimum(
            BAUMGARTE_BETA * jnp.maximum(dep_st, 0.0) / h, V_PUSH_MAX))
        cap_parts.append(a_ref * (dep_st > 0.0))

    if Cl:
        # joint limits as 1-dof unilateral constraints: Jacobian row
        # s·e_d, exact effective mass from the SAME implicit-damped
        # factorization, spring reference k_lim·violation, bounded
        # Baumgarte pushout — identical solver semantics to contacts
        vio_st = jnp.stack([vio for (_, _, vio) in limits])  # [Cl, *B]
        sgn_l = sgn_stack(Cc, C)
        J_parts.append(sgn_l)
        row_parts.append(sgn_l)
        vn_parts.append(jnp.stack([s * qd[dadr]
                                   for (dadr, s, _) in limits]))
        vbias_parts.append(jnp.minimum(BAUMGARTE_BETA * vio_st / h,
                                       V_PUSH_MAX))
        cap_parts.append(k_lim * vio_st * (vio_st > 0.0))

    cat = (lambda p: p[0] if len(p) == 1 else jnp.concatenate(p))
    J_all = cat(J_parts)                                   # [C, nv, *B]
    rows_st = cat(row_parts)
    vn_st = cat(vn_parts)                                  # [C, *B]
    vbias_st = cat(vbias_parts)
    cap_st = cat(cap_parts)

    # ONE tree solve for every constraint row at once: fac entries are
    # [*B], rhs entries [C, *B] — rank-promoting broadcast on the leading
    # constraint axis only. Dofs no constraint touches stay structural
    # zeros (None) exactly as in the per-row solves.
    touched = sgn_np.any(axis=0)
    x = ldl_solve(fac, [J_all[:, i] if touched[i] else None
                        for i in range(nv)])
    zc = jnp.zeros((C,) + B, dtype)
    MinvJ_st = jnp.stack([zc if xi is None else xi for xi in x], axis=1)
    m_eff_st = 1.0 / ((J_all * MinvJ_st).sum(axis=1) + 1e-8)
    fnmax_st = m_eff_st * cap_st
    return MinvJ_st, rows_st, m_eff_st, vn_st, vbias_st, fnmax_st


def contact_qfrc_b(sys: System, kin: KinB, v_b: List[Arr],
                   cons: List[ContactB], fac: LDL,
                   rhs: List[Arr], h: float,
                   qd: Arr = None,
                   limits: List[Tuple[int, float, Arr]] = (),
                   static_rows: bool = False) -> List[Arr]:
    """Accumulate contact AND joint-limit forces into the net-force list
    ``rhs`` (= qfrc − bias − damping·qd, list of [B] per dof).
    ``limits`` entries are (dof, sign, violation[B]) unilateral 1-dof
    constraints (sign +1 = lower limit pushing q up); they join the same
    PGS sweep as contacts, ordered after them.

    Projected Gauss–Seidel over the contact set (constants + rationale:
    sim/contact.py, which runs the SAME sweeps in the same
    sys.contact_pairs order so the engines stay in parity): each
    contact's accumulated normal force moves toward the value that
    leaves its predicted normal velocity — under ALL forces accumulated
    into the running ``rhs`` so far — at the bounded Baumgarte pushout,
    projected to [0, m_eff·a_ref]. The earlier single-pass Jacobi cap
    (every contact against the same pre-contact snapshot) let N
    simultaneous contacts sharing the root each cancel the FULL approach
    velocity: the summed impulse acted as a trampoline (ant plans
    ballistic to 30 m, humanoid belly-flops rebounding at 0.8× impact
    speed; docs/ANT_PLAUSIBILITY.json pre-GS). Statics are unchanged: in
    stance the spring reference caps the force either way.
    """
    from .contact import N_GS_PASSES

    Cc, Cl = len(cons), len(limits)
    C = Cc + Cl
    if C == 0:
        return list(rhs)

    B = rhs[0].shape
    dtype = rhs[0].dtype
    zero = jnp.zeros(B, dtype)

    if PRECOMPUTE_VARIANT == "unrolled":
        (MinvJ_st, rows_st, m_eff_st, vn_st, vbias_st,
         fnmax_st) = _precompute_rows_unrolled(sys, kin, v_b, cons, fac,
                                               rhs, h, qd, limits)
    else:
        (MinvJ_st, rows_st, m_eff_st, vn_st, vbias_st,
         fnmax_st) = _precompute_rows_stacked(sys, kin, v_b, cons, fac,
                                              rhs, h, qd, limits)

    # Two row-sweep forms over the same stacked data, selected by
    # ``static_rows`` — identical math, row order, and projection, so the
    # trajectories are bit-identical:
    #
    # * static_rows=False (the XLA engines): fori_loop(passes) ·
    #   fori_loop(rows) with dynamic row indexing. One compiled row body
    #   regardless of constraint count — the per-row code-unrolled sweep
    #   stalled XLA compiles superlinearly (humanoidstandup, ~40 contacts
    #   + 34 limit rows, >1 h server-side; walker2d ~10 rows minutes).
    # * static_rows=True (the Pallas whole-rollout kernel): Mosaic cannot
    #   lower dynamic_slice at all (NotImplementedError, BENCH_r03), so
    #   the row loop is statically unrolled with static slices of the
    #   stacked arrays. Unlike the round-2 blowup, each unrolled body is
    #   ~8 homogeneous vector ops on [nv, *B]/[*B] tensors (the stacking
    #   does the compression), and Mosaic compiles program sizes like
    #   this fine.
    init = (jnp.stack([r + zero for r in rhs]), jnp.zeros((C,) + B, dtype))

    if static_rows:
        def sweep(_, carry):
            rhs_a, fns = carry
            fns_l = [fns[c] for c in range(C)]
            for c in range(C):
                jacc = (MinvJ_st[c] * rhs_a).sum(axis=0)
                vn_pred = vn_st[c] + h * jacc
                fn_new = jnp.clip(
                    fns_l[c] + m_eff_st[c] * (vbias_st[c] - vn_pred) / h,
                    0.0, fnmax_st[c])
                rhs_a = rhs_a + rows_st[c] * (fn_new - fns_l[c])
                fns_l[c] = fn_new
            return rhs_a, jnp.stack(fns_l)

        rhs_a, _ = jax.lax.fori_loop(0, N_GS_PASSES, sweep, init)
        return [rhs_a[i] for i in range(sys.nv)]

    idx = functools.partial(jax.lax.dynamic_index_in_dim, axis=0,
                            keepdims=False)

    def row_body(c, carry):
        # rhs_a [nv, *B]; fns [C, *B] = this sweep's accumulated forces
        rhs_a, fns = carry
        fn_c = idx(fns, c)
        jacc = (idx(MinvJ_st, c) * rhs_a).sum(axis=0)
        vn_pred = idx(vn_st, c) + h * jacc
        fn_new = jnp.clip(
            fn_c + idx(m_eff_st, c) * (idx(vbias_st, c) - vn_pred) / h,
            0.0, idx(fnmax_st, c))
        rhs_a = rhs_a + idx(rows_st, c) * (fn_new - fn_c)
        fns = jax.lax.dynamic_update_index_in_dim(fns, fn_new, c, 0)
        return rhs_a, fns

    rhs_a, _ = jax.lax.fori_loop(
        0, N_GS_PASSES,
        lambda _, carry: jax.lax.fori_loop(0, C, row_body, carry), init)
    return [rhs_a[i] for i in range(sys.nv)]


# ---------------------------------------------------------------------------
# full substep + rollout (batch-last)
# ---------------------------------------------------------------------------

def substep_b(sys: System, q: Arr, qd: Arr, ctrl: Arr,
              static_rows: bool = False):
    """One physics substep. q [nq, B], qd [nv, B], ctrl [nu, B].
    ``static_rows`` selects the Mosaic-compatible PGS sweep form
    (see contact_qfrc_b) — values are bit-identical either way."""
    tc = topo(sys)
    dtype = q.dtype
    B = q.shape[1:]
    h = float(np.asarray(sys.dt))
    damping = np.asarray(sys.dof_damping)

    kin = fk_b(sys, q)
    M_low, bias, v_b = smooth_b(sys, kin, qd)

    # joint-limit damping enters IMPLICITLY (via the integrator matrix):
    # explicit limit damping with an approximate effective mass violates
    # h·b_eff < 2 and blows up; implicit damping is unconditionally stable.
    stiff = np.asarray(sys.jnt_stiffness)
    jrange = np.asarray(sys.jnt_range)
    meff_rest = np.asarray(sys.dof_limit_meff)
    k_lim = float(np.asarray(sys.limit_stiffness))
    b_lim = float(np.asarray(sys.limit_damping))
    lim_below: Dict[int, Arr] = {}
    lim_above: Dict[int, Arr] = {}
    extra_diag: List = [None] * sys.nv
    for i in range(sys.nv):
        if damping[i] != 0.0:
            extra_diag[i] = jnp.full(B, h * float(damping[i]), dtype)
    for j in range(sys.njnt):
        if sys.jnt_type[j] not in (SLIDE, HINGE) or not sys.jnt_limited[j]:
            continue
        qadr, dadr = sys.jnt_qposadr[j], sys.jnt_dofadr[j]
        lo, hi = float(jrange[j, 0]), float(jrange[j, 1])
        below = jnp.maximum(lo - q[qadr], 0.0)
        above = jnp.maximum(q[qadr] - hi, 0.0)
        lim_below[dadr], lim_above[dadr] = below, above
        active = ((below > 0) | (above > 0)).astype(dtype)
        d_lim = h * b_lim * float(meff_rest[dadr]) * active
        extra_diag[dadr] = d_lim if extra_diag[dadr] is None \
            else extra_diag[dadr] + d_lim

    fac = ldl_factor(M_low, sys, extra_diag=extra_diag)

    # actuators: gear · clip(u)
    qfrc: List[Arr] = [jnp.zeros(B, dtype) for _ in range(sys.nv)]
    gear = np.asarray(sys.actuator_gear)
    crange = np.asarray(sys.actuator_ctrlrange)
    for a in range(sys.nu):
        dadr = sys.jnt_dofadr[sys.actuator_jntid[a]]
        u = jnp.clip(ctrl[a], float(crange[a, 0]), float(crange[a, 1]))
        qfrc[dadr] = qfrc[dadr] + float(gear[a]) * u

    # joint springs. Joint LIMITS are unilateral constraints, solved in
    # the same projected-Gauss–Seidel sweep as contacts (see
    # contact_qfrc_b) — the earlier explicit limit spring with a per-dof
    # rest-pose effective mass and a per-dof velocity-cancelling cap
    # ignored coupling through M⁻¹: a crumpling humanoid with many joints
    # slamming their limits at once rebounded at 0.8× its impact speed
    # (each limit cancelled its own violating velocity, the sum catapulted
    # the root). Limit DAMPING stays implicit via extra_diag (above).
    qspring = np.asarray(sys.qpos_spring)
    limits = []
    for j in range(sys.njnt):
        if sys.jnt_type[j] not in (SLIDE, HINGE):
            continue
        qadr, dadr = sys.jnt_qposadr[j], sys.jnt_dofadr[j]
        if stiff[j] != 0.0:
            qfrc[dadr] = qfrc[dadr] - float(stiff[j]) * (
                q[qadr] - float(qspring[qadr]))
        if sys.jnt_limited[j]:
            limits.append((dadr, 1.0, lim_below[dadr]))
            limits.append((dadr, -1.0, lim_above[dadr]))

    rhs = [qfrc[i] - bias[i] - float(damping[i]) * qd[i]
           for i in range(sys.nv)]
    cons = collide_b(sys, kin) if sys.contact_pairs else []
    if cons or limits:
        rhs = contact_qfrc_b(sys, kin, v_b, cons, fac, rhs, h,
                             qd=qd, limits=limits,
                             static_rows=static_rows)
    qacc = ldl_solve(fac, rhs)

    qd_new = jnp.stack([qd[i] + h * qacc[i] for i in range(sys.nv)])
    q_new = integrate_pos_b(sys, q, qd_new, h)
    return q_new, qd_new


def integrate_pos_b(sys: System, q: Arr, qd: Arr, h: float) -> Arr:
    rows = [None] * sys.nq
    for j in range(sys.njnt):
        jt = sys.jnt_type[j]
        qadr, dadr = sys.jnt_qposadr[j], sys.jnt_dofadr[j]
        if jt == FREE:
            for k in range(3):
                rows[qadr + k] = q[qadr + k] + h * qd[dadr + k]
            quat = q[qadr + 3:qadr + 7]
            w = qd[dadr + 3:dadr + 6]
            wn = jnp.sqrt(dot3(w, w))
            angle = wn * h
            half = 0.5 * angle
            sinc = jnp.where(wn < 1e-12, 0.5 * h,
                             jnp.sin(half) / jnp.maximum(wn, 1e-12))
            dq = jnp.concatenate([jnp.cos(half)[None], w * sinc])
            qn = qmul(quat, dq)
            qn = qn / jnp.sqrt((qn * qn).sum(0))
            for k in range(4):
                rows[qadr + 3 + k] = qn[k]
        else:
            rows[qadr] = q[qadr] + h * qd[dadr]
    return jnp.stack(rows)


# Physical sanity threshold: valid rollouts in the suite stay under
# ~50 rad/s (MuJoCo under adversarial torques stays ≤ ~30); beyond this the
# sample is flagged diverged — the planner demotes it BEFORE it can report
# a spuriously high progress reward — and qd is clamped so f32 never
# overflows into inf/nan. 100 = 2× margin over the stated valid envelope
# (was 200 in round 2 — loose enough that a 181 m/s torso slipped through,
# VERDICT r2 weak #2).
QD_DIVERGED = 100.0

# Penetration flag: a root body sinking below the floor plane by more than
# this is a contact-solver exploit, not physics (legit contact penetration
# with the penalty solver is centimeters; the r2 humanoidrun failure mode
# was a torso 5.7 m BELOW the floor reporting a huge progress reward).
ROOT_SINK_TOL = 0.2


def _height_sensors(sys: System):
    """Static (qadr, offset) pairs such that ``q[qadr] + offset`` is the
    world z of a root body origin, plus the floor plane height — or None
    when the model has no floor plane / no usable root-height coordinate.

    FREE joints expose the body z directly at qadr+2. A SLIDE joint
    measures z when its axis is world-z and nothing above it in the
    kinematic chain can rotate (every earlier joint in the chain is SLIDE
    and every chain body frame is axis-aligned) — true for the planar
    envs' rootz (hopper/walker2d/halfcheetah). All host-side numpy on
    static model data; free at runtime.
    """
    geom_types = list(sys.geom_type)
    if PLANE not in geom_types:
        return None
    gpos = np.asarray(jax.device_get(sys.geom_pos))
    floor_z = max(float(gpos[g, 2]) for g in range(sys.ngeom)
                  if geom_types[g] == PLANE and sys.geom_bodyid[g] == 0)

    body_pos = np.asarray(jax.device_get(sys.body_pos))
    body_quat = np.asarray(jax.device_get(sys.body_quat))
    jnt_axis = np.asarray(jax.device_get(sys.jnt_axis))
    init_q = np.asarray(jax.device_get(sys.init_q))

    def chain(b):
        out = []
        while b != 0:
            out.append(b)
            b = sys.body_parentid[b]
        return out

    sensors = []
    for j in range(sys.njnt):
        qadr = sys.jnt_qposadr[j]
        if sys.jnt_type[j] == FREE:
            sensors.append((qadr + 2, 0.0))
            continue
        if sys.jnt_type[j] != SLIDE:
            continue
        if abs(jnt_axis[j, 0]) > 1e-9 or abs(jnt_axis[j, 1]) > 1e-9 \
                or jnt_axis[j, 2] <= 0.0:
            continue
        bodies = chain(sys.jnt_bodyid[j])
        if any(abs(body_quat[b, 0] - 1.0) > 1e-9
               or np.abs(body_quat[b, 1:]).max() > 1e-9 for b in bodies):
            continue
        earlier = [jj for jj in range(sys.njnt) if jj != j and (
            (sys.jnt_bodyid[jj] in bodies[1:]) or
            (sys.jnt_bodyid[jj] == bodies[0] and jj < j))]
        if any(sys.jnt_type[jj] != SLIDE for jj in earlier):
            continue
        off = float(sum(body_pos[b, 2] for b in bodies)) \
            - float(init_q[qadr])
        # earlier z-slides on the chain also displace this body; only the
        # single-z-slide case is handled (true for the suite's planar roots)
        if any(abs(jnt_axis[jj, 2]) > 1e-9 for jj in earlier):
            continue
        sensors.append((qadr, off))
    if not sensors:
        return None
    return sensors, floor_z


def env_step_b(sys: System, q: Arr, qd: Arr, ctrl: Arr, n_frames: int,
               static_rows: bool = False):
    """n_frames substeps (fori_loop — body traced once)."""
    def body(_, carry):
        q, qd = carry
        return substep_b(sys, q, qd, ctrl, static_rows=static_rows)

    return jax.lax.fori_loop(0, n_frames, body, (q, qd))


def env_step_checked_b(sys: System, q: Arr, qd: Arr, ctrl: Arr,
                       n_frames: int, bad: Arr,
                       static_rows: bool = False):
    """env_step_b + divergence tracking: returns (q, qd, bad') where bad'
    accumulates [B] flags for samples that left the physical validity
    envelope — joint speeds beyond QD_DIVERGED, or a root body sunk more
    than ROOT_SINK_TOL below the floor plane. Flagged samples are clamped
    per substep (not NaN'd) so the rest of the batch keeps computing and
    f32 never overflows."""
    hs = _height_sensors(sys)

    def body(_, carry):
        q, qd, bad = carry
        q, qd = substep_b(sys, q, qd, ctrl, static_rows=static_rows)
        speed = jnp.max(jnp.abs(qd), axis=0)
        bad = jnp.maximum(bad, (speed > QD_DIVERGED).astype(q.dtype))
        if hs is not None:
            sensors, floor_z = hs
            zmin = floor_z - ROOT_SINK_TOL
            for qadr, off in sensors:
                bad = jnp.maximum(bad, (q[qadr] + off < zmin).astype(q.dtype))
        qd = jnp.clip(qd, -QD_DIVERGED, QD_DIVERGED)
        return q, qd, bad

    return jax.lax.fori_loop(0, n_frames, body, (q, qd, bad))


class LinkOutB(NamedTuple):
    """Batch-last link quantities consumed by env reward functions."""
    xpos: List[Arr]    # nbody × [3, B] (world body-frame origins, incl world)
    xquat: List[Arr]
    vel: List[Arr]     # nbody × [3, B] velocity of body origin
    ang: List[Arr]


def link_out_b(sys: System, q: Arr, qd: Arr) -> LinkOutB:
    tc = topo(sys)
    kin = fk_b(sys, q)
    W = [kin.S[i] * qd[i] for i in range(sys.nv)]
    vel, ang = [kin.xpos[0] * 0.0], [kin.xpos[0] * 0.0]
    for b in range(1, sys.nbody):
        v = jnp.zeros_like(W[0]) if sys.nv else None
        v = None
        for i in tc.ancdof_body[b]:
            v = W[i] if v is None else v + W[i]
        if v is None:
            v = jnp.zeros((6,) + q.shape[1:], q.dtype)
        a = v[:3]
        vel.append(v[3:] + cross(a, kin.xpos[b]))
        ang.append(a)
    return LinkOutB(kin.xpos, kin.xquat, vel, ang)
