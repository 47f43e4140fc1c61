"""Contact solver: effective-mass-scaled spring-damper (MuJoCo-solref style)
normal force + regularized Coulomb friction, projected to joint space.

Replacement for brax's positional (PBD) constraint projection and the
generalized pipeline's friction-cone QP (reference backends, SURVEY §2.B).

Raw positional penalties (f = k·depth) are unstable across morphologies —
the stable stiffness depends on the effective mass at the contact. Instead
we impose a reference *acceleration* a* = k·φ − b·vn (k in 1/s², b in 1/s,
the solref (timeconst, dampratio) parameterization) and convert it to force
with the effective mass m_eff = 1/(Jₙ M⁻¹ Jₙᵀ). This keeps the step
fixed-shape batched dense algebra (no iterative solver) and is stable for
any body mass at any of our timesteps.
"""

from __future__ import annotations

import jax.numpy as jnp

from .collision import Contacts
from .kinematics import Kin
from .system import System

# Impulse-cap constants (shared by sim/batched.py so all engines agree).
# The cap bounds the post-substep OUTGOING normal velocity of the contact
# point: the impulse may cancel the predicted approach velocity (vn_pred,
# which includes this substep's gravity/actuation/bias work) plus at most a
# small Baumgarte depenetration bias v_bias = min(β·φ/h, V_PUSH_MAX).
# Without the bound, the k·φ spring pushout under explicit Euler acts as a
# trampoline: on a cyclic gait it returns more energy than was stored, and
# the planner finds it (a humanoidrun plan reached 27 m/s mean torso speed
# with 6 m ballistic arcs — docs/HUMANOIDRUN_PLAUSIBILITY.json, pre-fix).
# Statics are untouched: a resting foot has vn_pred = -g-scale·h, so the cap
# allows exactly the support force an LCP would give, and the spring
# reference a_ref still sets the resting penetration depth.
BAUMGARTE_BETA = 0.2
V_PUSH_MAX = 0.2     # m/s — max depenetration velocity a contact may add
# Projected Gauss–Seidel sweeps over the contact set per substep. One
# capped pass is exact for a single contact but over-applies when several
# simultaneous contacts share a body (each early contact is computed
# before the later ones add their force): a humanoid belly-flop rebounded
# at 0.8× the impact speed off a single pass. PGS accumulates per-contact
# normal forces with the increment capped so the contact's post-force
# normal velocity targets the bounded pushout; later sweeps see the full
# accumulated force field and bleed off any overshoot (dfn may be
# negative, floored at fn=0). 4 sweeps brings the humanoid drop
# restitution under 0.15. Single-contact scenes converge after sweep 1 —
# later sweeps are exact no-ops, preserving the old behavior bit-for-bit.
N_GS_PASSES = 4


def contact_force(sys: System, kin: Kin, v_b: jnp.ndarray, con: Contacts,
                  Minv: jnp.ndarray, rhs_pre: jnp.ndarray,
                  qd: jnp.ndarray = None, limits=None) -> jnp.ndarray:
    """(nv,) generalized contact + joint-limit constraint force.

    For each contact (point p, normal n A→B, depth φ):
      Jₙ    = (S [p×n̂, n̂]) · (anc(B) − anc(A))   — normal-velocity Jacobian
      m_eff = 1/(Jₙ M⁻¹ Jₙᵀ)
      fn    ∈ [0, m_eff · max(0, k·φ − b·vn) · [φ > 0]]
      ft    = −μ·fn · v_t/√(‖v_t‖² + ε²)          (regularized Coulomb)
    and qfrc += Jₙᵀ fn + J_tᵀ ft (dense masked projection). ``limits``
    (from dynamics.limit_constraints) are 1-dof unilateral constraints
    with Jacobian row sign·e_dof, solved in the same sweep after the
    contacts.
    """
    ncon = len(con.body_a) if con is not None else 0
    nlim = len(limits[0]) if limits is not None else 0
    if ncon == 0 and nlim == 0:
        return jnp.zeros(sys.nv, kin.S.dtype)

    h = sys.dt
    qacc = Minv @ rhs_pre                                   # (nv,) running
    qfrc = jnp.zeros(sys.nv, kin.S.dtype)

    if ncon:
        k = sys.contact_stiffness
        b = sys.contact_damping
        eps = sys.friction_vel_tol

        import numpy as np
        ba = np.asarray(con.body_a)
        bb = np.asarray(con.body_b)
        mask = sys.mask_ancdof_body[bb] - sys.mask_ancdof_body[ba]

        p, n, phi, mu = con.pos, con.normal, con.depth, con.friction

        def point_vels(bids):
            vang, vlin = v_b[bids, :3], v_b[bids, 3:]
            return vlin + jnp.cross(vang, p)

        v_rel = point_vels(bb) - point_vels(ba)             # (ncon, 3)
        vn = jnp.einsum("cx,cx->c", v_rel, n)
        vt = v_rel - vn[:, None] * n

        n_sp = jnp.concatenate([jnp.cross(p, n), n], axis=-1)
        Jn = jnp.einsum("ix,cx->ci", kin.S, n_sp) * mask    # (ncon, nv)
        m_eff = 1.0 / (jnp.einsum("ci,ij,cj->c", Jn, Minv, Jn) + 1e-8)

        active = phi > 0.0
        a_ref = jnp.maximum(k * phi - b * vn, 0.0)
        fn_max = m_eff * a_ref * active
        v_bias = jnp.minimum(BAUMGARTE_BETA * jnp.maximum(phi, 0.0) / h,
                             V_PUSH_MAX)
        t_dir = vt / jnp.sqrt(
            jnp.sum(vt * vt, axis=-1, keepdims=True) + eps * eps)
        # spatial force row per contact for unit normal force (friction
        # tied in at μ, direction fixed from pre-contact tangent velocity)
        d = n - mu[:, None] * t_dir                         # (ncon, 3)
        d_sp = jnp.concatenate([jnp.cross(p, d), d], axis=-1)
        Jd = jnp.einsum("ix,cx->ci", kin.S, d_sp) * mask    # (ncon, nv)

    if nlim:
        l_dadr, l_sign, l_vio = limits
        m_eff_l = 1.0 / (Minv[l_dadr, l_dadr] + 1e-8)
        vn_l = jnp.asarray(l_sign, kin.S.dtype) * qd[l_dadr]
        vb_l = jnp.minimum(BAUMGARTE_BETA * l_vio / h, V_PUSH_MAX)
        fmax_l = m_eff_l * sys.limit_stiffness * l_vio * (l_vio > 0.0)

    # Projected Gauss–Seidel (see constants note above; sim/batched.py
    # runs the same sweeps in the same constraint order — engine parity).
    # Per sweep, per constraint: the predicted normal velocity vn_pred
    # folds in the work ALL forces accumulated so far (this substep's
    # gravity/actuation/bias AND every constraint's current force) would
    # do; the accumulated normal force moves toward the value that
    # leaves vn_pred at the bounded Baumgarte pushout, projected to
    # [0, m_eff·a_ref] (non-adhesive; the spring reference still sets
    # the resting penetration / limit-violation depth). Stance support
    # passes through, bounce energy is clipped.
    # homogeneous sweeps under fori_loop: the one-sweep body compiles
    # once, not N_GS_PASSES times (matches sim/batched.py)
    def sweep(_, carry):
        qacc, qfrc, fn, fl = carry
        for c in range(ncon):
            vn_pred = vn[c] + h * (Jn[c] @ qacc)
            fn_new = jnp.clip(fn[c] + m_eff[c] * (v_bias[c] - vn_pred) / h,
                              0.0, fn_max[c])
            dfn = fn_new - fn[c]
            fn = fn.at[c].set(fn_new)
            qfrc_c = Jd[c] * dfn
            qfrc = qfrc + qfrc_c
            qacc = qacc + Minv @ qfrc_c
        for c in range(nlim):
            dof = int(l_dadr[c])
            s = float(l_sign[c])
            vn_pred = vn_l[c] + s * h * qacc[dof]
            fn_new = jnp.clip(
                fl[c] + m_eff_l[c] * (vb_l[c] - vn_pred) / h,
                0.0, fmax_l[c])
            dfn = fn_new - fl[c]
            fl = fl.at[c].set(fn_new)
            qfrc = qfrc.at[dof].add(s * dfn)
            qacc = qacc + Minv[:, dof] * (s * dfn)
        return qacc, qfrc, fn, fl

    import jax
    fn = jnp.zeros(ncon, kin.S.dtype)
    fl = jnp.zeros(nlim, kin.S.dtype)
    _, qfrc, _, _ = jax.lax.fori_loop(0, N_GS_PASSES, sweep,
                                      (qacc, qfrc, fn, fl))
    return qfrc
