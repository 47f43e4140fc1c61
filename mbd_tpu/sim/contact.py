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


def contact_force(sys: System, kin: Kin, v_b: jnp.ndarray, con: Contacts,
                  Minv: jnp.ndarray, rhs_pre: jnp.ndarray) -> jnp.ndarray:
    """(nv,) generalized contact force.

    For each contact (point p, normal n A→B, depth φ):
      Jₙ    = (S [p×n̂, n̂]) · (anc(B) − anc(A))   — normal-velocity Jacobian
      m_eff = 1/(Jₙ M⁻¹ Jₙᵀ)
      fn    = m_eff · max(0, k·φ − b·vn) · [φ > 0]
      ft    = −μ·fn · v_t/√(‖v_t‖² + ε²)          (regularized Coulomb)
    and qfrc += Jₙᵀ fn + J_tᵀ ft (dense masked projection).
    """
    ncon = len(con.body_a)
    if ncon == 0:
        return jnp.zeros(sys.nv, kin.S.dtype)

    k = sys.contact_stiffness
    b = sys.contact_damping
    eps = sys.friction_vel_tol

    import numpy as np
    ba = np.asarray(con.body_a)
    bb = np.asarray(con.body_b)
    mask = sys.mask_ancdof_body[bb] - sys.mask_ancdof_body[ba]  # (ncon, nv)

    p, n, phi, mu = con.pos, con.normal, con.depth, con.friction

    def point_vels(bids):
        vang, vlin = v_b[bids, :3], v_b[bids, 3:]
        return vlin + jnp.cross(vang, p)

    v_rel = point_vels(bb) - point_vels(ba)                 # (ncon, 3)
    vn = jnp.einsum("cx,cx->c", v_rel, n)
    vt = v_rel - vn[:, None] * n

    n_sp = jnp.concatenate([jnp.cross(p, n), n], axis=-1)   # (ncon, 6)
    Jn = jnp.einsum("ix,cx->ci", kin.S, n_sp) * mask        # (ncon, nv)
    m_eff = 1.0 / (jnp.einsum("ci,ij,cj->c", Jn, Minv, Jn) + 1e-8)

    active = phi > 0.0
    # impulse cap against the PREDICTED normal velocity (see constants note
    # above): vn_pred folds in the work this substep's non-contact forces do,
    # so stance support passes through while bounce energy is clipped
    h = sys.dt
    a_ref = jnp.maximum(k * phi - b * vn, 0.0)
    qacc_pre = Minv @ rhs_pre                               # (nv,)
    vn_pred = vn + h * (Jn @ qacc_pre)                      # (ncon,)
    v_bias = jnp.minimum(BAUMGARTE_BETA * jnp.maximum(phi, 0.0) / h,
                         V_PUSH_MAX)
    a_cap = jnp.maximum(v_bias - vn_pred, 0.0) / h
    fn = m_eff * jnp.minimum(a_ref, a_cap) * active

    t_dir = vt / jnp.sqrt(
        jnp.sum(vt * vt, axis=-1, keepdims=True) + eps * eps)
    F = fn[:, None] * n - mu[:, None] * fn[:, None] * t_dir  # (ncon, 3)
    F_spatial = jnp.concatenate([jnp.cross(p, F), F], axis=-1)
    return jnp.einsum("ix,cx,ci->i", kin.S, F_spatial, mask)
