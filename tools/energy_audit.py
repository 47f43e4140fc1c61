"""Mechanical-energy audit of a rollout: find where the engine injects energy.

For a control sequence u(t), roll substep-by-substep and track

    defect(t) = [KE(t) + PE(t)] − [KE(0) + PE(0)] − W_act(t) + W_damp(t)

where W_act = Σ τᵀ qd · h is actuator work and W_damp = Σ qdᵀ D qd · h the
joint-damping dissipation. For a physically sound engine, defect ≤ small
integrator error: contacts/limits/springs may only store or dissipate.
A growing positive defect pinpoints an energy-injecting term; per-substep
reporting shows when (and contact depth/limit state shows what).

  python tools/energy_audit.py --env humanoidrun --plan results/humanoidrun/plan_seed0.npy
  python tools/energy_audit.py --env hopper --ctrl bangbang   # synthetic probe
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="humanoidrun")
    p.add_argument("--plan", default=None, help=".npy [H, nu] control plan")
    p.add_argument("--ctrl", default="zero",
                   choices=["zero", "random", "bangbang"],
                   help="synthetic control when no --plan")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps", type=int, default=0, help="0 = plan length/50")
    p.add_argument("--out", default="")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.sim import dynamics, kinematics
    from mbd_tpu.sim import pipeline as P

    env = envs_mod.get_env(args.env)
    sys_ = env.sys
    H = args.steps or 50

    if args.plan:
        us = np.load(args.plan)
        H = us.shape[0]
    else:
        rng = np.random.default_rng(args.seed)
        if args.ctrl == "zero":
            us = np.zeros((H, env.action_size))
        elif args.ctrl == "random":
            us = rng.uniform(-1, 1, (H, env.action_size))
        else:  # bangbang: full-torque square wave, the power-injection probe
            us = np.sign(np.sin(
                np.arange(H)[:, None] * 0.7
                + np.arange(env.action_size)[None] * 1.3))

    rng = jax.random.PRNGKey(args.seed)
    _, rng_reset = jax.random.split(rng)
    st = env.reset(rng_reset)
    q = jnp.asarray(st.pipeline_state.q)
    qd = jnp.asarray(st.pipeline_state.qd)

    g = 9.81
    damping = np.asarray(sys_.dof_damping)

    def energies(q, qd):
        kin = kinematics.fk(sys_, q)
        M, _, _, _ = dynamics.smooth_terms(sys_, kin, qd)
        ke = 0.5 * qd @ (M @ qd)
        # PE from body origins (xpos ≈ COM for these models' purposes —
        # constant offset errors cancel in the defect differences)
        pe = (sys_.body_mass[1:] * g * kin.xpos[1:, 2]).sum()
        return float(ke), float(pe)

    substep = jax.jit(lambda q, qd, u: P._substep(sys_, q, qd, u))
    act = jax.jit(lambda u: dynamics.actuator_force(sys_, u))

    ke0, pe0 = energies(q, qd)
    W = 0.0
    Wd = 0.0
    h = float(np.asarray(sys_.dt))
    rows = []
    for t in range(H):
        u = jnp.asarray(us[t], jnp.float32)
        tau = act(u)
        for k in range(env.n_frames):
            qd_prev = qd
            q, qd = substep(q, qd, u)
            # trapezoid work estimates over the substep
            qd_mid = 0.5 * (qd_prev + qd)
            W += float(tau @ qd_mid) * h
            Wd += float((damping * np.asarray(qd_mid) ** 2).sum()) * h
        ke, pe = energies(q, qd)
        defect = (ke + pe) - (ke0 + pe0) - W + Wd
        rows.append(dict(step=t, ke=round(ke, 2), pe=round(pe, 2),
                         W_act=round(W, 2), W_damp=round(Wd, 2),
                         defect=round(defect, 2),
                         qd_max=round(float(jnp.abs(qd).max()), 2)))
    for r in rows[:: max(1, H // 25)]:
        print(json.dumps(r), flush=True)
    print(json.dumps(rows[-1]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
