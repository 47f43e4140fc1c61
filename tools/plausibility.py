"""Physical-plausibility audit of recorded planner results (any env).

Generalizes the round-2 humanoidrun inspection (VERDICT r2 items 2+8): for
every seed plan saved by tools/run_results.py (results/<env>/seed_harness.npz)
this rolls the plan through the SAME checked batch engine that produced the
published reward and reports the kinematics and energetics that decide
whether the number is earned behavior or an engine exploit:

  * engine divergence flag (qd envelope + root-penetration sensors,
    sim/batched.py — the flag the planner publishes as final_diverged)
  * torso x/z trajectory, mean + peak forward speed, min root height
  * deepest body-origin z (meters below the floor = solver exploit;
    centimeters = honest penalty-contact penetration)
  * peak joint speed vs the QD_DIVERGED envelope
  * substep-level mechanical-energy defect of the worst seed
    (KE+PE−W_act+W_damp must not grow — tools/energy_audit.py criteria,
    run through the per-sample pipeline engine)

  python tools/plausibility.py --env humanoidrun --out docs/HUMANOIDRUN_PLAUSIBILITY.json
  python tools/plausibility.py --env ant --out docs/ANT_PLAUSIBILITY.json

NOTE: run where the batch engine compiles fast (TPU). The energy audit part
is backend-agnostic.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def energy_audit_batched(env, plans, states_init):
    """Per-seed max mechanical-energy defect along the CHECKED batch-engine
    trajectory — the exact engine, clamps included, that produced the
    published rewards (auditing a *different* engine's trajectory, as the
    pipeline-based tools/energy_audit.py does, is meaningless once the two
    engines' chaotic rollouts separate).

    defect(t) = [KE+PE](t) − [KE+PE](0) − W_act(t) + W_damp(t), trapezoid
    work integrals per substep; the qd clamp at QD_DIVERGED only removes
    energy. plans [S, H, nu] → (max_defect [S], final_defect [S])."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mbd_tpu.sim import batched as BT

    sys_ = env.sys
    S, H, nu = plans.shape
    tc_pairs = BT.topo(sys_).dof_pairs
    h = float(np.asarray(jax.device_get(sys_.dt)))
    damping = np.asarray(jax.device_get(sys_.dof_damping))
    gear = np.asarray(jax.device_get(sys_.actuator_gear))
    crange = np.asarray(jax.device_get(sys_.actuator_ctrlrange))
    masses = np.asarray(jax.device_get(sys_.body_mass))
    ipos = np.asarray(jax.device_get(sys_.body_ipos))
    g = -float(np.asarray(jax.device_get(sys_.gravity))[2])

    def energy(q, qd):
        kin = BT.fk_b(sys_, q)
        M_low, _, _ = BT.smooth_b(sys_, kin, qd)
        ke = 0.0
        for (i, j) in tc_pairs:
            w = 1.0 if i == j else 2.0
            ke = ke + 0.5 * w * M_low[(i, j)] * qd[i] * qd[j]
        pe = 0.0
        for b in range(1, sys_.nbody):
            com_z = (kin.xpos[b] + BT.qrot(
                kin.xquat[b], BT.constv(ipos[b], q.shape[1:], q.dtype)))[2]
            pe = pe + float(masses[b]) * g * com_z
        return ke + pe

    def tau_rows(u):
        tau = [0.0] * sys_.nv
        for a in range(sys_.nu):
            dadr = sys_.jnt_dofadr[sys_.actuator_jntid[a]]
            tau[dadr] = tau[dadr] + float(gear[a]) * jnp.clip(
                u[a], float(crange[a, 0]), float(crange[a, 1]))
        return tau

    def step(carry, u):
        q, qd, W, Wd = carry
        tau = tau_rows(u)

        def sub(c, _):
            q, qd, W, Wd = c
            qn, qdn = BT.substep_b(sys_, q, qd, u)
            qdn = jnp.clip(qdn, -BT.QD_DIVERGED, BT.QD_DIVERGED)
            qd_mid = 0.5 * (qd + qdn)
            dW = sum(t * qd_mid[i] for i, t in enumerate(tau)
                     if not isinstance(t, float))
            dWd = sum(float(damping[i]) * qd_mid[i] ** 2
                      for i in range(sys_.nv))
            return (qn, qdn, W + h * dW, Wd + h * dWd), None

        (q, qd, W, Wd), _ = jax.lax.scan(
            sub, (q, qd, W, Wd), None, length=env.n_frames)
        return (q, qd, W, Wd), energy(q, qd) - W + Wd

    @jax.jit
    def audit(q0, qd0, U):
        e0 = energy(q0, qd0)
        zero = jnp.zeros(q0.shape[1:], q0.dtype)
        _, series = jax.lax.scan(step, (q0, qd0, zero, zero), U)
        return series - e0                                  # [H, S]

    U = jnp.transpose(jnp.asarray(plans, jnp.float32), (1, 2, 0))
    series = np.asarray(audit(states_init.pipeline_state.q.T,
                              states_init.pipeline_state.qd.T, U))
    return series.max(axis=0), series[-1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="humanoidrun")
    p.add_argument("--harness", default=None,
                   help="seed_harness.npz path (default results/<env>/)")
    p.add_argument("--out", default=None)
    p.add_argument("--skip_energy", action="store_true")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_cache")))

    import jax.numpy as jnp
    import numpy as np

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.rollout.fused import rollout_rewards
    from mbd_tpu.sim.batched import QD_DIVERGED, ROOT_SINK_TOL

    env = envs_mod.get_env(args.env)
    harness = args.harness or os.path.join("results", args.env,
                                           "seed_harness.npz")
    data = np.load(harness, allow_pickle=True)
    plans = data["plans"]                                  # [S, H, nu]
    S = plans.shape[0]

    rngs = jnp.stack([jax.random.PRNGKey(s) for s in range(S)])
    states_init = jax.vmap(env.reset)(
        jax.vmap(lambda r: jax.random.split(r)[1])(rngs))

    from types import SimpleNamespace
    shim = SimpleNamespace(pipeline_state=SimpleNamespace(
        q=states_init.pipeline_state.q.T,
        qd=states_init.pipeline_state.qd.T))
    rews, ps, bad = jax.jit(lambda y: rollout_rewards(
        env, shim, y, need_states=True))(jnp.asarray(plans))
    rews = np.asarray(rews)                                # [S, H]
    pos = np.asarray(ps.x.pos)                             # [H, S, nlink, 3]
    qd_tr = np.asarray(ps.qd)                              # [H, S, nv]
    bad = np.asarray(bad).astype(bool)

    names = list(env.sys.link_names)
    torso = names.index("torso") if "torso" in names else 0
    dt = float(env.dt)
    H = plans.shape[1]

    seeds_out = []
    for s in range(S):
        x = pos[:, s, torso, 0]
        z = pos[:, s, torso, 2]
        x0 = float(states_init.pipeline_state.x.pos[s, torso, 0])
        speed = np.diff(np.concatenate([[x0], x])) / dt
        seeds_out.append({
            "seed": s,
            "resim_reward": round(float(rews[s].mean()), 4),
            "recorded_reward": round(float(data["rewards"][s]), 4)
            if "rewards" in data else None,
            "diverged": bool(bad[s]),
            "torso_x_final_m": round(float(x[-1]), 3),
            "mean_speed_m_s": round(float((x[-1] - x0) / (dt * H)), 3),
            "peak_speed_m_s": round(float(np.abs(speed).max()), 3),
            "torso_z_min": round(float(z.min()), 3),
            "torso_z_max": round(float(z.max()), 3),
            "min_body_z": round(float(pos[:, s, :, 2].min()), 3),
            "qd_abs_max": round(float(np.abs(qd_tr[:, s]).max()), 3),
        })

    out = {
        "env": args.env,
        "n_seeds": S,
        "engine_envelope": {"qd_diverged_rad_s": float(QD_DIVERGED),
                            "root_sink_tol_m": float(ROOT_SINK_TOL)},
        "horizon_s": round(dt * H, 3),
        "n_diverged": int(bad.sum()),
        "seeds": seeds_out,
    }

    if not args.skip_energy:
        max_def, final_def = energy_audit_batched(env, plans, states_init)
        for s, r in enumerate(seeds_out):
            r["max_energy_defect_J"] = round(float(max_def[s]), 2)
        out["energy_audit"] = {
            "max_defect_J_per_seed": [round(float(x), 2) for x in max_def],
            "final_defect_J_per_seed": [round(float(x), 2)
                                        for x in final_def],
            "criteria": "defect = KE+PE-W_act+W_damp along the CHECKED "
                        "batch-engine trajectory (the engine that produced "
                        "the published rewards); must never grow — "
                        "contacts/limits/clamps only store or dissipate",
        }

    out_path = args.out or f"docs/{args.env.upper()}_PLAUSIBILITY.json"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
