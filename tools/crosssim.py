"""Independent reward validation: re-simulate MBD plans through MuJoCo C.

Every reward in docs/RESULTS.json is evaluated by the same engine that
produced the plan, so nothing rules out contact-model exploits. This tool
closes that loop with the one independent simulator available here (MuJoCo,
already the load-time oracle): run the planner, take the final open-loop
control sequence, roll it through ``mujoco.mj_step`` from the identical
initial state, and score the MuJoCo trajectory with the env's own reward
formula (``reward_qs_b`` — a pure function of q/qd, and our q layout IS the
MuJoCo qpos layout, see sim/system.py). Results go to
docs/RESULTS_CROSSSIM.json; the final plan and the denoise-iterate stack are
persisted to results/<env>/ (mu_0ts.npy matches the reference artifact
layout, mbd/planners/mbd_planner.py:156).

Open-loop trajectories through two different contact solvers diverge
chaotically, so this is a plausibility check (does the plan still earn a
comparable reward on an independent simulator?), not a bitwise one — the
same caveat the reference's brax-positional-vs-generalized backends carry.

  python tools/crosssim.py --envs hopper ant --seed 0
  python tools/crosssim.py --worker hopper:0      # one task (JSON to stdout)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

XMLS = {
    "cartpole": "cartpole.xml", "hopper": "hopper.xml",
    "walker2d": "walker2d.xml", "halfcheetah": "halfcheetah.xml",
    "ant": "ant.xml", "pushT": "pushT.xml",
    "humanoidstandup": "humanoidstandup.xml", "humanoidrun": "humanoidrun.xml",
    "humanoidtrack": "humanoidtrack.xml",
}


def mujoco_rollout(env, xml: str, q0, qd0, us):
    """Roll the open-loop plan through MuJoCo C; returns (qs, qds) stacked
    per env-step ([H, nq], [H, nv])."""
    import mujoco
    import numpy as np

    m = mujoco.MjModel.from_xml_path(xml)
    d = mujoco.MjData(m)
    d.qpos[:] = np.asarray(q0, np.float64)
    d.qvel[:] = np.asarray(qd0, np.float64)
    mujoco.mj_forward(m, d)
    lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
    limited = m.actuator_ctrllimited.astype(bool)
    qs, qds = [], []
    for u in np.asarray(us, np.float64):
        d.ctrl[:] = np.where(limited, np.clip(u, lo, hi), u)
        mujoco.mj_step(m, d, nstep=env.n_frames)
        qs.append(d.qpos.copy())
        qds.append(d.qvel.copy())
    return np.stack(qs), np.stack(qds)


def reward_from_qs(env, qs, qds, us, q0, qd0):
    """Score a trajectory with the env's batch-last pure-q reward."""
    import jax.numpy as jnp
    import numpy as np

    rews = env.reward_qs_b(
        jnp.asarray(qs, jnp.float32)[..., None],
        jnp.asarray(qds, jnp.float32)[..., None],
        jnp.asarray(us, jnp.float32)[..., None],
        jnp.asarray(q0, jnp.float32)[:, None],
        jnp.asarray(qd0, jnp.float32)[:, None])
    return float(np.asarray(rews).mean())


def worker(task: str, platform: str = ""):
    from mbd_tpu.utils.platform import force_platform

    force_platform(platform)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.envs.physics import asset_path
    from mbd_tpu.planners import mbd

    env_name, seed = task.rsplit(":", 1)
    seed = int(seed)
    env = envs_mod.get_env(env_name)
    cfg = mbd.recommended_config(env_name)

    # reproduce plan()'s reset split so the MuJoCo rollout starts from the
    # exact same state the planner optimized from
    rng = jax.random.PRNGKey(seed)
    _, rng_reset = jax.random.split(rng)
    state_init = env.reset(rng_reset)
    q0 = np.asarray(state_init.pipeline_state.q)
    qd0 = np.asarray(state_init.pipeline_state.qd)

    res = mbd.plan(env, cfg, jax.random.PRNGKey(seed), chunk_size=50)
    us = np.asarray(res.Ybars[-1])

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", env_name)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "mu_0ts.npy"), np.asarray(res.Ybars))
    np.save(os.path.join(out_dir, f"plan_seed{seed}.npy"), us)

    # our own engine's reward for this exact plan (plan() may have selected a
    # best-feasible iterate; final_reward corresponds to Ybars[-1] either way)
    ours = float(res.final_reward)

    xml = asset_path(XMLS[env_name])
    qs_mj, qds_mj = mujoco_rollout(env, xml, q0, qd0, us)
    mj = reward_from_qs(env, qs_mj, qds_mj, us, q0, qd0)

    # context for interpreting the gap: open-loop plans across two different
    # contact solvers diverge chaotically, so also record (a) the MuJoCo
    # reward of doing nothing (the floor), and (b) how many env steps the
    # two simulators track each other before q-space divergence
    mj_zero = reward_from_qs(env, *mujoco_rollout(
        env, xml, q0, qd0, np.zeros_like(us)), np.zeros_like(us), q0, qd0)

    from mbd_tpu.rollout.fused import rollout_qs
    import jax.numpy as jnp
    qs_ours, _, _ = jax.jit(
        lambda q, qd, u: rollout_qs(env.sys, env.n_frames, q, qd, u))(
        jnp.asarray(q0, jnp.float32)[:, None],
        jnp.asarray(qd0, jnp.float32)[:, None],
        jnp.asarray(us, jnp.float32)[..., None])
    dq = np.abs(np.asarray(qs_ours)[:, :, 0] - qs_mj).max(axis=1)
    diverged = np.nonzero(dq > 0.1)[0]
    diverge_step = int(diverged[0]) if diverged.size else len(us)

    print(json.dumps({
        "env": env_name, "seed": seed,
        "reward_ours": ours,
        "final_diverged": bool(res.final_diverged)
        if res.final_diverged is not None else False,
        "reward_mujoco": mj,
        "reward_mujoco_zero_ctrl": mj_zero,
        "first_divergence_step": diverge_step, "horizon": len(us),
        "backend": jax.default_backend(),
        "config": dict(Nsample=cfg.Nsample, Hsample=cfg.Hsample,
                       Ndiffuse=cfg.Ndiffuse, temp=cfg.temp_sample),
    }), flush=True)


def replay(env_name: str, seed: int) -> dict:
    """Recover a crosssim row from a SAVED plan (results/<env>/plan_seed
    {seed}.npy) without re-planning — used when a planner worker finished
    (plan persisted) but the parent died before merging its stdout JSON
    (the 2026-08-20 session cut mid-write). Runs fine on CPU: one
    trajectory each through MuJoCo C and our fused engine."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.envs.physics import asset_path
    from mbd_tpu.planners import mbd
    from mbd_tpu.rollout.fused import rollout_qs

    env = envs_mod.get_env(env_name)
    cfg = mbd.recommended_config(env_name)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    us = np.load(os.path.join(root, "results", env_name,
                              f"plan_seed{seed}.npy"))

    _, rng_reset = jax.random.split(jax.random.PRNGKey(seed))
    st = env.reset(rng_reset)
    q0 = np.asarray(st.pipeline_state.q)
    qd0 = np.asarray(st.pipeline_state.qd)

    qs_ours, qds_ours, bad = jax.jit(
        lambda q, qd, u: rollout_qs(env.sys, env.n_frames, q, qd, u))(
        jnp.asarray(q0, jnp.float32)[:, None],
        jnp.asarray(qd0, jnp.float32)[:, None],
        jnp.asarray(us, jnp.float32)[..., None])
    ours = reward_from_qs(env, np.asarray(qs_ours)[:, :, 0],
                          np.asarray(qds_ours)[:, :, 0], us, q0, qd0)

    xml = asset_path(XMLS[env_name])
    qs_mj, qds_mj = mujoco_rollout(env, xml, q0, qd0, us)
    mj = reward_from_qs(env, qs_mj, qds_mj, us, q0, qd0)
    mj_zero = reward_from_qs(env, *mujoco_rollout(
        env, xml, q0, qd0, np.zeros_like(us)), np.zeros_like(us), q0, qd0)

    dq = np.abs(np.asarray(qs_ours)[:, :, 0] - qs_mj).max(axis=1)
    diverged = np.nonzero(dq > 0.1)[0]
    return {
        "env": env_name, "seed": seed,
        "reward_ours": ours,
        "final_diverged": bool(np.asarray(bad)[0] > 0),
        "reward_mujoco": mj,
        "reward_mujoco_zero_ctrl": mj_zero,
        "first_divergence_step":
            int(diverged[0]) if diverged.size else len(us),
        "horizon": len(us),
        "backend": "replayed_from_saved_plan (scored on "
                   + jax.default_backend() + ")",
        "config": dict(Nsample=cfg.Nsample, Hsample=cfg.Hsample,
                       Ndiffuse=cfg.Ndiffuse, temp=cfg.temp_sample),
    }


def npz_crosssim(env_name: str):
    """Cross-validate the SAVED 8-seed harness plans (the exact plans whose
    rewards docs/RESULTS.json publishes, results/<env>/seed_harness.npz)
    through MuJoCo C — no re-planning, so this runs anywhere MuJoCo does.
    Returns per-seed MuJoCo rewards + zero-control floors."""
    import jax
    import numpy as np

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.envs.physics import asset_path

    env = envs_mod.get_env(env_name)
    xml = asset_path(XMLS[env_name])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = np.load(os.path.join(root, "results", env_name, "seed_harness.npz"))
    plans, rewards = d["plans"], d["rewards"]

    rows = []
    for s in range(plans.shape[0]):
        # the harness's reset-split chain (plan_batch == plan serial)
        _, rng_reset = jax.random.split(jax.random.PRNGKey(s))
        st = env.reset(rng_reset)
        q0 = np.asarray(st.pipeline_state.q)
        qd0 = np.asarray(st.pipeline_state.qd)
        us = np.asarray(plans[s])
        mj = reward_from_qs(env, *mujoco_rollout(env, xml, q0, qd0, us),
                            us, q0, qd0)
        mj_zero = reward_from_qs(env, *mujoco_rollout(
            env, xml, q0, qd0, np.zeros_like(us)), np.zeros_like(us),
            q0, qd0)
        rows.append({"seed": s, "reward_ours": round(float(rewards[s]), 4),
                     "reward_mujoco": round(float(mj), 4),
                     "reward_mujoco_zero_ctrl": round(float(mj_zero), 4)})
    ours = np.array([r["reward_ours"] for r in rows])
    mjs = np.array([r["reward_mujoco"] for r in rows])
    return {
        "protocol": "saved 8-seed harness plans replayed open-loop through "
                    "MuJoCo C from the identical initial states, scored "
                    "with the env's own reward formula",
        "reward_ours_mean": round(float(ours.mean()), 4),
        "reward_mujoco_mean": round(float(mjs.mean()), 4),
        "reward_mujoco_std": round(float(mjs.std()), 4),
        "per_seed": rows,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", nargs="+", default=list(XMLS))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--timeout", type=int, default=2400)
    p.add_argument("--out", default="docs/RESULTS_CROSSSIM.json")
    p.add_argument("--worker", default=None)
    p.add_argument("--platform", default="",
                   help="pin the jax backend (e.g. 'cpu' when the TPU "
                        "tunnel is down); empty = environment default")
    p.add_argument("--replay", nargs="+", default=None,
                   help="recover rows for these envs from their saved "
                        "plan_seed{seed}.npy (no re-planning; CPU-safe)")
    p.add_argument("--from_npz", nargs="+", default=None,
                   help="cross-validate the saved seed-harness plans for "
                        "these envs (all 8 seeds, MuJoCo only, no "
                        "re-planning) into docs/RESULTS_CROSSSIM_8SEED.json")
    args = p.parse_args()

    if args.worker:
        worker(args.worker, args.platform)
        return

    if args.replay:
        import jax
        jax.config.update("jax_platforms", args.platform or "cpu")
        results = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                results = json.load(f)
        for e in args.replay:
            res = replay(e, args.seed)
            results[res["env"]] = {k: res[k] for k in
                                   ("seed", "reward_ours", "final_diverged",
                                    "reward_mujoco",
                                    "reward_mujoco_zero_ctrl",
                                    "first_divergence_step",
                                    "horizon", "backend", "config")}
            print(f"{e}: ours={res['reward_ours']:.3f} "
                  f"mujoco={res['reward_mujoco']:.3f} "
                  f"div_step={res['first_divergence_step']}/"
                  f"{res['horizon']}", flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")
        return

    if args.from_npz:
        # MuJoCo C + a per-seed env.reset — no device compute worth a TPU;
        # pin CPU so a dead tunnel can't hang the replay
        import jax
        jax.config.update("jax_platforms", "cpu")
        out_path = "docs/RESULTS_CROSSSIM_8SEED.json"
        results = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                results = json.load(f)
        for e in args.from_npz:
            results[e] = npz_crosssim(e)
            print(f"{e}: ours={results[e]['reward_ours_mean']:.3f} "
                  f"mujoco={results[e]['reward_mujoco_mean']:.3f} "
                  f"± {results[e]['reward_mujoco_std']:.3f}", flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {out_path}")
        return

    from mbd_tpu.utils import launcher

    tasks = [f"{e}:{args.seed}" for e in args.envs]
    records = launcher.run_tasks(
        [sys.executable, os.path.abspath(__file__), "--worker", "{task}",
         "--platform", args.platform],
        tasks, timeout_sec=args.timeout, retries=1, jobs=1)

    # merge into the existing file: a crashed re-measurement ANNOTATES the
    # previously earned row, never erases it (same rule as run_results.py —
    # round-4's humanoid-harness failure chain, docs/ROUND5.md §2)
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    results["_semantics"] = {
        "first_divergence_step": "first env step where max |q_ours - q_mujoco|"
        " exceeds 0.1 (open-loop, two contact solvers); equal to `horizon`"
        " means the simulators tracked each other for the whole plan"
        " (bigger is better)",
        "final_diverged": "our engine's validity-envelope flag on the plan"
        " (sim/batched.py qd + penetration checks)"}
    for r in records:
        if r.get("failed"):
            env_name = r["task"].split(":")[0]
            prev = results.get(env_name)
            if isinstance(prev, dict) and "reward_ours" in prev:
                prev["remeasure_failed"] = True
            else:
                results[env_name] = {"failed": True}
            continue
        res = r["result"]
        results[res["env"]] = {k: res[k] for k in
                               ("seed", "reward_ours", "final_diverged",
                                "reward_mujoco",
                                "reward_mujoco_zero_ctrl",
                                "first_divergence_step",
                                "horizon", "backend", "config")}
        print(f"{res['env']}: ours={res['reward_ours']:.3f} "
              f"mujoco={res['reward_mujoco']:.3f}", flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
