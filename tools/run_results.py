"""Produce the recorded planner results table (docs/RESULTS.json).

Runs the MBD planner with recommended per-env parameters over multiple
seeds — the same acceptance harness the reference uses
(mbd/scripts/run_mbd.py:17-39), but with numbers persisted and each
env×seed run isolated in its own subprocess via the native fault-tolerant
launcher (native/launcher): a device fault costs one retry, not the sweep.

  python tools/run_results.py --envs hopper ant --n_seeds 3
  python tools/run_results.py --worker hopper:0          # one task (JSON)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(task: str, engine: str):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.planners import mbd

    env_name, seed = task.rsplit(":", 1)
    seed = int(seed)
    # "<env>+demo" rows run demo-conditioned diffusion (reference
    # mbd_planner.py:117-125) and additionally score the final plan's
    # demo-tracking log-density
    demo = env_name.endswith("+demo")
    base_name = env_name[:-len("+demo")] if demo else env_name
    env = envs_mod.get_env(base_name)
    cfg = mbd.recommended_config(base_name)
    if demo:
        import dataclasses
        cfg = dataclasses.replace(cfg, enable_demo=True)
    t0 = time.time()
    res = mbd.plan(env, cfg, jax.random.PRNGKey(seed), chunk_size=50,
                   engine=engine or None)
    out = {
        "env": env_name, "seed": seed,
        "final_reward": float(res.final_reward),
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
        "config": dict(Nsample=cfg.Nsample, Hsample=cfg.Hsample,
                       Ndiffuse=cfg.Ndiffuse, temp=cfg.temp_sample,
                       enable_demo=demo),
    }
    if demo:
        rng_reset = jax.random.split(jax.random.PRNGKey(seed))[1]
        st = env.reset(rng_reset)
        if hasattr(env, "traj_xref_logpd"):
            # score with the same batch engine the plan was made with — the
            # vmap single-rollout path has a different f32 contraction order
            # and can diverge (→ NaN logpd) on plans the fused engine
            # integrates fine (see mbd.plan's final-eval note)
            from mbd_tpu.rollout.fused import rollout_rewards

            _, qs, _ = jax.jit(lambda s, y: rollout_rewards(
                env, s, y, need_states=True))(st, res.Ybars[-1][None])
            out["xref_logpd"] = float(env.traj_xref_logpd(qs)[0])
        else:
            from mbd_tpu.rollout import rollout_us

            _, states = rollout_us(jax.jit(env.step), st, res.Ybars[-1])
            out["xref_logpd"] = float(env.eval_xref_logpd(states))
    print(json.dumps(out), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", nargs="+",
                   default=["cartpole", "hopper", "walker2d", "halfcheetah",
                            "ant", "pushT", "humanoidstandup",
                            "humanoidrun"])
    p.add_argument("--n_seeds", type=int, default=3)
    p.add_argument("--engine", default="")
    p.add_argument("--timeout", type=int, default=2400)
    p.add_argument("--out", default="docs/RESULTS.json")
    p.add_argument("--worker", default=None, help="internal: run one task")
    args = p.parse_args()

    if args.worker:
        worker(args.worker, args.engine)
        return

    import numpy as np

    from mbd_tpu.utils import launcher

    tasks = [f"{e}:{s}" for e in args.envs for s in range(args.n_seeds)]
    records = launcher.run_tasks(
        [sys.executable, os.path.abspath(__file__), "--worker", "{task}",
         "--engine", args.engine],
        tasks, timeout_sec=args.timeout, retries=1, jobs=1)

    results = {}
    for e in args.envs:
        rews = [r["result"]["final_reward"] for r in records
                if not r.get("failed") and r["result"]["env"] == e]
        walls = [r["result"]["wall_s"] for r in records
                 if not r.get("failed") and r["result"]["env"] == e]
        if not rews:
            results[e] = {"failed": True}
            continue
        cfgs = [r["result"]["config"] for r in records
                if not r.get("failed") and r["result"]["env"] == e]
        results[e] = {
            "rew_mean": float(np.mean(rews)),
            "rew_std": float(np.std(rews)),
            "wall_mean_s": float(np.mean(walls)),
            "n_seeds": len(rews),
            "config": cfgs[0],
        }
        logpds = [r["result"]["xref_logpd"] for r in records
                  if not r.get("failed") and r["result"]["env"] == e
                  and "xref_logpd" in r["result"]]
        if logpds:
            results[e]["xref_logpd_mean"] = float(np.mean(logpds))
            results[e]["xref_logpd_std"] = float(np.std(logpds))
        print(f"{e}: {np.mean(rews):.3f} ± {np.std(rews):.3f} "
              f"({np.mean(walls):.0f}s)", flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    # merge into any existing table so partial sweeps don't clobber rows
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
