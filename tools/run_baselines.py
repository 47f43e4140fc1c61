"""Zeroth-order baseline comparison table (docs/RESULTS_BASELINES.json).

The reference's headline comparison (paper table; harness
mbd/scripts/run_mbd.py with --algo path_integral): MPPI / CEM / CMA-ES on the
same rollout engine and sample budget as MBD. Run per-seed in subprocesses
via the fault-tolerant launcher, like tools/run_results.py.

  python tools/run_baselines.py --env hopper --n_seeds 3
  python tools/run_baselines.py --worker hopper:mppi:0    # one task (JSON)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METHODS = ["mppi", "cem", "cma-es"]


def worker(task: str, platform: str = ""):
    from mbd_tpu.utils.platform import force_platform

    force_platform(platform)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.planners import path_integral

    env_name, method, seed = task.split(":")
    seed = int(seed)
    env = envs_mod.get_env(env_name)
    cfg = path_integral.recommended_config(
        env_name, path_integral.PathIntegralConfig(update_method=method))
    t0 = time.time()
    res = path_integral.plan(env, cfg, jax.random.PRNGKey(seed))
    print(json.dumps({
        "env": env_name, "method": method, "seed": seed,
        "final_reward": float(res.final_reward),
        "final_diverged": bool(res.final_diverged),
        "backend": jax.default_backend(),
        "wall_s": round(time.time() - t0, 1),
        "config": dict(Nsample=cfg.Nsample, Hsample=cfg.Hsample,
                       Nrefine=cfg.Nrefine, temp=cfg.temp_sample),
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="hopper")
    p.add_argument("--n_seeds", type=int, default=3)
    p.add_argument("--timeout", type=int, default=2400)
    p.add_argument("--out", default="docs/RESULTS_BASELINES.json")
    p.add_argument("--worker", default=None)
    p.add_argument("--platform", default="",
                   help="pin the jax backend (e.g. 'cpu' when the TPU "
                        "tunnel is down); empty = environment default")
    args = p.parse_args()

    if args.worker:
        worker(args.worker, args.platform)
        return

    import numpy as np

    from mbd_tpu.utils import launcher

    tasks = [f"{args.env}:{m}:{s}" for m in METHODS
             for s in range(args.n_seeds)]
    records = launcher.run_tasks(
        [sys.executable, os.path.abspath(__file__), "--worker", "{task}",
         "--platform", args.platform],
        tasks, timeout_sec=args.timeout, retries=1, jobs=1)

    baselines = {}
    cfg = None
    for m in METHODS:
        recs = [r["result"] for r in records
                if not r.get("failed") and r["result"]["method"] == m]
        if not recs:
            baselines[m] = {"failed": True}
            continue
        cfg = recs[0]["config"]
        # divergence-honest aggregate: a flagged seed's reward is never
        # averaged in silently (same policy as tools/run_results.py)
        rews = [r["final_reward"] for r in recs
                if not r.get("final_diverged", False)]
        n_div = sum(bool(r.get("final_diverged", False)) for r in recs)
        walls = [r["wall_s"] for r in recs]
        baselines[m] = {
            "rew_mean": float(np.mean(rews)) if rews else None,
            "rew_std": float(np.std(rews)) if rews else None,
            "n_seeds": len(recs),
            "n_diverged": n_div,
            "per_seed": {
                "rewards": [round(r["final_reward"], 4) for r in recs],
                "diverged": [bool(r.get("final_diverged", False))
                             for r in recs],
            },
            "backend": recs[0].get("backend"),
            "wall_total_s": round(float(np.sum(walls)), 1),
        }
        if rews:
            print(f"{m}: {np.mean(rews):.3f} ± {np.std(rews):.3f}"
                  f"{f' ({n_div} DIVERGED)' if n_div else ''}", flush=True)

    mbd_point = None
    res_path = os.path.join("docs", "RESULTS.json")
    if os.path.exists(res_path):
        with open(res_path) as f:
            mbd_point = json.load(f).get(args.env, {}).get("rew_mean")

    out = {"env": args.env, **(cfg or {}), "baselines": baselines,
           "mbd_reference_point": (round(mbd_point, 3)
                                   if mbd_point is not None else None)}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
