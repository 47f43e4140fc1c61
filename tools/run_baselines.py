"""Zeroth-order baseline comparison table (docs/RESULTS_BASELINES.json).

The reference's headline empirical claim (paper table; harness
mbd/scripts/run_mbd.py with --algo path_integral): MBD beats MPPI / CEM /
CMA-ES at the same rollout engine and sample budget, per env. Each
(env, method) runs its seeds as ONE batched device program
(path_integral.plan_batch — seeds fold into the engines' sample axis),
isolated in a subprocess via the fault-tolerant launcher like
tools/run_results.py.

  python tools/run_baselines.py --envs hopper walker2d ant --n_seeds 8
  python tools/run_baselines.py --worker hopper:mppi       # one task (JSON)

Output JSON is keyed by env:
  {env: {config..., mbd_reference_point, baselines: {method: row}}}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METHODS = ["mppi", "cem", "cma-es"]


def worker(task: str, n_seeds: int, platform: str = "", engine: str = "",
           seed_chunk: int = 0):
    from mbd_tpu.utils.platform import force_platform

    force_platform(platform)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.planners import path_integral

    env_name, method = task.split(":")
    env = envs_mod.get_env(env_name)
    cfg = path_integral.recommended_config(
        env_name, path_integral.PathIntegralConfig(update_method=method))
    rngs = jnp.stack([jax.random.PRNGKey(s) for s in range(n_seeds)])
    # --engine applies to physics envs only (analytic envs have one engine)
    from mbd_tpu.envs.physics import PhysicsEnv
    eng = engine if (engine and isinstance(env, PhysicsEnv)) else None
    t0 = time.time()
    # --seed_chunk: split the seed batch into HBM-fitting chunks sharing
    # ONE compiled program (same policy as tools/run_results.py —
    # humanoidrun's 8×8192 flat sample axis does not fit the fused engine)
    K = seed_chunk if seed_chunk > 0 else n_seeds
    if seed_chunk == 0 and isinstance(env, PhysicsEnv) \
            and env.sys.nbody >= 10:
        # measured HBM ceiling (round 5): every 16384-flat humanoid fused
        # program died on-chip, 8192-flat runs — the corrected PGS solver
        # carries [C, nv, B] live constraint stacks. Auto-chunk down.
        while cfg.Nsample * K > 8192 and K % 2 == 0:
            K //= 2
    if n_seeds % K != 0:
        raise SystemExit(f"--seed_chunk {K} does not divide {n_seeds}")
    parts = [path_integral.plan_batch(env, cfg, rngs[i:i + K], engine=eng)
             for i in range(0, n_seeds, K)]
    rewards = [float(r) for p in parts for r in p.final_reward]
    diverged = [bool(d) for p in parts for d in p.final_diverged]
    print(json.dumps({
        "env": env_name, "method": method, "n_seeds": n_seeds,
        "rewards": rewards,
        "diverged": diverged,
        "backend": jax.default_backend(),
        "engine": eng or "default",
        "wall_s": round(time.time() - t0, 1),
        "config": dict(Nsample=cfg.Nsample, Hsample=cfg.Hsample,
                       Nrefine=cfg.Nrefine, temp=cfg.temp_sample),
    }), flush=True)


def _aggregate(rec):
    import numpy as np

    rews_all = np.asarray(rec["rewards"], np.float64)
    div = np.asarray(rec["diverged"], bool)
    # divergence-honest aggregate: a flagged seed's reward is never
    # averaged in silently (same policy as tools/run_results.py)
    rews = rews_all[~div]
    n_div = int(div.sum())
    return {
        "rew_mean": float(np.mean(rews)) if rews.size else None,
        "rew_std": float(np.std(rews)) if rews.size else None,
        "n_seeds": len(rews_all),
        "n_diverged": n_div,
        "per_seed": {
            "rewards": [round(float(r), 4) for r in rews_all],
            "diverged": [bool(d) for d in div],
        },
        "backend": rec.get("backend"),
        "engine": rec.get("engine"),
        "wall_total_s": rec.get("wall_s"),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", nargs="+", default=["hopper"])
    p.add_argument("--n_seeds", type=int, default=8)
    p.add_argument("--timeout", type=int, default=2400)
    p.add_argument("--out", default="docs/RESULTS_BASELINES.json")
    p.add_argument("--worker", default=None)
    p.add_argument("--platform", default="",
                   help="pin the jax backend (e.g. 'cpu' when the TPU "
                        "tunnel is down); empty = environment default")
    p.add_argument("--engine", default="",
                   choices=["", "pallas", "fused", "vmap"],
                   help="rollout engine for physics envs (empty = "
                        "default_engine). 'fused' skips the Pallas "
                        "kernel's long one-off Mosaic compile per "
                        "(env, method) program — same math, parity-tested")
    p.add_argument("--seed_chunk", type=int, default=0,
                   help="run the seed batch in chunks of K seeds sharing "
                        "one compiled program (0 = all seeds in one "
                        "batch). For envs whose flattened seeds×Nsample "
                        "axis exceeds HBM (humanoidrun: 8×8192 on fused)")
    args = p.parse_args()

    if args.worker:
        worker(args.worker, args.n_seeds, args.platform, args.engine,
               args.seed_chunk)
        return

    from mbd_tpu.utils import launcher

    tasks = [f"{e}:{m}" for e in args.envs for m in METHODS]
    records = launcher.run_tasks(
        [sys.executable, os.path.abspath(__file__), "--worker", "{task}",
         "--n_seeds", str(args.n_seeds), "--platform", args.platform,
         "--engine", args.engine, "--seed_chunk", str(args.seed_chunk)],
        tasks, timeout_sec=args.timeout, retries=1, jobs=1)

    mbd_table = {}
    res_path = os.path.join("docs", "RESULTS.json")
    if os.path.exists(res_path):
        with open(res_path) as f:
            mbd_table = json.load(f)

    results = {}
    for env_name in args.envs:
        baselines = {}
        cfg = None
        for r in records:
            if r["task"].split(":")[0] != env_name:
                continue
            method = r["task"].split(":")[1]
            if r.get("failed"):
                baselines[method] = {"failed": True}
                continue
            rec = r["result"]
            cfg = rec["config"]
            row = _aggregate(rec)
            baselines[method] = row
            if row["rew_mean"] is not None:
                flag = (f" ({row['n_diverged']} DIVERGED)"
                        if row["n_diverged"] else "")
                print(f"{env_name}:{method}: {row['rew_mean']:.3f} "
                      f"± {row['rew_std']:.3f}{flag} "
                      f"[{row['wall_total_s']}s]", flush=True)
        mbd_point = mbd_table.get(env_name, {}).get("rew_mean")
        results[env_name] = {
            **(cfg or {}), "baselines": baselines,
            "mbd_reference_point": (round(mbd_point, 3)
                                    if mbd_point is not None else None)}

    # merge into any existing table so partial sweeps don't clobber rows
    if os.path.exists(args.out):
        with open(args.out) as f:
            old = json.load(f)
        if "baselines" in old and "env" in old:
            old = {old["env"]: {k: v for k, v in old.items() if k != "env"}}
        old.update(results)
        results = old
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
