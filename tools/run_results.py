"""Produce the recorded planner results table (docs/RESULTS.md).

Runs the MBD planner with recommended per-env parameters over multiple
seeds on the available backend (TPU preferred) and records final rewards
and wall times — the same acceptance harness the reference uses
(mbd/scripts/run_mbd.py:17-39), but with the numbers persisted.

  python tools/run_results.py --envs hopper ant --n_seeds 4
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", nargs="+",
                   default=["hopper", "walker2d", "halfcheetah", "ant",
                            "humanoidrun", "humanoidstandup", "pushT",
                            "cartpole"])
    p.add_argument("--n_seeds", type=int, default=4)
    p.add_argument("--engine", default=None)
    p.add_argument("--out", default="docs/RESULTS.json")
    args = p.parse_args()

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.planners import mbd

    results = {}
    for env_name in args.envs:
        env = envs_mod.get_env(env_name)
        cfg = mbd.recommended_config(env_name)
        rews, times = [], []
        for seed in range(args.n_seeds):
            t0 = time.time()
            res = mbd.plan(env, cfg, jax.random.PRNGKey(seed),
                           chunk_size=50, engine=args.engine)
            rew = float(res.final_reward)
            dt = time.time() - t0
            rews.append(rew)
            times.append(dt)
            print(f"{env_name} seed {seed}: rew={rew:.3f} t={dt:.1f}s",
                  flush=True)
        results[env_name] = {
            "config": dict(Nsample=cfg.Nsample, Hsample=cfg.Hsample,
                           Ndiffuse=cfg.Ndiffuse,
                           temp_sample=cfg.temp_sample),
            "rew_mean": float(np.mean(rews)),
            "rew_std": float(np.std(rews)),
            "time_mean_s": float(np.mean(times)),
            "backend": jax.default_backend(),
            "n_seeds": args.n_seeds,
        }
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"{env_name}: {np.mean(rews):.3f} ± {np.std(rews):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
