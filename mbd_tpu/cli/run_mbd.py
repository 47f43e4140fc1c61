"""CLI entry point: run a planner on an env and write artifacts.

Parity with the reference's entry points (mbd/planners/mbd_planner.py:186,
mbd/planners/path_integral.py:152, mbd/scripts/run_mbd.py:9-72):

  python -m mbd_tpu.cli.run_mbd --env_name hopper                 # MBD
  python -m mbd_tpu.cli.run_mbd --env_name ant --algo path_integral \
      --update_method mppi
  python -m mbd_tpu.cli.run_mbd --env_name car2d --enable_demo
  python -m mbd_tpu.cli.run_mbd --env_name hopper --mode seed     # 8-seed
  python -m mbd_tpu.cli.run_mbd --env_name hopper --mode temp     # sweep

Artifacts land in results/<env_name>/: mu_0ts.npy (stack of denoised
means), rollout.html (or rollout.png for car2d) — same layout as the
reference so downstream tooling ports over.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env_name", default="ant")
    p.add_argument("--algo", default="mbd", choices=["mbd", "path_integral"])
    p.add_argument("--mode", default="single",
                   choices=["single", "seed", "temp"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_seeds", type=int, default=8)
    p.add_argument("--disable_recommended_params", action="store_true")
    p.add_argument("--not_render", action="store_true")
    p.add_argument("--Nsample", type=int, default=2048)
    p.add_argument("--Hsample", type=int, default=50)
    p.add_argument("--Ndiffuse", type=int, default=100)
    p.add_argument("--temp_sample", type=float, default=0.1)
    p.add_argument("--beta0", type=float, default=1e-4)
    p.add_argument("--betaT", type=float, default=1e-2)
    p.add_argument("--enable_demo", action="store_true")
    p.add_argument("--update_method", default="mppi",
                   choices=["mppi", "cma-es", "cem"])
    p.add_argument("--chunk_size", type=int, default=10,
                   help="denoise steps per device dispatch (0 = one program)")
    p.add_argument("--batch_seeds", action="store_true",
                   help="seed mode: run all seeds as one batched device "
                        "program (mbd.plan_batch) instead of serially")
    p.add_argument("--results_dir", default="results")
    p.add_argument("--platform", default="",
                   help="pin the jax backend (e.g. 'cpu' when the TPU "
                        "tunnel is down); empty = environment default")
    p.add_argument("--engine", default="",
                   choices=["", "pallas", "fused", "vmap"],
                   help="rollout engine for physics envs (empty = "
                        "default_engine: Pallas on TPU, fused elsewhere). "
                        "'fused' skips the Pallas kernel's long one-off "
                        "Mosaic compile — same math, parity-tested. "
                        "Analytic envs (car2d) ignore this and keep vmap")
    return p


def _engine_for(env, args):
    """--engine applies to physics envs only; analytic envs (no sys) have
    exactly one engine."""
    from ..envs.physics import PhysicsEnv

    if args.engine and isinstance(env, PhysicsEnv):
        return args.engine
    return None


def _make_cfg(args):
    from ..planners import mbd, path_integral

    if args.algo == "mbd":
        cfg = mbd.MBDConfig(
            Nsample=args.Nsample, Hsample=args.Hsample,
            Ndiffuse=args.Ndiffuse, temp_sample=args.temp_sample,
            beta0=args.beta0, betaT=args.betaT,
            enable_demo=args.enable_demo)
        if not args.disable_recommended_params:
            cfg = mbd.recommended_config(args.env_name, cfg)
            print(f"override temp_sample to {cfg.temp_sample}")
        return cfg
    cfg = path_integral.PathIntegralConfig(
        update_method=args.update_method, Nsample=args.Nsample,
        Hsample=args.Hsample, Nrefine=args.Ndiffuse,
        temp_sample=args.temp_sample)
    if not args.disable_recommended_params:
        cfg = path_integral.recommended_config(args.env_name, cfg)
        print(f"override temp_sample to {cfg.temp_sample}")
    return cfg


def run_single(args, render: bool = True) -> float:
    import jax

    from .. import envs
    from ..planners import mbd, path_integral
    from ..rollout import rollout_states

    env = envs.get_env(args.env_name)
    cfg = _make_cfg(args)
    rng = jax.random.PRNGKey(args.seed)

    if args.algo == "mbd":
        def progress(step, rew):
            print(f"  denoise step {step}/{cfg.Ndiffuse}: rew {rew:.3e}",
                  flush=True)
        res = mbd.plan(env, cfg, rng, chunk_size=args.chunk_size,
                       progress_fn=progress, engine=_engine_for(env, args))
        Ybars = res.Ybars
    else:
        res = path_integral.plan(env, cfg, rng,
                                 engine=_engine_for(env, args))
        Ybars = res.mu_0ts
    if res.final_diverged is not None and bool(
            np.asarray(res.final_diverged).any()):
        print("WARNING: final plan flagged DIVERGED by the engine's "
              "validity envelope — the reward below is not an earned "
              "number", flush=True)

    if render:
        path = os.path.join(args.results_dir, args.env_name)
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "mu_0ts.npy"), np.asarray(Ybars))
        rng_reset = jax.random.split(jax.random.PRNGKey(args.seed))[1]
        state_init = env.reset(rng_reset)
        states = rollout_states(jax.jit(env.step), state_init, Ybars[-1])
        if args.env_name == "car2d":
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(1, 1, figsize=(4, 4))
            xs = np.concatenate(
                [np.asarray(state_init.pipeline_state)[None],
                 np.asarray(states.pipeline_state)])
            env.render(ax, xs, show_demo=args.enable_demo)
            fig.savefig(os.path.join(path, "rollout.png"), dpi=120,
                        bbox_inches="tight")
        else:
            from ..viz import html as vhtml

            page = vhtml.render_states(
                env.sys, states.pipeline_state, dt=env.dt,
                title=f"{args.env_name} ({args.algo})")
            with open(os.path.join(path, "rollout.html"), "w") as f:
                f.write(page)
    return float(res.final_reward)


def run_multiple_seed(args) -> None:
    """8-seed statistical harness (reference run_mbd.py:17-39).

    ``--batch_seeds`` folds every seed into ONE batched device program
    (mbd.plan_batch): the engines roll out n_seeds·Nsample trajectories per
    denoise step, so the whole harness costs roughly one seed's wall time
    when the chip has headroom — a TPU-native speedup over the reference's
    serial loop."""
    if args.batch_seeds:
        import jax
        import jax.numpy as jnp

        from .. import envs
        from ..planners import mbd, path_integral

        env = envs.get_env(args.env_name)
        cfg = _make_cfg(args)
        rngs = jnp.stack(
            [jax.random.PRNGKey(s) for s in range(args.n_seeds)])
        t0 = time.time()
        if args.algo == "mbd":
            res = mbd.plan_batch(env, cfg, rngs,
                                 chunk_size=args.chunk_size,
                                 engine=_engine_for(env, args))
        else:
            res = path_integral.plan_batch(env, cfg, rngs,
                                           engine=_engine_for(env, args))
        rews = np.asarray(res.final_reward)
        divs = (np.asarray(res.final_diverged)
                if res.final_diverged is not None
                else np.zeros(len(rews), bool))
        dt = time.time() - t0
        for seed, (rew, dv) in enumerate(zip(rews, divs)):
            tag = "  [DIVERGED]" if dv else ""
            print(f"seed {seed}: rew={rew:.3f}{tag}", flush=True)
        print(f"rew: {np.mean(rews):.3f} ± {np.std(rews):.3f}"
              + (f"  ({int(divs.sum())} diverged)" if divs.any() else ""))
        print(f"time: {dt:.1f} s total (batched over "
              f"{args.n_seeds} seeds)")
        return
    rews, times = [], []
    for seed in range(args.n_seeds):
        args.seed = seed
        t0 = time.time()
        rew = run_single(args, render=False)
        dt = time.time() - t0
        rews.append(rew)
        times.append(dt)
        print(f"seed {seed}: rew={rew:.3f} time={dt:.1f}s", flush=True)
    print(f"rew: {np.mean(rews):.3f} ± {np.std(rews):.3f}")
    print(f"time: {np.mean(times):.1f} ± {np.std(times):.1f} s")


def run_multiple_temp(args) -> None:
    """Temperature sweep (reference run_mbd.py:42-64), persisted to
    docs/RESULTS_TEMP.json (keyed by env; merged, not clobbered).

    Each temperature runs ``--n_seeds`` seeds as ONE batched device
    program (mbd.plan_batch), so the sweep reports mean ± std per temp —
    the reference sweeps a single seed per temp serially."""
    import json

    import jax
    import jax.numpy as jnp

    from .. import envs
    from ..planners import mbd

    temps = [0.01, 0.05, 0.1, 0.2, 0.4, 0.8]
    args.disable_recommended_params = True
    env = envs.get_env(args.env_name)
    rngs = jnp.stack([jax.random.PRNGKey(s) for s in range(args.n_seeds)])
    results = {}
    for t in temps:
        args.temp_sample = t
        cfg = _make_cfg(args)
        res = mbd.plan_batch(env, cfg, rngs, chunk_size=args.chunk_size,
                             engine=_engine_for(env, args))
        rews = np.asarray(res.final_reward)
        divs = (np.asarray(res.final_diverged)
                if res.final_diverged is not None
                else np.zeros(len(rews), bool))
        results[t] = {
            "rew_mean": float(np.mean(rews)),
            "rew_std": float(np.std(rews)),
            "rewards": [round(float(r), 4) for r in rews],
            "diverged": [bool(d) for d in divs],
        }
        print(f"temp {t}: rew={np.mean(rews):.3f} ± {np.std(rews):.3f}"
              + (f" ({int(divs.sum())} diverged)" if divs.any() else ""),
              flush=True)
    best = max(results, key=lambda t: results[t]["rew_mean"])
    print(f"best temp: {best} (rew={results[best]['rew_mean']:.3f})")

    # the published evidence file only when writing to the default results
    # tree; ad-hoc runs (--results_dir elsewhere) keep their sweep next to
    # their other outputs instead of clobbering docs/
    out = (os.path.join("docs", "RESULTS_TEMP.json")
           if args.results_dir == "results"
           else os.path.join(args.results_dir, "RESULTS_TEMP.json"))
    table = {}
    if os.path.exists(out):
        with open(out) as f:
            table = json.load(f)
    table[args.env_name] = {
        "sweep": {str(t): r for t, r in results.items()},
        "best_temp": best,
        "best_reward": results[best]["rew_mean"],
        "n_seeds": args.n_seeds,
        "backend": jax.default_backend(),
        "engine": _engine_for(env, args) or "default",
        "config": dict(Nsample=args.Nsample, Hsample=args.Hsample,
                       Ndiffuse=args.Ndiffuse),
    }
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(table, f, indent=2)
    print(f"wrote {out}")


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..utils.platform import enable_persistent_cache, force_platform

    force_platform(args.platform)
    enable_persistent_cache()
    if args.mode == "single":
        rew = run_single(args)
        print(f"final reward = {rew:.2e}")
    elif args.mode == "seed":
        run_multiple_seed(args)
    else:
        run_multiple_temp(args)


if __name__ == "__main__":
    main()
