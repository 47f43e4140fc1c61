"""Produce the recorded planner results table (docs/RESULTS.json).

The reference's acceptance harness is 8 seeds of the MBD planner with
recommended per-env parameters (mbd/scripts/run_mbd.py:17-39). Here every
env runs its seeds as ONE batched device program (mbd.plan_batch — seeds
fold into the engines' sample axis), each env isolated in its own
subprocess via the native fault-tolerant launcher (native/launcher): a
device fault costs one retry, not the sweep.

Per-seed final rewards AND the engine's divergence flags are persisted —
a flagged reward is never silently averaged into a published number
(round-2 verdict items 1+3). The final per-seed plans are saved to
results/<env>/seed_harness.npz for downstream plausibility auditing
(tools/plausibility.py).

  python tools/run_results.py --envs hopper ant --n_seeds 8
  python tools/run_results.py --worker hopper          # one task (JSON)

Env task names may carry a "+demo" suffix (demo-conditioned diffusion,
reference mbd_planner.py:117-125); demo-capable envs are also scored for
the demo-tracking log-density of the final plan either way, so the
with/without-demo contrast is measurable.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(task: str, engine: str, n_seeds: int, chunk_size: int,
           results_dir: str, platform: str = "", seed_chunk: int = 0):
    from mbd_tpu.utils.platform import force_platform

    force_platform(platform)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.planners import mbd

    env_name = task
    demo = env_name.endswith("+demo")
    base_name = env_name[:-len("+demo")] if demo else env_name
    env = envs_mod.get_env(base_name)
    cfg = mbd.recommended_config(base_name)
    if demo:
        import dataclasses
        cfg = dataclasses.replace(cfg, enable_demo=True)

    rngs = jnp.stack([jax.random.PRNGKey(s) for s in range(n_seeds)])
    t0 = time.time()

    def progress(step, rew):
        print(f"# {env_name}: denoise {step}/{cfg.Ndiffuse} rew={rew:.3e}",
              file=sys.stderr, flush=True)

    # --engine applies to physics envs only (analytic envs have one engine)
    from mbd_tpu.envs.physics import PhysicsEnv
    eng = engine if (engine and isinstance(env, PhysicsEnv)) else None
    # --seed_chunk: split the seed batch into chunks of K seeds so the
    # flattened K·Nsample sample axis fits HBM (humanoidrun's recommended
    # Nsample=8192 × 8 seeds = 65536 flat samples does not). All chunks
    # share ONE compiled program (plan_batch programs are seed-independent
    # and keyed by (cfg, engine, S)), and per-seed results are unchanged —
    # each seed's RNG chain is its own.
    K = seed_chunk if seed_chunk > 0 else n_seeds
    if seed_chunk == 0 and isinstance(env, PhysicsEnv) \
            and env.sys.nbody >= 10:
        # measured HBM ceiling (round 5): every 16384-flat humanoid fused
        # program died on-chip, 8192-flat runs — the corrected PGS solver
        # carries [C, nv, B] live constraint stacks. Auto-chunk down.
        while cfg.Nsample * K > 8192 and K % 2 == 0:
            K //= 2
    if n_seeds % K != 0:
        raise SystemExit(
            f"--seed_chunk {K} does not divide n_seeds={n_seeds}: the "
            "ragged final chunk would have a different S and trigger a "
            "second full compile (hour-class for humanoid programs)")
    parts = [mbd.plan_batch(env, cfg, rngs[i:i + K], chunk_size=chunk_size,
                            progress_fn=progress, engine=eng)
             for i in range(0, n_seeds, K)]
    wall = time.time() - t0

    rewards = np.concatenate(
        [np.asarray(p.final_reward, np.float64) for p in parts])
    diverged = np.concatenate(
        [np.asarray(p.final_diverged).astype(bool) for p in parts])
    plans = np.concatenate(
        [np.asarray(p.Ybars[:, -1], np.float32) for p in parts])  # [S,H,nu]

    out = {
        "env": env_name, "n_seeds": n_seeds,
        "rewards": [float(r) for r in rewards],
        "diverged": [bool(d) for d in diverged],
        "wall_s": round(wall, 1),
        "backend": jax.default_backend(),
        "engine": eng or "default",
        "config": dict(Nsample=cfg.Nsample, Hsample=cfg.Hsample,
                       Ndiffuse=cfg.Ndiffuse, temp=cfg.temp_sample,
                       enable_demo=demo),
    }

    # demo-tracking log-density of the final plans (scored whether or not
    # demo conditioning was on — the with/without contrast is the
    # reference's flagship claim). Batch engines only: the vmap rollout's
    # different f32 contraction order can diverge on plans the batch
    # engines integrate fine.
    states_init = jax.vmap(env.reset)(
        jax.vmap(lambda r: jax.random.split(r)[1])(rngs))
    if hasattr(env, "traj_xref_logpd"):
        from types import SimpleNamespace

        from mbd_tpu.rollout.fused import rollout_rewards

        shim = SimpleNamespace(pipeline_state=SimpleNamespace(
            q=states_init.pipeline_state.q.T,
            qd=states_init.pipeline_state.qd.T))
        _, ps, _ = jax.jit(lambda y: rollout_rewards(
            env, shim, y, need_states=True))(jnp.asarray(plans))
        logpd = env.traj_xref_logpd(ps)
        out["xref_logpd"] = [float(x) for x in np.asarray(logpd)]
    elif hasattr(env, "eval_xref_logpd"):
        from mbd_tpu.rollout import rollout_us

        step = jax.jit(env.step)
        logpds = []
        for s in range(n_seeds):
            st = jax.tree.map(lambda x: x[s], states_init)
            _, states = rollout_us(step, st, jnp.asarray(plans[s]))
            logpds.append(float(env.eval_xref_logpd(states)))
        out["xref_logpd"] = logpds

    path = os.path.join(results_dir, env_name.replace("+", "_"))
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "seed_harness.npz"),
             plans=plans, rewards=rewards, diverged=diverged,
             config=json.dumps(out["config"]))
    print(json.dumps(out), flush=True)


def _aggregate(rec):
    import numpy as np

    rews = np.asarray(rec["rewards"], np.float64)
    div = np.asarray(rec["diverged"], bool)
    clean = rews[~div]
    row = {
        "rew_mean": float(np.mean(rews)),
        "rew_std": float(np.std(rews)),
        "n_seeds": len(rews),
        "n_diverged": int(div.sum()),
        "per_seed": {
            "rewards": [round(float(r), 4) for r in rews],
            "diverged": [bool(d) for d in div],
        },
        "wall_s_total": rec.get("wall_s"),
        "backend": rec.get("backend"),
        "engine": rec.get("engine"),
        "config": rec["config"],
    }
    if div.any():
        # a flagged seed's reward is NOT an earned number; the honest
        # aggregate excludes it (and says so)
        row["rew_mean_clean"] = float(np.mean(clean)) if clean.size else None
        row["rew_std_clean"] = float(np.std(clean)) if clean.size else None
    if "xref_logpd" in rec:
        lp = np.asarray(rec["xref_logpd"], np.float64)
        row["xref_logpd_mean"] = float(np.mean(lp))
        row["xref_logpd_std"] = float(np.std(lp))
        row["per_seed"]["xref_logpd"] = [round(float(x), 4) for x in lp]
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", nargs="+",
                   default=["cartpole", "hopper", "walker2d", "halfcheetah",
                            "ant", "pushT", "humanoidstandup",
                            "humanoidrun"])
    p.add_argument("--n_seeds", type=int, default=8)
    p.add_argument("--engine", default="")
    p.add_argument("--chunk_size", type=int, default=50)
    p.add_argument("--timeout", type=int, default=3600)
    p.add_argument("--out", default="docs/RESULTS.json")
    p.add_argument("--results_dir", default="results")
    p.add_argument("--worker", default=None, help="internal: run one task")
    p.add_argument("--platform", default="",
                   help="pin the jax backend (e.g. 'cpu' when the TPU "
                        "tunnel is down); empty = environment default")
    p.add_argument("--from_npz", nargs="+", default=None,
                   help="rebuild rows from results/<env>/seed_harness.npz "
                        "(recovers a killed sweep's completed tasks — each "
                        "worker persists its npz before the parent writes "
                        "the merged JSON)")
    p.add_argument("--seed_chunk", type=int, default=0,
                   help="run the seed batch in chunks of K seeds sharing "
                        "one compiled program (0 = all seeds in one batch)."
                        " For envs whose flattened seeds×Nsample axis "
                        "exceeds HBM (humanoidrun: 8×8192)")
    args = p.parse_args()

    if args.worker:
        worker(args.worker, args.engine, args.n_seeds, args.chunk_size,
               args.results_dir, args.platform, args.seed_chunk)
        return

    if args.from_npz:
        import numpy as np

        results = {}
        for env_name in args.from_npz:
            path = os.path.join(args.results_dir,
                                env_name.replace("+", "_"),
                                "seed_harness.npz")
            d = np.load(path)
            rec = {
                "env": env_name,
                "rewards": [float(r) for r in d["rewards"]],
                "diverged": [bool(b) for b in d["diverged"]],
                "config": json.loads(str(d["config"])),
            }
            results[env_name] = _aggregate(rec)
            print(f"{env_name}: {results[env_name]['rew_mean']:.3f} "
                  f"± {results[env_name]['rew_std']:.3f} (from npz)")
        if os.path.exists(args.out):
            with open(args.out) as f:
                merged = json.load(f)
            merged.update(results)
            results = merged
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")
        return

    from mbd_tpu.utils import launcher

    records = launcher.run_tasks(
        [sys.executable, os.path.abspath(__file__), "--worker", "{task}",
         "--engine", args.engine, "--n_seeds", str(args.n_seeds),
         "--chunk_size", str(args.chunk_size),
         "--results_dir", args.results_dir,
         "--platform", args.platform,
         "--seed_chunk", str(args.seed_chunk)],
        args.envs, timeout_sec=args.timeout, retries=1, jobs=1)

    results = {}
    failed_tasks = []
    for r in records:
        if r.get("failed"):
            failed_tasks.append(r["task"])
            continue
        rec = r["result"]
        row = _aggregate(rec)
        results[rec["env"]] = row
        flag = f" ({row['n_diverged']} DIVERGED)" if row["n_diverged"] \
            else ""
        print(f"{rec['env']}: {row['rew_mean']:.3f} ± {row['rew_std']:.3f}"
              f"{flag} [{rec['wall_s']}s]", flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    # merge into any existing table so partial sweeps don't clobber rows
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    # a failed run must never erase a previously earned row: annotate an
    # existing row instead of replacing it (round-5 lesson — a crashed
    # humanoidrun worker overwrote the prior measurement with
    # {"failed": true})
    for task in failed_tasks:
        prior = results.get(task)
        if isinstance(prior, dict) and "rew_mean" in prior:
            prior["last_attempt_failed"] = True
        else:
            results[task] = {"failed": True}
        print(f"{task}: FAILED (see stderr above for the worker trace)",
              flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
