"""RL baseline training CLI (reference: mbd/rl/train_brax.py).

  python -m mbd_tpu.rl.train --env_name ant
  python -m mbd_tpu.rl.train --env_name hopper        # SAC
  python -m mbd_tpu.rl.train --env_name ant --scale 0.01   # smoke-scale

Per-env hyperparameters match the reference's table (train_brax.py:31-176).
``--scale`` multiplies num_timesteps (and floors num_evals at 1) so the same
pipeline smoke-tests in minutes on small budgets. After training: saves
params to results/<env>/params.msgpack, evaluates over 8 reset seeds × 50
steps (40 for pushT) like the reference (train_brax.py:206-225), and renders
a policy rollout to results/<env>/RL.html.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from . import ppo, sac

# reference hyperparameters, train_brax.py:31-176.
#
# Deliberately excluded: the reference's "pusher" PPO config
# (train_brax.py:104-121) is dead code there — its own get_env()
# (mbd/envs/__init__.py:13-33) has no "pusher" branch and raises
# ValueError, so the config can never run. We reproduce only the
# reachable table.
PPO_CONFIGS = {
    "ant": dict(num_timesteps=100_000_000, num_evals=10, reward_scaling=10,
                episode_length=1000, normalize_observations=True,
                action_repeat=1, unroll_length=5, num_minibatches=32,
                num_updates_per_batch=4, discounting=0.97,
                learning_rate=3e-4, entropy_cost=1e-2, num_envs=4096,
                batch_size=2048, seed=0),
    "walker2d": dict(num_timesteps=50_000_000, num_evals=20,
                     reward_scaling=1, episode_length=1000,
                     normalize_observations=True, action_repeat=1,
                     unroll_length=20, num_minibatches=32,
                     num_updates_per_batch=8, discounting=0.95,
                     learning_rate=3e-4, entropy_cost=0.001, num_envs=2048,
                     batch_size=512, seed=3),
    "halfcheetah": dict(num_timesteps=50_000_000, num_evals=20,
                        reward_scaling=1, episode_length=1000,
                        normalize_observations=True, action_repeat=1,
                        unroll_length=20, num_minibatches=32,
                        num_updates_per_batch=8, discounting=0.95,
                        learning_rate=3e-4, entropy_cost=0.001,
                        num_envs=2048, batch_size=512, seed=3),
    "pushT": dict(num_timesteps=100_000_000, num_evals=10,
                  reward_scaling=1.0, episode_length=100,
                  normalize_observations=True, action_repeat=1,
                  unroll_length=20, num_minibatches=16,
                  num_updates_per_batch=8, discounting=0.99,
                  learning_rate=3e-4, entropy_cost=1e-2, num_envs=2048,
                  batch_size=1024, seed=2),
    "humanoidrun": dict(num_timesteps=100_000_000, num_evals=10,
                        reward_scaling=0.1, episode_length=100,
                        normalize_observations=True, action_repeat=1,
                        unroll_length=10, num_minibatches=32,
                        num_updates_per_batch=8, discounting=0.97,
                        learning_rate=3e-4, entropy_cost=1e-3,
                        num_envs=2048, batch_size=1024, seed=1),
    "humanoidstandup": dict(num_timesteps=100_000_000, num_evals=20,
                            reward_scaling=0.1, episode_length=1000,
                            normalize_observations=True, action_repeat=1,
                            unroll_length=15, num_minibatches=32,
                            num_updates_per_batch=8, discounting=0.97,
                            learning_rate=6e-4, entropy_cost=1e-2,
                            num_envs=2048, batch_size=1024, seed=1),
}

SAC_CONFIGS = {
    "hopper": dict(num_timesteps=6_553_600, num_evals=20,
                   reward_scaling=30, episode_length=1000,
                   normalize_observations=True, action_repeat=1,
                   discounting=0.997, learning_rate=6e-4, num_envs=128,
                   batch_size=512, grad_updates_per_step=64,
                   max_replay_size=1_048_576, min_replay_size=8192, seed=1),
}


def save_params(path: str, params) -> None:
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env_name", default="ant")
    p.add_argument("--scale", type=float, default=1.0,
                   help="multiply num_timesteps (for smoke runs)")
    p.add_argument("--num_evals", type=int, default=0,
                   help="override eval count (0 = scale the reference's); "
                        "scaled runs want this to keep a multi-point curve")
    p.add_argument("--results_dir", default="results")
    p.add_argument("--not_render", action="store_true")
    p.add_argument("--out", default="docs/RESULTS_RL.json",
                   help="persist learning curve + eval here ('' = skip)")
    p.add_argument("--eval_only", action="store_true",
                   help="skip training: run a minimal iteration to build "
                        "the params template, load the saved "
                        "params.msgpack over it, re-run the eval (+render)"
                        " and update only the eval fields in --out")
    args = p.parse_args(argv)

    import jax

    from .. import envs
    from ..utils.platform import enable_persistent_cache

    enable_persistent_cache()
    env = envs.get_env(args.env_name)

    if args.env_name in SAC_CONFIGS:
        hp = dict(SAC_CONFIGS[args.env_name])
        hp["num_timesteps"] = max(int(hp["num_timesteps"] * args.scale),
                                  hp["min_replay_size"] * 2)
        hp["num_evals"] = args.num_evals or max(
            1, int(hp["num_evals"] * args.scale))
        cfg = sac.SACConfig(**hp)
        trainer = sac.train
    elif args.env_name in PPO_CONFIGS:
        hp = dict(PPO_CONFIGS[args.env_name])
        hp["num_timesteps"] = int(hp["num_timesteps"] * args.scale)
        hp["num_evals"] = args.num_evals or max(
            1, int(hp["num_evals"] * args.scale))
        cfg = ppo.PPOConfig(**hp)
        trainer = ppo.train
    else:
        raise ValueError(f"no RL config for env {args.env_name}")

    def progress(num_steps, metrics):
        print(f"step: {num_steps}, episode return: "
              f"{metrics['eval/episode_reward']:.2f}", flush=True)

    if args.eval_only:
        # one minimal training iteration yields the params TEMPLATE and
        # make_inference_fn without paying for a real run
        import dataclasses
        if args.env_name in SAC_CONFIGS:
            cfg = dataclasses.replace(
                cfg, num_timesteps=hp["min_replay_size"] * 2, num_evals=1)
        else:
            cfg = dataclasses.replace(cfg, num_timesteps=1, num_evals=1)
        progress = None

    import time

    t0 = time.time()
    make_inference_fn, params, history = trainer(env, cfg, progress)
    train_wall_s = round(time.time() - t0, 1)

    path = os.path.join(args.results_dir, args.env_name)
    os.makedirs(path, exist_ok=True)
    if args.eval_only:
        params = load_params(os.path.join(path, "params.msgpack"), params)
    else:
        save_params(os.path.join(path, "params.msgpack"), params)

    # post-train eval: 8 seeds × 50 steps (40 for pushT), reference
    # train_brax.py:206-225. The guard keeps an engine blow-up under an
    # aggressive trained gait from turning the whole eval into NaNs
    # (diverged steps roll back with the divergence penalty — wrappers.py).
    from .wrappers import DivergenceGuardWrapper

    eval_env = DivergenceGuardWrapper(env)
    inference = jax.jit(make_inference_fn(params))
    step = jax.jit(eval_env.step)
    n_steps = 40 if args.env_name == "pushT" else 50
    rews = []
    for seed in range(8):
        state = eval_env.reset(jax.random.PRNGKey(seed))
        ep = []
        for _ in range(n_steps):
            state = step(state, inference(state.obs))
            ep.append(float(state.reward))
        rews.append(np.mean(ep))
    print(f"eval (8 seeds x {n_steps} steps): "
          f"{np.mean(rews):.3f} ± {np.std(rews):.3f}")

    if args.out:
        import json

        record = {
            "algo": "sac" if args.env_name in SAC_CONFIGS else "ppo",
            "scale": args.scale,
            "num_timesteps": hp["num_timesteps"],
            "learning_curve": [
                {"num_steps": h["num_steps"],
                 "eval_reward": h["eval/episode_reward"]} for h in history],
            "eval_mean": float(np.mean(rews)),
            "eval_std": float(np.std(rews)),
            "eval_protocol": f"8 seeds x {n_steps} steps, mean step reward",
            "backend": jax.default_backend(),
            "train_wall_s": train_wall_s,
            # rollout engine: PPO physics envs train batch-last through
            # the lane-packed engine (rl/batched_env.py); eval always
            # runs the vmap oracle path
            "rollout": ("batch_last"
                        if (args.env_name in PPO_CONFIGS
                            and hasattr(env, "obs_qs_b")) else "vmap"),
        }
        table = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                table = json.load(f)
        if args.eval_only and args.env_name in table:
            # keep the real run's curve/budget; refresh only the eval
            record = dict(table[args.env_name])
            record.update(eval_mean=float(np.mean(rews)),
                          eval_std=float(np.std(rews)),
                          eval_protocol=f"8 seeds x {n_steps} steps, "
                                        "mean step reward")
        table[args.env_name] = record
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2)
        print(f"wrote {args.out}")

    if not args.not_render and args.env_name != "car2d":
        from ..rollout import rollout_states
        from ..viz import html as vhtml

        state = eval_env.reset(jax.random.PRNGKey(0))
        us = []
        s = state
        for _ in range(n_steps):
            u = inference(s.obs)
            us.append(np.asarray(u))
            s = step(s, u)
        import jax.numpy as jnp
        states = rollout_states(step, state, jnp.asarray(np.stack(us)))
        page = vhtml.render_states(env.sys, states.pipeline_state, dt=env.dt,
                                   title=f"{args.env_name} RL policy")
        with open(os.path.join(path, "RL.html"), "w") as f:
            f.write(page)
    return history


if __name__ == "__main__":
    main()
