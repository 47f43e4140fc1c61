"""A/B the RL rollout hot path: batch-last engine vs wrapped vmap(step).

Times `unroll_length`-step policy rollouts (the data-collection inner
loop of rl/ppo.py) for both paths on the current backend and prints one
JSON line. The policy is a freshly initialized PolicyNet so the measured
work matches training's rollout phase (physics + obs + sampling).

  python tools/bench_rl_rollout.py --env_name ant --num_envs 2048
  python tools/bench_rl_rollout.py --env_name ant --platform cpu \
      --num_envs 64 --repeats 3          # CPU smoke
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env_name", default="ant")
    p.add_argument("--num_envs", type=int, default=2048)
    p.add_argument("--unroll_length", type=int, default=20)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--episode_length", type=int, default=1000)
    p.add_argument("--platform", default="")
    args = p.parse_args()

    from mbd_tpu.utils.platform import force_platform

    force_platform(args.platform)
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_cache")))

    from mbd_tpu import envs
    from mbd_tpu.rl import networks
    from mbd_tpu.rl.batched_env import BatchedTrainEnv
    from mbd_tpu.rl.wrappers import wrap_for_training

    env = envs.get_env(args.env_name)
    B, T = args.num_envs, args.unroll_length
    policy = networks.PolicyNet(action_size=env.action_size)
    params = policy.init(jax.random.PRNGKey(0),
                         jnp.zeros((env.observation_size,)))

    def policy_act(obs, rng):
        mu, log_sig = policy.apply(params, obs)
        keys = jax.random.split(rng, obs.shape[0])
        act, _, _ = jax.vmap(networks.sample_action)(mu, log_sig, keys)
        return act

    def time_fn(fn, state):
        out = fn(state, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = fn(out[0] if isinstance(out, tuple) else out,
                     jax.random.PRNGKey(2))
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.repeats

    results = {"env": args.env_name, "num_envs": B, "unroll_length": T,
               "backend": jax.default_backend()}

    # ---- batch-last path ----
    bt = BatchedTrainEnv(env, args.episode_length)
    b_state = jax.jit(bt.reset, static_argnums=1)(jax.random.PRNGKey(0), B)
    first = b_state

    @jax.jit
    def unroll_batch_last(state, rng):
        def step(carry, _):
            state, rng = carry
            rng, k = jax.random.split(rng)
            act = policy_act(state.obs, k)
            state, rew, done, trunc = bt.step(state, first, act)
            return (state, rng), rew
        (state, _), rews = jax.lax.scan(step, (state, rng), None, T)
        return state, rews

    dt = time_fn(unroll_batch_last, b_state)
    results["batch_last_steps_per_s"] = round(B * T / dt)
    results["batch_last_s_per_unroll"] = round(dt, 4)

    # ---- wrapped vmap path ----
    wrapped = wrap_for_training(env, args.episode_length, 1)
    v_state = jax.jit(jax.vmap(wrapped.reset))(
        jax.random.split(jax.random.PRNGKey(0), B))

    @jax.jit
    def unroll_vmap(state, rng):
        def step(carry, _):
            state, rng = carry
            rng, k = jax.random.split(rng)
            act = policy_act(state.obs, k)
            state = jax.vmap(wrapped.step)(state, act)
            return (state, rng), state.reward
        (state, _), rews = jax.lax.scan(step, (state, rng), None, T)
        return state, rews

    dt = time_fn(unroll_vmap, v_state)
    results["vmap_steps_per_s"] = round(B * T / dt)
    results["vmap_s_per_unroll"] = round(dt, 4)
    results["speedup_batch_last_over_vmap"] = round(
        results["batch_last_steps_per_s"] / results["vmap_steps_per_s"], 2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
