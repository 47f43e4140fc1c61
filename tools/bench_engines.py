"""Engine microbenchmark: time one rollout batch per engine/layout.

Measures the planner hot region (rollout of Nsample control sequences) for
an env across: fused engine with flat (N,) batch, fused with packed
(8, N/8) batch, and the Pallas VMEM-resident kernel at several block sizes.

  python tools/bench_engines.py --env humanoidrun --nsample 1024
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, warmup=1, reps=3):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="humanoidrun")
    p.add_argument("--nsample", type=int, default=1024)
    p.add_argument("--horizon", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mbd_tpu import envs
    from mbd_tpu.ops.rollout_pallas import rollout_rewards_pallas
    from mbd_tpu.rollout import fused

    env = envs.get_env(args.env)
    sys_ = env.sys
    N, H = args.nsample, args.horizon
    state0 = env.reset(jax.random.PRNGKey(0))
    Y0s = jax.random.uniform(jax.random.PRNGKey(1),
                             (N, H, env.action_size), minval=-1, maxval=1)
    n_steps = N * H
    print(f"{args.env}: N={N} H={H} n_frames={env.n_frames} "
          f"nq={sys_.nq} nv={sys_.nv} backend={jax.default_backend()}")

    U = jnp.transpose(Y0s, (1, 2, 0))
    q0f = jnp.broadcast_to(state0.pipeline_state.q[:, None], (sys_.nq, N))
    qd0f = jnp.broadcast_to(state0.pipeline_state.qd[:, None], (sys_.nv, N))

    def flat(U):
        qs, _, bad = fused.rollout_qs(sys_, env.n_frames, q0f, qd0f, U)
        return qs[:, 0].sum()

    dt, _ = timeit(jax.jit(flat), U)
    print(f"fused flat (N,):      {dt*1e3:8.1f} ms  "
          f"{n_steps/dt/1e6:6.2f} M env-steps/s")

    def packed(Y):
        rews, _, _ = fused.rollout_rewards(env, state0, Y)
        return rews.sum()

    dt, _ = timeit(jax.jit(packed), Y0s)
    print(f"fused packed (8,N/8): {dt*1e3:8.1f} ms  "
          f"{n_steps/dt/1e6:6.2f} M env-steps/s")

    for b_tile in (512, 1024, 2048):
        if b_tile > N:
            continue
        def pk(Y, b=b_tile):
            rews, _ = rollout_rewards_pallas(env, state0, Y, b_tile=b)
            return rews.sum()
        try:
            dt, _ = timeit(jax.jit(pk), Y0s)
            print(f"pallas b_tile={b_tile:5d}:  {dt*1e3:8.1f} ms  "
                  f"{n_steps/dt/1e6:6.2f} M env-steps/s")
        except Exception as e:   # noqa: BLE001
            print(f"pallas b_tile={b_tile}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
