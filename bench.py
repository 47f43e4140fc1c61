"""Benchmark driver: one JSON line with the headline metric.

Headline workload (BASELINE.md north star): the humanoidrun MBD denoise —
Nsample x Hsample x n_frames physics substeps per diffusion step — measured
as env-steps/sec/chip inside the denoise loop, with wall-time for the full
denoise. Falls back to the analytic car2d denoise while the physics engine
envs are not yet available.

Prints: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is (10 s target / measured full-denoise wall time) for
humanoidrun (>1 beats the driver-set target), or 0.0 for the fallback.
"""

import json
import time

import jax
import jax.numpy as jnp


def _bench_env(env_name: str, cfg_kwargs: dict, target_s: float | None):
    from mbd_tpu import envs
    from mbd_tpu.planners import mbd

    env = envs.get_env(env_name)
    cfg = mbd.MBDConfig(**cfg_kwargs)

    rng = jax.random.PRNGKey(0)
    rng, rng_reset = jax.random.split(rng)
    state_init = env.reset(rng_reset)

    from mbd_tpu.core.schedule import make_schedule
    sched = make_schedule(cfg.Ndiffuse, cfg.beta0, cfg.betaT)
    reverse_once = mbd.make_reverse_once(env, cfg, state_init, sched)

    def reverse(rng):
        YN = jnp.zeros((cfg.Hsample, env.action_size))
        steps = jnp.arange(cfg.Ndiffuse - 1, 0, -1)
        (_, _), (Ybars, rews) = jax.lax.scan(reverse_once, (rng, YN), steps)
        return Ybars, rews

    reverse = jax.jit(reverse)
    # compile
    out = reverse(rng)
    jax.block_until_ready(out)
    # timed run
    t0 = time.perf_counter()
    out = reverse(rng)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    n_steps = (cfg.Ndiffuse - 1) * cfg.Nsample * cfg.Hsample
    steps_per_sec = n_steps / dt
    vs = (target_s / dt) if target_s else 0.0
    return {
        "metric": f"{env_name} MBD denoise env-steps/sec/chip "
                  f"(Nsample={cfg.Nsample}, H={cfg.Hsample}, "
                  f"Ndiffuse={cfg.Ndiffuse}; wall={dt:.2f}s)",
        "value": round(steps_per_sec),
        "unit": "env-steps/sec",
        "vs_baseline": round(vs, 3),
    }


def main():
    try:
        result = _bench_env(
            "humanoidrun",
            dict(Nsample=8192, Hsample=50, Ndiffuse=300, temp_sample=0.1),
            target_s=10.0)
    except Exception:
        result = _bench_env(
            "car2d",
            dict(Nsample=2048, Hsample=50, Ndiffuse=100, temp_sample=0.1,
                 enable_demo=True),
            target_s=None)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
