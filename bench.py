"""Benchmark driver: one JSON line with the headline metric.

Headline workload (BASELINE.md north star): the humanoidrun MBD denoise —
Nsample × Hsample × n_frames physics substeps per diffusion step on the
batch-last fused engine — measured as env-steps/sec/chip inside the denoise
loop. vs_baseline = (10 s target / measured full-denoise wall time) at the
north-star config (Ndiffuse=300, Nsample=1024, horizon 50); >1 beats the
driver-set target. Falls back to the analytic car2d denoise if the physics
path is unavailable.

Prints: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _bench(env_name: str, cfg_kwargs: dict, engine, target_s, chunk: int):
    from mbd_tpu import envs
    from mbd_tpu.core.schedule import make_schedule
    from mbd_tpu.planners import mbd

    env = envs.get_env(env_name)
    cfg = mbd.MBDConfig(**cfg_kwargs)

    rng = jax.random.PRNGKey(0)
    rng, rng_reset = jax.random.split(rng)
    state_init = env.reset(rng_reset)
    sched = make_schedule(cfg.Ndiffuse, cfg.beta0, cfg.betaT)
    reverse_once = mbd.make_reverse_once(
        env, cfg, state_init, sched,
        engine=engine or mbd.default_engine(env))

    chunk_fn = jax.jit(lambda c, s: jax.lax.scan(reverse_once, c, s))
    steps = jnp.arange(cfg.Ndiffuse - 1, 0, -1)
    n = steps.shape[0]
    pad = (-n) % chunk
    steps = jnp.concatenate([steps, jnp.ones(pad, steps.dtype)])

    def full_denoise():
        carry = (jax.random.PRNGKey(1),
                 jnp.zeros((cfg.Hsample, env.action_size)))
        rews = None
        for c in range(0, n + pad, chunk):
            carry, (_, rews) = chunk_fn(carry, steps[c:c + chunk])
        jax.block_until_ready(carry)
        return rews

    full_denoise()                      # compile
    t0 = time.perf_counter()
    full_denoise()                      # timed
    dt = time.perf_counter() - t0

    n_env_steps = n * cfg.Nsample * cfg.Hsample
    vs = (target_s / dt) if target_s else 0.0
    return {
        "metric": f"{env_name} MBD denoise env-steps/sec/chip "
                  f"({engine or 'default'} engine; Nsample={cfg.Nsample}, "
                  f"H={cfg.Hsample}, "
                  f"Ndiffuse={cfg.Ndiffuse}; full denoise wall={dt:.2f}s)",
        "value": round(n_env_steps / dt),
        "unit": "env-steps/sec",
        "vs_baseline": round(vs, 3),
    }


def main():
    try:
        result = _bench(
            "humanoidrun",
            dict(Nsample=1024, Hsample=50, Ndiffuse=300, temp_sample=0.1),
            engine="pallas", target_s=10.0, chunk=50)
    except Exception:
        result = _bench(
            "car2d",
            dict(Nsample=2048, Hsample=50, Ndiffuse=100, temp_sample=0.1,
                 enable_demo=True),
            engine="vmap", target_s=None, chunk=99)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
