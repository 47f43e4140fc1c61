"""Probe: does the Pallas whole-rollout kernel lower (Mosaic) and run on
the real TPU for each physics env?  Round-3 regression: the PGS sweep's
dynamic_slice broke Mosaic lowering (BENCH_r03.json) invisibly to the CPU
test suite (interpret mode).  This probe compiles + runs one small-batch
step per env ON THE CHIP and reports wall times.

Usage:  python tools/probe_pallas_lowering.py [env ...]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from mbd_tpu.envs import get_env                      # noqa: E402
from mbd_tpu.ops.rollout_pallas import rollout_rewards_pallas  # noqa: E402

ENVS = sys.argv[1:] or [
    "hopper", "walker2d", "halfcheetah", "ant", "cartpole",
    "pushT", "humanoidrun", "humanoidstandup", "humanoidtrack",
]

print("backend:", jax.default_backend(), jax.devices())
ok = True
for name in ENVS:
    t0 = time.time()
    try:
        env = get_env(name)
        state0 = env.reset(jax.random.PRNGKey(0))
        H = 8
        N = 1024
        Y = 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), (N, H, env.action_size))
        fn = jax.jit(lambda s, y: rollout_rewards_pallas(env, s, y))
        t1 = time.time()
        rews, bad = jax.block_until_ready(fn(state0, Y))[:2]
        t2 = time.time()
        print(f"{name:18s} OK   compile+run {t2 - t0:6.1f}s "
              f"(setup {t1 - t0:4.1f}s)  rew0 {float(rews.mean()):+.4f} "
              f"bad {float(bad.mean()):.3f}")
    except Exception as e:  # noqa: BLE001
        ok = False
        msg = str(e).split("\n")[0][:160]
        print(f"{name:18s} FAIL after {time.time() - t0:6.1f}s: "
              f"{type(e).__name__}: {msg}")
print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
