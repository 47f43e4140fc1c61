"""Probe: Pallas whole-rollout kernel at PRODUCTION shapes on the chip.

The small-shape lowering probe (probe_pallas_lowering.py, H=8 N=1024)
passes for all envs yet humanoidstandup's production program (H=50,
Nsample=2048) hit Mosaic's scoped-VMEM cap (18.87M > 16M) because its
FK-based reward deepens the kernel stack frame. This probe compiles and
times each env's kernel at its recommended_config shape — the exact
program the planner runs — and (optionally) sweeps b_tile.

Usage:  python tools/probe_vmem.py [env[:b_tile[:variant]] ...]
        python tools/probe_vmem.py humanoidrun:1024 humanoidrun:2048:unrolled
"""
import contextlib
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from mbd_tpu.envs import get_env                      # noqa: E402
from mbd_tpu.ops.rollout_pallas import rollout_rewards_pallas  # noqa: E402
from mbd_tpu.planners import mbd                      # noqa: E402
from mbd_tpu.sim import batched as BT                 # noqa: E402

SPECS = sys.argv[1:] or [
    "hopper", "walker2d", "halfcheetah", "ant", "cartpole",
    "pushT", "humanoidrun", "humanoidstandup", "humanoidtrack",
]

print("backend:", jax.default_backend(), jax.devices())
ok = True
for spec in SPECS:
    parts = spec.split(":")
    name, bt = parts[0], parts[1] if len(parts) > 1 else ""
    variant = parts[2] if len(parts) > 2 else ""
    t0 = time.time()
    try:
        env = get_env(name)
        cfg = mbd.recommended_config(name)
        b_tile = int(bt) if bt else min(2048, cfg.Nsample)  # planner default
        state0 = env.reset(jax.random.PRNGKey(0))
        H, N = cfg.Hsample, cfg.Nsample
        Y = 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), (N, H, env.action_size))
        ctx = (BT.precompute_variant(variant) if variant
               else contextlib.nullcontext())
        with ctx:
            fn = jax.jit(lambda s, y: rollout_rewards_pallas(
                env, s, y, b_tile=b_tile))
            rews, bad = jax.block_until_ready(fn(state0, Y))[:2]
        t1 = time.time()
        iters = 10
        t2 = time.time()
        for _ in range(iters):
            rews, bad = fn(state0, Y)[:2]
        jax.block_until_ready(rews)
        dt = (time.time() - t2) / iters
        steps = H * N / dt
        print(f"{spec:24s} OK  compile+first {t1 - t0:6.1f}s  "
              f"{dt * 1e3:7.2f} ms/iter  {steps / 1e6:6.2f}M env-steps/s  "
              f"rew0 {float(rews.mean()):+.4f}", flush=True)
    except Exception as e:  # noqa: BLE001
        ok = False
        msg = str(e).split("\n")[0][:200]
        print(f"{spec:24s} FAIL after {time.time() - t0:6.1f}s: "
              f"{type(e).__name__}: {msg}", flush=True)
print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
