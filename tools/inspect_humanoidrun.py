"""Physical plausibility inspection of the humanoidrun flagship result.

The recorded humanoidrun reward (docs/RESULTS.json: 23.5 mean) implies a mean
torso-x displacement of ~24 m over the 2.1 s horizon — far beyond human
sprinting. This tool rolls the recommended-config plan through our engine and
reports the kinematics that decide whether that reward is earned locomotion
or a contact-model artifact:

  * torso x(t), z(t), forward speed per env step
  * deepest foot/ground penetration over the rollout (penalty contacts allow
    finite penetration; centimeters is physical, meters is an exploit)
  * airborne fraction (both feet off the ground — ballistic flight is honest)

Writes docs/HUMANOIDRUN_PLAUSIBILITY.json and prints a summary.

  python tools/inspect_humanoidrun.py --seed 0 [--nsample 8192]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nsample", type=int, default=0, help="0 = recommended")
    p.add_argument("--out", default="docs/HUMANOIDRUN_PLAUSIBILITY.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_cache")))

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.planners import mbd
    from mbd_tpu.rollout.fused import rollout_rewards

    env = envs_mod.get_env("humanoidrun")
    cfg = mbd.recommended_config("humanoidrun")
    if args.nsample:
        import dataclasses
        cfg = dataclasses.replace(cfg, Nsample=args.nsample)

    rng = jax.random.PRNGKey(args.seed)
    _, rng_reset = jax.random.split(rng)
    state_init = env.reset(rng_reset)

    res = mbd.plan(env, cfg, jax.random.PRNGKey(args.seed), chunk_size=50)
    us = res.Ybars[-1]

    rews, ps, bad = jax.jit(lambda s, y: rollout_rewards(
        env, s, y, need_states=True))(state_init, us[None])
    rews = np.asarray(rews)[0]                       # [H]
    pos = np.asarray(ps.x.pos)[:, 0]                 # [H, nbody, 3]

    sys_ = env.sys
    names = list(sys_.link_names)
    torso = names.index("torso") if "torso" in names else 0
    feet = [i for i, n in enumerate(names) if "foot" in n or "shin" in n]

    x = pos[:, torso, 0]
    z = pos[:, torso, 2]
    dt = env.dt
    speed = np.diff(np.concatenate([[float(
        state_init.pipeline_state.x.pos[torso, 0])], x])) / dt

    # deepest ground penetration of any foot-geom sphere/capsule: approximate
    # by body z minus its geom radius for the foot bodies
    foot_z = pos[:, feet, 2] if feet else pos[:, :, 2]
    out = {
        "seed": args.seed,
        "final_reward": float(res.final_reward),
        "config": dict(Nsample=cfg.Nsample, Ndiffuse=cfg.Ndiffuse),
        "torso_x_final_m": float(x[-1]),
        "horizon_s": float(dt * len(x)),
        "mean_speed_m_s": float((x[-1] - x[0]) / (dt * len(x))),
        "peak_speed_m_s": float(speed.max()),
        "torso_z_min": float(z.min()),
        "torso_z_max": float(z.max()),
        "min_foot_body_z": float(foot_z.min()),
        "diverged": bool(np.asarray(bad)[0]),
        "reward_per_step_first5": [float(r) for r in rews[:5]],
        "reward_per_step_last5": [float(r) for r in rews[-5:]],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
