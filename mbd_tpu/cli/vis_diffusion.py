"""Denoising-process visualizer.

Equivalent of the reference's mbd/scripts/vis_diffusion.py: loads the saved
stack of denoised control means (results/<env>/mu_0ts.npy), re-simulates a
subset of the iterates, and renders the final trajectory with the earlier
iterates as translucent ghosts in one standalone HTML page
(render_diffusion.html).

  python -m mbd_tpu.cli.vis_diffusion --env_name humanoidtrack
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env_name", default="humanoidtrack")
    p.add_argument("--results_dir", default="results")
    p.add_argument("--n_ghosts", type=int, default=6,
                   help="number of intermediate denoise iterates to overlay")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from .. import envs
    from ..rollout import rollout_states
    from ..viz import html as vhtml

    path = os.path.join(args.results_dir, args.env_name)
    mu_0ts = np.load(os.path.join(path, "mu_0ts.npy"))
    print(f"loaded mu_0ts {mu_0ts.shape}")

    env = envs.get_env(args.env_name)
    rng_reset = jax.random.split(jax.random.PRNGKey(args.seed))[1]
    state_init = env.reset(rng_reset)
    step = jax.jit(env.step)

    idx = np.linspace(0, mu_0ts.shape[0] - 1, args.n_ghosts + 1).astype(int)
    trajs = []
    for i in idx:
        states = rollout_states(step, state_init, mu_0ts[i])
        trajs.append((np.asarray(states.pipeline_state.x.pos),
                      np.asarray(states.pipeline_state.x.rot)))
        print(f"re-simulated iterate {i}", flush=True)

    final_pos, final_rot = trajs[-1]
    page = vhtml.render(env.sys, final_pos, final_rot, dt=env.dt,
                        ghost_trajs=trajs[:-1],
                        title=f"{args.env_name} denoising process")
    out = os.path.join(path, "render_diffusion.html")
    with open(out, "w") as f:
        f.write(page)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
