"""Produce the black-box-optimization result artifacts.

Mirrors the reference's experiment driver (mbd/blackbox/mbd_opt.py:83-107):
for each test function, 6 seeds of MBD population diffusion at dim=800,
saving evals-vs-J curves to ``results/bbo/<fn>-<dim>d_MBD.npy`` in the same
(n_seeds, 2, Ndiffuse-1) layout ([evals; J] per seed) plus a JSON summary.

  python tools/run_bbo.py                 # all three functions
  python tools/run_bbo.py --fns Rastrigin --n_seeds 2
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fns", nargs="+",
                   default=["Ackley", "Rastrigin", "Levy"])
    p.add_argument("--dim", type=int, default=800)
    p.add_argument("--n_seeds", type=int, default=6)
    p.add_argument("--out_dir", default="results/bbo")
    p.add_argument("--cpu", action="store_true",
                   help="pin to CPU (the workload is tiny; frees the TPU "
                        "for concurrent campaigns — this box's "
                        "sitecustomize ignores JAX_PLATFORMS)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mbd_tpu.blackbox import bbo

    os.makedirs(args.out_dir, exist_ok=True)
    summary = {}
    for fn_name in args.fns:
        cfg = bbo.BBOConfig(fn_name=fn_name, dim=args.dim)
        curves = []
        finals = []
        for seed in range(args.n_seeds):
            res = bbo.optimize(cfg, jax.random.PRNGKey(seed))
            curves.append(np.stack([np.asarray(res.evals),
                                    np.asarray(res.J_trace)]))
            finals.append(float(res.J_trace[-1]))
        arr = np.stack(curves)                     # [seeds, 2, Ndiffuse-1]
        path = os.path.join(args.out_dir, f"{fn_name}-{args.dim}d_MBD.npy")
        np.save(path, arr)
        summary[fn_name] = {
            "dim": args.dim, "n_seeds": args.n_seeds,
            "J_final_mean": float(np.mean(finals)),
            "J_final_std": float(np.std(finals)),
        }
        print(f"{fn_name}: J_final = {np.mean(finals):.3f} "
              f"± {np.std(finals):.3f} → {path}", flush=True)
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
