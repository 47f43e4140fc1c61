"""Reward-plausibility anchor: run MBD with MuJoCo C as the rollout engine.

docs/RESULTS_CROSSSIM.json re-simulates our final open-loop plans through
MuJoCo and shows large gaps on the contact-rich envs. That alone cannot
distinguish "our engine inflates rewards via contact exploits" from "open-loop
trajectories through two different contact solvers diverge chaotically" (the
reference's brax-positional backend has the same property vs MuJoCo).

This tool closes the question from the other side: it runs the SAME reverse-
diffusion planner (exact semantics of mbd_tpu/planners/mbd.py::reverse_once,
which re-derives reference mbd/planners/mbd_planner.py:97-135) but with every
rollout — including the final scoring — executed by ``mujoco.rollout`` (the C
library). If MBD-on-MuJoCo reaches rewards of the same magnitude as
MBD-on-our-engine, the reward levels are physically earnable under an
independent simulator and the cross-sim gap is solver chaos, not exploit.

Single host CPU here, so Nsample is small (the planner degrades gracefully —
the reference's own BBO mode uses Nsample=64, mbd/blackbox/mbd_opt.py:22).

  python tools/mbd_on_mujoco.py --envs hopper walker2d --nsample 128
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

XMLS = {
    "cartpole": "cartpole.xml", "hopper": "hopper.xml",
    "walker2d": "walker2d.xml", "halfcheetah": "halfcheetah.xml",
    "ant": "ant.xml", "pushT": "pushT.xml",
    "humanoidstandup": "humanoidstandup.xml", "humanoidrun": "humanoidrun.xml",
}


class MuJoCoBatchEngine:
    """Batched open-loop rollout through mujoco.rollout; rewards scored with
    the env's own pure-q reward (identical formula to the TPU engines)."""

    def __init__(self, env, xml_path, q0, qd0):
        import jax
        import mujoco

        self.env = env
        self.m = mujoco.MjModel.from_xml_path(xml_path)
        self.d = mujoco.MjData(self.m)
        self.n_frames = env.n_frames
        nstate = mujoco.mj_stateSize(
            self.m, mujoco.mjtState.mjSTATE_FULLPHYSICS)
        self.d.qpos[:] = np.asarray(q0, np.float64)
        self.d.qvel[:] = np.asarray(qd0, np.float64)
        mujoco.mj_forward(self.m, self.d)
        self.state0 = np.empty(nstate)
        mujoco.mj_getState(self.m, self.d, self.state0,
                           mujoco.mjtState.mjSTATE_FULLPHYSICS)
        self.nq, self.nv = self.m.nq, self.m.nv
        self.q0, self.qd0 = np.asarray(q0), np.asarray(qd0)
        lo = self.m.actuator_ctrlrange[:, 0]
        hi = self.m.actuator_ctrlrange[:, 1]
        self.limited = self.m.actuator_ctrllimited.astype(bool)
        self.lo, self.hi = lo, hi

        def _rew(qs, qds, us):  # batch-last [H, nq, N] like reward_qs_b
            return env.reward_qs_b(
                qs, qds, us,
                np.repeat(self.q0[:, None], qs.shape[-1], -1),
                np.repeat(self.qd0[:, None], qs.shape[-1], -1))

        self._rew = jax.jit(_rew, backend="cpu")
        self.substeps = 0

    def eval_batch(self, Y0s):
        """Y0s [N, H, nu] → (mean reward [N], ok [N])."""
        from mujoco import rollout

        N, H, nu = Y0s.shape
        ctrl = np.where(self.limited,
                        np.clip(Y0s, self.lo, self.hi), Y0s)
        ctrl = np.repeat(ctrl, self.n_frames, axis=1)   # [N, H*n_frames, nu]
        init = np.repeat(self.state0[None], N, axis=0)
        state, _ = rollout.rollout(self.m, self.d, init,
                                   ctrl.astype(np.float64),
                                   skip_checks=False)
        self.substeps += N * H * self.n_frames
        # FULLPHYSICS layout: [time(1), qpos(nq), qvel(nv), act]
        sub = state[:, self.n_frames - 1::self.n_frames, :]   # [N, H, nstate]
        qs = sub[:, :, 1:1 + self.nq]
        qds = sub[:, :, 1 + self.nq:1 + self.nq + self.nv]
        ok = (np.isfinite(sub).all(axis=(1, 2))
              & (np.abs(qs).max(axis=(1, 2)) < 1e3))
        qs_bl = np.transpose(qs, (1, 2, 0)).astype(np.float32)
        qds_bl = np.transpose(qds, (1, 2, 0)).astype(np.float32)
        us_bl = np.transpose(Y0s, (1, 2, 0)).astype(np.float32)
        rews = np.asarray(self._rew(np.nan_to_num(qs_bl),
                                    np.nan_to_num(qds_bl), us_bl))
        return rews.mean(axis=0), ok & np.isfinite(rews).all(axis=0)


def run_env(env_name, nsample, ndiffuse, seed):
    """Full MBD denoise with the MuJoCo engine; reverse-step math mirrors
    mbd_tpu/planners/mbd.py:166-211 (itself reference mbd_planner.py:97-135),
    with the same divergence demotion and std guard."""
    import jax

    from mbd_tpu import envs as envs_mod
    from mbd_tpu.envs.physics import asset_path
    from mbd_tpu.planners import mbd

    env = envs_mod.get_env(env_name)
    cfg = mbd.recommended_config(env_name)
    H, nu = cfg.Hsample, env.action_size
    Nd = ndiffuse or cfg.Ndiffuse
    temp = cfg.temp_sample

    rng = jax.random.PRNGKey(seed)
    _, rng_reset = jax.random.split(rng)
    state_init = env.reset(rng_reset)
    q0 = np.asarray(state_init.pipeline_state.q)
    qd0 = np.asarray(state_init.pipeline_state.qd)

    eng = MuJoCoBatchEngine(env, asset_path(XMLS[env_name]), q0, qd0)

    betas = np.linspace(cfg.beta0, cfg.betaT, Nd)
    alphas = 1.0 - betas
    alphas_bar = np.cumprod(alphas)
    sigmas = np.sqrt(1.0 - alphas_bar)

    rg = np.random.default_rng(seed)
    Ybar = np.zeros((H, nu))
    t0 = time.time()
    for i in range(Nd - 1, 0, -1):
        Y0s = np.clip(Ybar + sigmas[i] * rg.standard_normal((nsample, H, nu)),
                      -1.0, 1.0)
        rews, ok = eng.eval_batch(Y0s)
        worst = rews[ok].min() if ok.any() else 0.0
        rews = np.where(ok, rews, worst)
        std = rews.std()
        std = 1.0 if std < 1e-4 else std
        logp0 = (rews - rews.mean()) / std / temp
        w = np.exp(logp0 - logp0.max())
        w /= w.sum()
        Ybar_w = np.einsum("n,nij->ij", w, Y0s)
        abar = alphas_bar[i]
        Yi = Ybar * np.sqrt(abar)
        score = (-Yi + np.sqrt(abar) * Ybar_w) / (1.0 - abar)
        Yim1 = (Yi + (1.0 - abar) * score) / np.sqrt(alphas[i])
        Ybar = Yim1 / np.sqrt(alphas_bar[i - 1])
    final_rew, final_ok = eng.eval_batch(Ybar[None])
    wall = time.time() - t0
    return {
        "env": env_name, "seed": seed,
        "reward_mbd_on_mujoco": float(final_rew[0]),
        "final_ok": bool(final_ok[0]),
        "Nsample": nsample, "Ndiffuse": Nd, "Hsample": H,
        "temp": temp, "wall_s": round(wall, 1),
        "mj_substeps": eng.substeps,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", nargs="+", default=["hopper"])
    p.add_argument("--nsample", type=int, default=128)
    p.add_argument("--ndiffuse", type=int, default=0,
                   help="0 = env-recommended")
    p.add_argument("--seeds", type=int, nargs="+", default=[0],
                   help="multi-seed: mean ± std recorded per env")
    p.add_argument("--out", default="docs/RESULTS_MBD_ON_MUJOCO.json")
    p.add_argument("--key_suffix", default="",
                   help="record rows under <env><suffix> (e.g. '_N512') "
                        "so budget sweeps don't overwrite the base row")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")   # reward eval only; leave TPU

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    for name in args.envs:
        runs = []
        for seed in args.seeds:
            try:
                res = run_env(name, args.nsample, args.ndiffuse, seed)
            except Exception as e:  # keep going; record the failure loudly
                res = {"env": name, "seed": seed, "failed": True,
                       "error": f"{type(e).__name__}: {e}"}
            print(json.dumps(res), flush=True)
            runs.append(res)
            # persist after EVERY seed: a killed/timed-out sweep keeps its
            # completed seeds (a humanoidrun seed at N=2048 is ~2 h here)
            ok = [r for r in runs if not r.get("failed")]
            row = {"runs": list(runs), "n_seeds": len(runs)}
            if ok:
                rews = [r["reward_mbd_on_mujoco"] for r in ok]
                row["reward_mean"] = float(np.mean(rews))
                row["reward_std"] = float(np.std(rews))
            results[name + args.key_suffix] = row
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
