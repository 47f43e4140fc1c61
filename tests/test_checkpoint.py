"""Planner checkpoint/resume: interrupted denoise continues identically."""

import os

import jax
import numpy as np

from mbd_tpu import envs
from mbd_tpu.planners import mbd


def test_mbd_checkpoint_resume(tmp_path):
    env = envs.get_env("car2d")
    cfg = mbd.MBDConfig(Nsample=64, Hsample=10, Ndiffuse=12)
    ck = str(tmp_path / "denoise.npz")

    # uninterrupted reference run
    ref = mbd.plan(env, cfg, jax.random.PRNGKey(0), chunk_size=4)

    # run only the first chunk, "crash", then resume
    calls = {"n": 0}

    def bomb(step, rew):
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt

    try:
        mbd.plan(env, cfg, jax.random.PRNGKey(0), chunk_size=4,
                 checkpoint_path=ck, progress_fn=bomb)
    except KeyboardInterrupt:
        pass
    assert os.path.exists(ck)

    resumed = mbd.plan(env, cfg, jax.random.PRNGKey(0), chunk_size=4,
                       checkpoint_path=ck)
    np.testing.assert_allclose(np.asarray(resumed.Ybars),
                               np.asarray(ref.Ybars), atol=1e-6)
    np.testing.assert_allclose(np.asarray(resumed.rews_trace),
                               np.asarray(ref.rews_trace), atol=1e-6)
