"""--engine CLI plumbing: physics envs honor the pin, analytic envs keep
their single engine (guard added with the round-4 measurement sweeps)."""

import jax

from mbd_tpu import envs
from mbd_tpu.cli.run_mbd import _engine_for, build_parser


def test_engine_for_physics_env():
    args = build_parser().parse_args(["--engine", "fused"])
    assert _engine_for(envs.get_env("hopper"), args) == "fused"


def test_engine_for_analytic_env_ignores_pin():
    args = build_parser().parse_args(["--engine", "fused"])
    assert _engine_for(envs.get_env("car2d"), args) is None


def test_engine_default_is_none():
    args = build_parser().parse_args([])
    assert _engine_for(envs.get_env("hopper"), args) is None


def test_plan_batch_fused_pin_runs():
    import jax.numpy as jnp

    from mbd_tpu.planners import mbd

    env = envs.get_env("hopper")
    cfg = mbd.MBDConfig(Nsample=32, Hsample=5, Ndiffuse=4)
    rngs = jnp.stack([jax.random.PRNGKey(s) for s in range(2)])
    res = mbd.plan_batch(env, cfg, rngs, engine="fused")
    assert res.final_reward.shape == (2,)
