"""The planner's jitted programs must be seed-independent and cached.

Round-3 perf work: reset states ride into the jitted denoise as OPERANDS
(planners/mbd.py::plan builds reverse_once inside the traced chunk), so
every same-shape seed shares one compiled program, and repeat same-config
plan() calls reuse the jitted callable outright (_REVERSE_JIT_CACHE).
Regression risk: someone re-closing the state into the trace silently
reintroduces a full XLA compile per seed — invisible to correctness tests,
ruinous for seed harnesses and MPC-style replanning.
"""
import jax
import numpy as np

from mbd_tpu import envs
from mbd_tpu.planners import mbd


def test_same_config_seeds_share_one_jitted_program():
    env = envs.get_env("car2d")
    cfg = mbd.MBDConfig(Nsample=32, Hsample=10, Ndiffuse=8)
    before = set(mbd._REVERSE_JIT_CACHE.get(env, {}))
    r0 = mbd.plan(env, cfg, jax.random.PRNGKey(0))
    r1 = mbd.plan(env, cfg, jax.random.PRNGKey(1))

    sub = mbd._REVERSE_JIT_CACHE[env]
    new_keys = set(sub) - before
    assert len(new_keys) == 1, f"expected 1 cached program, got {new_keys}"
    chunk_jit = sub[new_keys.pop()]
    # one trace signature serves both seeds: the state is an operand, not a
    # baked constant (a re-closed state would add a second jaxpr entry)
    assert chunk_jit._cache_size() == 1

    # and the seeds still produce genuinely different plans (distinct
    # experiment RNG streams; car2d's reset itself is deterministic)
    assert np.isfinite(float(r0.final_reward))
    assert not np.allclose(np.asarray(r0.Ybars), np.asarray(r1.Ybars))


def test_pallas_failure_falls_back_to_fused(monkeypatch):
    """A Mosaic lowering failure must demote pallas→fused LOUDLY, not kill
    the harness (the kernel traces the whole physics substep; Mosaic is
    only exercised on real TPU, so a regression there first surfaces
    mid-sweep)."""
    import pytest

    env = envs.get_env("hopper")
    cfg = mbd.MBDConfig(Nsample=16, Hsample=8, Ndiffuse=6)
    engines_tried = []
    orig = mbd.make_reverse_once

    def boom(env_, cfg_, st, sched, mesh=None, engine="vmap"):
        engines_tried.append(engine)
        if engine == "pallas":
            raise RuntimeError("simulated Mosaic lowering failure")
        return orig(env_, cfg_, st, sched, mesh, engine=engine)

    monkeypatch.setattr(mbd, "make_reverse_once", boom)
    with pytest.warns(RuntimeWarning, match="pallas engine failed"):
        r = mbd.plan(env, cfg, jax.random.PRNGKey(0), engine="pallas")
    assert engines_tried[0] == "pallas" and "fused" in engines_tried
    assert np.isfinite(float(r.final_reward))


def test_different_config_gets_its_own_program():
    env = envs.get_env("car2d")
    cfg_a = mbd.MBDConfig(Nsample=32, Hsample=10, Ndiffuse=8)
    cfg_b = mbd.MBDConfig(Nsample=16, Hsample=10, Ndiffuse=8)
    mbd.plan(env, cfg_a, jax.random.PRNGKey(0))
    n_after_a = len(mbd._REVERSE_JIT_CACHE[env])
    mbd.plan(env, cfg_b, jax.random.PRNGKey(0))
    assert len(mbd._REVERSE_JIT_CACHE[env]) == n_after_a + 1
