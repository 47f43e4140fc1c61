"""The fused demo branch scores tracking log-density from the raw q-trace
(``rollout_rewards(need_qs=True)`` + ``traj_xref_logpd_qs``) instead of
materializing full link states for every sample×step — at humanoid scale
states_from_qs over 16k samples is a multi-GB HBM spike (the round-5
humanoid harness OOM). These pin (a) the q-trace output against the
states path, (b) that the demo-enabled fused reverse step traces for the
humanoid morphology with NO states_from_qs materialization in the
program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mbd_tpu import envs
from mbd_tpu.rollout.fused import rollout_rewards


def test_need_qs_returns_position_trace():
    env = envs.get_env("hopper")
    state0 = env.reset(jax.random.PRNGKey(0))
    N, H = 16, 10
    Y = 0.2 * jax.random.normal(jax.random.PRNGKey(1),
                                (N, H, env.action_size))
    rews_s, ps, bad_s = jax.jit(
        lambda y: rollout_rewards(env, state0, y, need_states=True))(Y)
    rews_q, qs, bad_q = jax.jit(
        lambda y: rollout_rewards(env, state0, y, need_qs=True))(Y)
    assert qs.shape == (H, env.sys.nq, N)
    np.testing.assert_array_equal(np.asarray(rews_s), np.asarray(rews_q))
    np.testing.assert_array_equal(np.asarray(bad_s), np.asarray(bad_q))
    # the q-trace IS the positions the states were built from
    np.testing.assert_allclose(np.asarray(qs[:, :, 0]),
                               np.asarray(ps.q[:, 0]).reshape(H, -1),
                               rtol=0, atol=0)


def test_demo_fused_reverse_traces_without_link_states():
    """Trace (not compile — XLA-CPU can't build humanoid programs on this
    host) the demo-enabled fused reverse step for humanoidtrack and assert
    the program carries no [H, N, nbody, 3] link-position intermediates —
    the folded-FK scorer works on [H, nq, N] position traces only."""
    import dataclasses

    from mbd_tpu.core.schedule import make_schedule
    from mbd_tpu.planners import mbd

    env = envs.get_env("humanoidtrack")
    cfg = dataclasses.replace(
        mbd.MBDConfig(Nsample=16, Hsample=6, Ndiffuse=8), enable_demo=True)
    state0 = env.reset(jax.random.PRNGKey(0))
    sched = make_schedule(cfg.Ndiffuse, cfg.beta0, cfg.betaT)
    rev = mbd.make_reverse_once(env, cfg, state0, sched, engine="fused")
    carry = (jax.random.PRNGKey(1),
             jnp.zeros((cfg.Hsample, env.action_size)))
    jaxpr = jax.make_jaxpr(rev)(carry, jnp.asarray(1))
    nbody = env.sys.nbody
    bad_shape = (cfg.Hsample, cfg.Nsample, nbody - 1, 3)
    shapes = set()

    def walk(jx):
        for eqn in jx.eqns:
            for ov in eqn.outvars:
                aval = getattr(ov, "aval", None)
                if aval is not None and hasattr(aval, "shape"):
                    shapes.add(tuple(aval.shape))
            for p in eqn.params.values():
                for sub in _subs(p):
                    walk(sub)

    def _subs(v):
        if isinstance(v, jax.extend.core.Jaxpr):
            yield v
        elif isinstance(v, jax.extend.core.ClosedJaxpr):
            yield v.jaxpr
        elif isinstance(v, (tuple, list)):
            for x in v:
                yield from _subs(x)

    walk(jaxpr.jaxpr)
    assert bad_shape not in shapes, (
        "demo-enabled fused reverse step materializes full link states "
        f"({bad_shape}) — the q-trace scorer path is not being used")
