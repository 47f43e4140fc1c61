"""Trace-time guard for the Pallas whole-rollout kernel — ALL physics envs.

Two regression classes have shipped broken Pallas engines at a round
boundary, both invisible to the interpret-mode parity tests' narrow env set:

  r3: a ``dynamic_slice`` in the PGS sweep — traces fine, Mosaic rejects
      it only when LOWERING on a real TPU (BENCH_r03.json).
  r4: ``jnp.asarray(numpy_array)`` constants in ``spatial_inertia_all`` —
      Pallas rejects captured non-scalar constants at TRACE time, but only
      the envs the parity test happened to cover would have caught it
      (BENCH_r04.json: "captures constants [f32[13], ...]").

This guard runs in seconds on CPU for EVERY physics env (+ the demo and
need_qs kernel variants): it traces the full kernel closure with
``jax.make_jaxpr`` — which executes Pallas' captured-constant check — then
walks the traced kernel jaxpr (recursively through control-flow bodies)
asserting no Mosaic-unlowerable primitive appears. It needs no TPU; the
on-chip complement (compile + run) remains tools/probe_pallas_lowering.py.
"""

import jax
import jax.numpy as jnp
import pytest

from mbd_tpu import envs
from mbd_tpu.ops.rollout_pallas import make_rollout_kernel

PHYSICS_ENVS = [
    "hopper", "walker2d", "halfcheetah", "ant", "cartpole",
    "pushT", "humanoidrun", "humanoidstandup", "humanoidtrack",
]

# Primitives Mosaic cannot lower inside the whole-rollout kernel. The
# kernel must address memory with static indices only (static_rows PGS,
# constv-built constants); any of these appearing means a TPU lowering
# failure even though tracing and interpret mode succeed.
FORBIDDEN = {
    "dynamic_slice",        # r3 incident: PGS sweep row indexing
    "dynamic_update_slice",
    "gather",
    "scatter",
    "scatter-add",
    "sort",
}


def _iter_eqns(jaxpr):
    """Yield every eqn in ``jaxpr`` and, recursively, in any sub-jaxpr
    carried in eqn params (scan/while/cond bodies, closed calls)."""
    for eqn in jaxpr.eqns:
        yield eqn
        for v in eqn.params.values():
            for sub in _sub_jaxprs(v):
                yield from _iter_eqns(sub)


def _sub_jaxprs(v):
    if isinstance(v, jax.extend.core.Jaxpr):
        yield v
    elif isinstance(v, jax.extend.core.ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, (tuple, list)):
        for x in v:
            yield from _sub_jaxprs(x)


def _trace_kernel(env_name, **kw):
    """Trace the kernel closure (no execution, no Mosaic) and return the
    pallas_call eqns found in the traced program."""
    env = envs.get_env(env_name)
    state0 = env.reset(jax.random.PRNGKey(0))
    H, N = 4, 8
    fn = make_rollout_kernel(env.sys, env, env.n_frames, H, b_tile=8,
                             interpret=False, **kw)
    U = jnp.zeros((H, env.action_size, N))
    # make_jaxpr runs Pallas' _trace_kernel_to_jaxpr: a captured
    # non-scalar constant raises ValueError right here (the r4 failure)
    jaxpr = jax.make_jaxpr(fn)(state0.pipeline_state.q,
                               state0.pipeline_state.qd, U).jaxpr
    calls = [e for e in _iter_eqns(jaxpr)
             if e.primitive.name == "pallas_call"]
    assert calls, "no pallas_call in traced rollout"
    return calls


def _assert_lowerable(calls, label):
    for eqn in calls:
        kernel_jaxpr = eqn.params["jaxpr"]
        hits = sorted({e.primitive.name for e in _iter_eqns(kernel_jaxpr)
                       if e.primitive.name in FORBIDDEN})
        assert not hits, (
            f"{label}: Mosaic-unlowerable primitive(s) {hits} inside the "
            f"Pallas kernel — this compiles on CPU/interpret but FAILS on "
            f"TPU (r3-class regression)")


@pytest.mark.parametrize("env_name", PHYSICS_ENVS)
def test_kernel_traces_and_is_lowerable(env_name):
    _assert_lowerable(_trace_kernel(env_name), env_name)


def test_kernel_variants_trace_and_are_lowerable():
    # demo branch (in-kernel tracking score) and q-trace output
    _assert_lowerable(_trace_kernel("humanoidtrack", demo=True),
                      "humanoidtrack+demo")
    _assert_lowerable(_trace_kernel("hopper", need_qs=True),
                      "hopper+need_qs")
