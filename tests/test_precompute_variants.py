"""Bit-exact parity of the two precompute variants (sim/batched.py).

``precompute_variant("unrolled")`` re-emits the per-body / per-constraint
sparse precompute that docs/BENCH_LIVE_r04.json's kernel ran (~37% faster
at runtime, hour-class humanoid compiles); the default "stacked" form is
the minutes-compile production path. Both are the SAME math in the SAME
accumulation order feeding the SAME PGS sweep, so a compiled substep's
outputs must be bit-identical — this pins that, plus Pallas trace-safety
of the unrolled form (the r4 regression class: captured device
constants). (Whole-rollout programs may still drift at f32-rounding
level across variants: XLA fuses the two traces differently and
reassociates — the standard trace-level-change caveat.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbd_tpu import envs
from mbd_tpu.sim import batched as BT

# hopper: contacts + joint limits; walker2d: more bodies/contacts.
# (humanoids are the envs the trade matters for, but XLA-CPU cannot
# compile humanoid substeps on this host — morphology coverage for the
# stacked/unrolled builders comes from these trees plus the trace-only
# checks below.)
ENVS = ["hopper", "walker2d"]


def _substep_outputs(env, variant, steps=3):
    """Run a few full substeps (contact-rich: drop from init) and return
    (q, qd) after each — compiled, so both variants go through XLA."""
    sys = env.sys
    B = (8, 4)
    q = jnp.broadcast_to(sys.init_q[:, None, None], (sys.nq,) + B)
    # small downward velocity to guarantee active contacts + limit drift
    qd = jnp.full((sys.nv,) + B, -0.1)
    u = jnp.full((sys.nu,) + B, 0.3)

    with BT.precompute_variant(variant):
        fn = jax.jit(lambda q, qd, u: BT.substep_b(sys, q, qd, u))
        outs = []
        for _ in range(steps):
            q, qd = fn(q, qd, u)
            outs.append((np.asarray(q), np.asarray(qd)))
    return outs


@pytest.mark.parametrize("env_name", ENVS)
def test_variants_bit_identical(env_name):
    env = envs.get_env(env_name)
    a = _substep_outputs(env, "stacked")
    b = _substep_outputs(env, "unrolled")
    for step, ((qa, qda), (qb, qdb)) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(
            qa, qb, err_msg=f"{env_name} q diverged at substep {step}")
        np.testing.assert_array_equal(
            qda, qdb, err_msg=f"{env_name} qd diverged at substep {step}")


def test_unrolled_variant_traces_for_pallas():
    """The unrolled builders must stay Pallas trace-safe (python-scalar
    constants only): trace the whole-rollout kernel closure under the
    variant for the flagship morphology + hopper. Captured non-scalar
    constants raise right here (r4 regression class)."""
    from tests.test_pallas_traceguard import _assert_lowerable, _trace_kernel

    with BT.precompute_variant("unrolled"):
        _assert_lowerable(_trace_kernel("humanoidrun"),
                          "humanoidrun (unrolled precompute)")
        _assert_lowerable(_trace_kernel("hopper"),
                          "hopper (unrolled precompute)")


def test_variant_guardrails():
    with pytest.raises(ValueError):
        with BT.precompute_variant("nope"):
            pass
    # the context restores the default even on error
    assert BT.PRECOMPUTE_VARIANT == "stacked"
    try:
        with BT.precompute_variant("unrolled"):
            assert BT.PRECOMPUTE_VARIANT == "unrolled"
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert BT.PRECOMPUTE_VARIANT == "stacked"
