"""Pallas whole-rollout kernel: the entire H×n_frames trajectory in VMEM.

The XLA fused path (rollout/fused.py) still materializes inter-op
intermediates in HBM between fusions — at [B]=8192 rows that traffic is the
remaining bottleneck. This kernel runs the full rollout for a lane-tile of
samples entirely on-chip: grid over sample blocks, ``fori_loop`` over env
steps (inner ``fori_loop`` over substeps), controls resident in VMEM,
per-step rewards written as the only output. The physics substep body is
the SAME jnp code as sim/batched.py — Pallas kernels trace ordinary jnp.

Memory per block (humanoidrun, B_TILE=128):
  U [H, nu, 128] ≈ 0.4 MB, carry q/qd ≈ 24 KB, rewards [H, 128] ≈ 26 KB —
comfortably inside the ~16 MB VMEM budget.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sim import batched as BT
from ..sim.system import System

DEFAULT_B_TILE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_rollout_kernel(sys: System, env, n_frames: int, H: int,
                        b_tile: int = DEFAULT_B_TILE,
                        interpret: bool = False):
    """Build rollout_fn(q0 [nq], qd0 [nv], U [H, nu, N]) → rews [H, N].

    Requires ``env.reward_qs_b`` (reward as a pure q/qd/ctrl function —
    true for every physics env in the suite).
    """
    nq, nv, nu = sys.nq, sys.nv, sys.nu

    def kernel(q0_ref, qd0_ref, U_ref, rews_ref, bad_ref):
        def env_step(t, carry):
            q_prev, qd_prev, bad = carry
            u = U_ref[t]                       # [nu, B]
            q, qd, bad = BT.env_step_checked_b(sys, q_prev, qd_prev, u,
                                               n_frames, bad)
            r = env.reward_qs_b(q[None], qd[None], u[None], q_prev,
                                qd_prev)[0]    # [B]
            rews_ref[t] = r
            return (q, qd, bad)

        bad0 = jnp.zeros(q0_ref.shape[-1], q0_ref.dtype)
        _, _, bad = jax.lax.fori_loop(
            0, H, env_step, (q0_ref[:], qd0_ref[:], bad0))
        bad_ref[0] = bad

    def rollout_fn(q0: jnp.ndarray, qd0: jnp.ndarray, U: jnp.ndarray):
        N = U.shape[-1]
        n_pad = _round_up(N, b_tile)
        if n_pad != N:
            U = jnp.pad(U, ((0, 0), (0, 0), (0, n_pad - N)))
        q0b = jnp.broadcast_to(q0[:, None], (nq, n_pad))
        qd0b = jnp.broadcast_to(qd0[:, None], (nv, n_pad))
        grid = (n_pad // b_tile,)
        rews, bad = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nq, b_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nv, b_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, nu, b_tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((H, b_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((H, n_pad), U.dtype),
                jax.ShapeDtypeStruct((1, n_pad), U.dtype),
            ),
            interpret=interpret,
        )(q0b, qd0b, U)
        return rews[:, :N], bad[0, :N]

    return rollout_fn


def rollout_rewards_pallas(env, state0, Y0s: jnp.ndarray,
                           b_tile: int = DEFAULT_B_TILE,
                           interpret: bool = False):
    """Drop-in for rollout/fused.rollout_rewards (no link states):
    Y0s [N, H, nu] → (rews [N, H], diverged [N])."""
    N, H, nu = Y0s.shape
    fn = make_rollout_kernel(env.sys, env, env.n_frames, H, b_tile,
                             interpret)
    U = jnp.transpose(Y0s, (1, 2, 0))
    rews, bad = fn(state0.pipeline_state.q, state0.pipeline_state.qd, U)
    return jnp.transpose(rews, (1, 0)), bad
