"""Fused batch-last rollout: the planner hot path on TPU.

Rolls out Nsample control sequences through the batch-last engine
(sim/batched.py) in one ``lax.scan`` over the horizon, then reconstructs a
stacked ``PipelineState`` trajectory with ONE extra FK pass where the H and
B axes are folded together ([nq, H·B] — rewards cost one wide FK instead of
per-step ones), and evaluates the env's trajectory reward.

This replaces ``vmap(rollout_us)`` (reference mbd_planner.py:109) for
physics envs: same math, sample axis on TPU lanes end-to-end.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..sim import batched as BT
from ..sim.pipeline import PipelineState, X, Xd


SUBLANES = 8    # f32 vreg sublane count: batch packs as (8, N//8) so every
                # per-dof row op fills complete (8, 128) vector registers


def rollout_qs(sys, n_frames: int, q0: jnp.ndarray, qd0: jnp.ndarray,
               U: jnp.ndarray):
    """Scan env steps. q0 [nq, *B], qd0 [nv, *B], U [H, nu, *B] →
    (qs [H, nq, *B], qds [H, nv, *B], diverged [*B])."""

    def body(carry, u):
        q, qd, bad = carry
        q, qd, bad = BT.env_step_checked_b(sys, q, qd, u, n_frames, bad)
        return (q, qd, bad), (q, qd)

    bad0 = jnp.zeros(q0.shape[1:], q0.dtype)
    (_, _, bad), (qs, qds) = jax.lax.scan(body, (q0, qd0, bad0), U)
    return qs, qds, bad


def states_from_qs(sys, qs: jnp.ndarray, qds: jnp.ndarray) -> PipelineState:
    """Stacked PipelineState [H, B, ...] from batch-last rollout arrays,
    computed with a single folded-batch FK pass."""
    H, nq, B = qs.shape
    nv = qds.shape[1]
    q_flat = jnp.moveaxis(qs, 0, -1).reshape(nq, B * H)   # [nq, B*H]
    qd_flat = jnp.moveaxis(qds, 0, -1).reshape(nv, B * H)
    # pack the folded batch to (8, ·) full-vreg rows when divisible
    BH = B * H
    packed = BH % SUBLANES == 0
    if packed:
        q_flat = q_flat.reshape(nq, SUBLANES, BH // SUBLANES)
        qd_flat = qd_flat.reshape(nv, SUBLANES, BH // SUBLANES)
    out = BT.link_out_b(sys, q_flat, qd_flat)

    def unfold(rows):   # list of [k, *(B*H)] → [H, B, nbody-1, k]
        arr = jnp.stack(rows[1:])                         # [nlink, k, B*H]
        arr = arr.reshape(arr.shape[0], arr.shape[1], B, H)
        return jnp.transpose(arr, (3, 2, 0, 1))

    return PipelineState(
        q=jnp.moveaxis(qs, 1, -1),       # [H, B, nq]
        qd=jnp.moveaxis(qds, 1, -1),
        x=X(pos=unfold(out.xpos), rot=unfold(out.xquat)),
        xd=Xd(vel=unfold(out.vel), ang=unfold(out.ang)),
    )


def rollout_rewards(env, state0, Y0s: jnp.ndarray, need_states: bool = None,
                    need_qs: bool = False
                    ) -> Tuple[jnp.ndarray, PipelineState]:
    """Fused equivalent of vmap(rollout_us): Y0s [N, H, nu] →
    (rews [N, H], stacked PipelineState with [H, N] leading axes).

    When the env provides ``reward_qs_b`` (reward as a pure function of the
    batch-last q/qd/ctrl arrays — true for every physics env in the suite)
    and the caller doesn't need link states, the post-rollout FK pass is
    skipped entirely.

    ``need_qs=True`` returns the raw position trace qs [H, nq, N] as the
    middle element instead of link states — for envs with a
    ``traj_xref_logpd_qs`` folded-FK scorer this keeps the demo branch's
    footprint at one [H, nq, N] array instead of materializing full link
    states for every sample×step (states_from_qs on 16k humanoid samples
    is a multi-GB HBM spike). Callers that need true link states (e.g.
    final-plan scoring over a handful of plans) pass ``need_states=True``.

    ``state0.pipeline_state.q/.qd`` may carry a trailing per-sample batch
    axis ([nq, N] instead of [nq]) — each sample then rolls out from its own
    initial state (used by the seed-batched planner, where seeds with
    different reset noise share one program).
    """
    sys = env.sys
    N, H, nu = Y0s.shape
    U = jnp.transpose(Y0s, (1, 2, 0))                     # [H, nu, N]
    # pack the sample axis to (8, L): full-vreg rows in the engine
    pad = (-N) % SUBLANES
    if pad:
        U = jnp.pad(U, ((0, 0), (0, 0), (0, pad)))
    Np = N + pad
    L = Np // SUBLANES
    Upk = U.reshape(H, nu, SUBLANES, L)
    q0_in = state0.pipeline_state.q
    qd0_in = state0.pipeline_state.qd
    if q0_in.ndim == 1:
        q0 = jnp.broadcast_to(q0_in[:, None, None],
                              (sys.nq, SUBLANES, L))
        qd0 = jnp.broadcast_to(qd0_in[:, None, None],
                               (sys.nv, SUBLANES, L))
    else:
        if pad:
            q0_in = jnp.pad(q0_in, ((0, 0), (0, pad)), mode="edge")
            qd0_in = jnp.pad(qd0_in, ((0, 0), (0, pad)), mode="edge")
        q0 = q0_in.reshape(sys.nq, SUBLANES, L)
        qd0 = qd0_in.reshape(sys.nv, SUBLANES, L)
    qs, qds, diverged = rollout_qs(sys, env.n_frames, q0, qd0, Upk)
    diverged = diverged.reshape(Np)[:N]

    fast = hasattr(env, "reward_qs_b")
    if need_states is None:
        need_states = not fast
    ps = None
    if need_states:
        ps = states_from_qs(sys, qs.reshape(H, sys.nq, Np)[..., :N],
                            qds.reshape(H, sys.nv, Np)[..., :N])
    if fast:
        rews = env.reward_qs_b(qs, qds, Upk, q0, qd0)     # [H, 8, L]
        rews = rews.reshape(H, Np)[:, :N]
    else:
        rews = env.traj_reward(ps, Y0s, state0.pipeline_state)
    mid = qs.reshape(H, sys.nq, Np)[..., :N] if need_qs else ps
    return jnp.transpose(rews, (1, 0)), mid, diverged
