"""Pallas whole-rollout kernel: the entire H×n_frames trajectory in VMEM.

The XLA fused path (rollout/fused.py) still materializes inter-op
intermediates in HBM between fusions — at [B]=8192 rows that traffic is the
remaining bottleneck. This kernel runs the full rollout for a register-tile
of samples entirely on-chip: grid over sample blocks, ``fori_loop`` over env
steps (inner ``fori_loop`` over substeps), controls resident in VMEM,
per-step rewards written as the only output. The physics substep body is
the SAME jnp code as sim/batched.py — Pallas kernels trace ordinary jnp.

Sample-axis layout: each block carries its samples as an (8, b_tile//8)
batch — 8 sublanes × lanes — so every per-dof row op in the engine is a
complete (8, 128) f32 vector register instead of a 1-sublane strip (a
flat [B] row would waste 7/8 of VPU throughput).

Memory per block (humanoidrun, b_tile=1024):
  U [H, nu, 8, 128] ≈ 3.5 MB, carry q/qd ≈ 0.2 MB, rewards [H, 8, 128]
  ≈ 0.2 MB — comfortably inside the ~16 MB VMEM budget.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sim import batched as BT
from ..sim.system import System

SUBLANES = 8
DEFAULT_B_TILE = 1024      # samples per grid block = 8 sublanes × 128 lanes

# Mosaic's default scoped-VMEM budget is ~16 MB; the humanoid substep's
# stack intermediates need ~19 MB at b_tile=1024 with FK-based rewards
# (humanoidstandup) and ~25 MB at b_tile=2048 — well within the 128 MiB
# of physical VMEM on v5e, so raise the compiler cap rather than shrink
# the tile (observed OOMs: 18.87M/16M, 25.16M/16M). The raise is OPT-IN
# (ambient context below, or automatic for b_tile > DEFAULT_B_TILE):
# passing compiler_params unconditionally would change the lowering of
# every existing program and invalidate the persistent compile cache —
# cold unrolled-variant humanoid compiles are hour-class (docs/EVIDENCE
# .md), so cache-preserving byte-identity of the default path matters.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024

_VMEM_OVERRIDE: list = []


@contextlib.contextmanager
def raised_vmem_limit(nbytes: int = VMEM_LIMIT_BYTES):
    """Trace-time switch: pallas_calls built inside this context carry
    ``CompilerParams(vmem_limit_bytes=nbytes)``. Used by the planners'
    vmem-OOM retry path (plan() demotion chain: pallas → pallas with
    raised limit → fused) so only kernels that NEED the raise pay the
    cache invalidation."""
    _VMEM_OVERRIDE.append(int(nbytes))
    try:
        yield
    finally:
        _VMEM_OVERRIDE.pop()


def vmem_limit_for(b_tile: int):
    """Scoped-VMEM cap for a kernel at this tile: the ambient override if
    one is active, the raised default for super-DEFAULT tiles (new shapes
    — no cache to preserve, and >1024-sample tiles exceed Mosaic's ~16 MB
    default on the humanoids), else None (compiler default; keeps the
    lowering byte-identical with previously cached programs)."""
    if _VMEM_OVERRIDE:
        return _VMEM_OVERRIDE[-1]
    if b_tile > DEFAULT_B_TILE:
        return VMEM_LIMIT_BYTES
    return None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_rollout_kernel(sys: System, env, n_frames: int, H: int,
                        b_tile: int = DEFAULT_B_TILE,
                        interpret: bool = False,
                        need_qs: bool = False,
                        demo: bool = False):
    """Build rollout_fn(q0 [nq], qd0 [nv], U [H, nu, N]) → rews [H, N].

    Requires ``env.reward_qs_b`` (reward as a pure q/qd/ctrl function —
    true for every physics env in the suite). ``b_tile`` is samples per
    grid block; must be a multiple of 8 (the f32 sublane count).

    ``demo=True`` scores the demo-tracking log-density IN-KERNEL (reference
    mbd_planner.py:117-125): per env step one extra FK pass recovers the
    tracked-body positions (``env.track_xpos_b``), the clipped distance to
    the demo frame (``env.xref`` riding along in SMEM — 3 KB) accumulates in
    a register carry, and the kernel emits logpd [N] as one extra row
    output. Nothing H-sized is materialized — the VMEM budget is unchanged,
    which is what lets demo-conditioned runs keep this engine at full batch.

    ``need_qs=True`` streams the post-step position trace out instead
    (extra output qs [H, nq, N]) — that block costs H·nq·b_tile·4 B of VMEM,
    so it is for small-batch use (testing, analysis), not the planner path.
    """
    nq, nv, nu = sys.nq, sys.nv, sys.nu
    assert b_tile % SUBLANES == 0, "b_tile must be a multiple of 8"
    lt = b_tile // SUBLANES           # lane extent per block
    if demo:
        n_track = env.xref.shape[0]

    def kernel(*refs):
        it = iter(refs)
        q0_ref, qd0_ref, U_ref = next(it), next(it), next(it)
        xref_ref = next(it) if demo else None
        rews_ref, bad_ref = next(it), next(it)
        qs_ref = next(it) if need_qs else None
        logpd_ref = next(it) if demo else None

        def env_step(t, carry):
            q_prev, qd_prev, bad, acc = carry
            u = U_ref[t]                       # [nu, 8, lt]
            # static_rows: Mosaic cannot lower dynamic_slice, so the PGS
            # constraint sweep must use its statically-unrolled form here
            q, qd, bad = BT.env_step_checked_b(sys, q_prev, qd_prev, u,
                                               n_frames, bad,
                                               static_rows=True)
            r = env.reward_qs_b(q[None], qd[None], u[None], q_prev,
                                qd_prev)[0]    # [8, lt]
            rews_ref[t] = r
            if qs_ref is not None:
                qs_ref[t] = q
            if demo:
                xs = env.track_xpos_b(q)       # [n_track, 3, 8, lt]
                # static unroll over bodies/coords: [8, lt] vector ops with
                # SMEM scalar demo coordinates
                for b in range(n_track):
                    d2 = jnp.zeros_like(acc)
                    for c in range(3):
                        d2 = d2 + (xs[b, c] - xref_ref[t, b, c]) ** 2
                    err = jnp.sqrt(d2)
                    acc = acc + (jnp.clip(err, 0.0, 0.5) / 0.5) ** 2
            return (q, qd, bad, acc)

        zero = jnp.zeros(q0_ref.shape[1:], q0_ref.dtype)
        _, _, bad, acc = jax.lax.fori_loop(
            0, H, env_step, (q0_ref[:], qd0_ref[:], zero, zero))
        bad_ref[0] = bad
        if demo:
            logpd_ref[0] = -acc / (n_track * H)

    def rollout_fn(q0: jnp.ndarray, qd0: jnp.ndarray, U: jnp.ndarray):
        N = U.shape[-1]
        n_pad = _round_up(N, b_tile)
        if n_pad != N:
            U = jnp.pad(U, ((0, 0), (0, 0), (0, n_pad - N)))
        lanes = n_pad // SUBLANES
        Upk = U.reshape(H, nu, SUBLANES, lanes)
        if q0.ndim == 1:
            q0b = jnp.broadcast_to(q0[:, None, None],
                                   (nq, SUBLANES, lanes))
            qd0b = jnp.broadcast_to(qd0[:, None, None],
                                    (nv, SUBLANES, lanes))
        else:
            # per-sample initial state [nq, N] (seed-batched planning)
            if n_pad != N:
                q0 = jnp.pad(q0, ((0, 0), (0, n_pad - N)), mode="edge")
                qd0 = jnp.pad(qd0, ((0, 0), (0, n_pad - N)), mode="edge")
            q0b = q0.reshape(nq, SUBLANES, lanes)
            qd0b = qd0.reshape(nv, SUBLANES, lanes)
        grid = (lanes // lt,)
        in_specs = [
            pl.BlockSpec((nq, SUBLANES, lt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, SUBLANES, lt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, nu, SUBLANES, lt), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        inputs = [q0b, qd0b, Upk]
        if demo:
            # demo frames [H, n_track, 3] — scalar per-coordinate reads
            xref_hb = jnp.transpose(env.xref, (1, 0, 2))[:H]
            in_specs.append(
                pl.BlockSpec((H, n_track, 3), lambda i: (0, 0, 0),
                             memory_space=pltpu.SMEM))
            inputs.append(xref_hb)
        out_specs = [
            pl.BlockSpec((H, SUBLANES, lt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, lt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((H, SUBLANES, lanes), U.dtype),
            jax.ShapeDtypeStruct((1, SUBLANES, lanes), U.dtype),
        ]
        if need_qs:
            out_specs.append(
                pl.BlockSpec((H, nq, SUBLANES, lt), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((H, nq, SUBLANES, lanes), U.dtype))
        if demo:
            out_specs.append(
                pl.BlockSpec((1, SUBLANES, lt), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((1, SUBLANES, lanes), U.dtype))
        limit = vmem_limit_for(b_tile)
        kwargs = {}
        if limit is not None and not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=limit)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
            **kwargs,
        )(*inputs)
        rews, bad = out[0], out[1]
        res = (rews.reshape(H, n_pad)[:, :N],
               bad.reshape(n_pad)[:N])
        k = 2
        if need_qs:
            res += (out[k].reshape(H, nq, n_pad)[..., :N],)
            k += 1
        if demo:
            res += (out[k].reshape(n_pad)[:N],)
        return res

    return rollout_fn


def rollout_rewards_pallas(env, state0, Y0s: jnp.ndarray,
                           b_tile: int = DEFAULT_B_TILE,
                           interpret: bool = None,
                           need_qs: bool = False,
                           demo: bool = False):
    """Drop-in for rollout/fused.rollout_rewards (no link states):
    Y0s [N, H, nu] → (rews [N, H], diverged [N]). ``interpret=None`` means
    auto: compiled on TPU, interpreter elsewhere (Mosaic is TPU-only).

    ``need_qs=True`` appends the batch-last position trace qs [H, nq, N]
    (small-batch/testing use — costs VMEM). ``demo=True`` appends the
    in-kernel demo-tracking log-density logpd [N] (the planner's demo
    branch — no VMEM cost)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, H, nu = Y0s.shape
    fn = make_rollout_kernel(env.sys, env, env.n_frames, H, b_tile,
                             interpret, need_qs=need_qs, demo=demo)
    U = jnp.transpose(Y0s, (1, 2, 0))
    out = fn(state0.pipeline_state.q, state0.pipeline_state.qd, U)
    return (jnp.transpose(out[0], (1, 0)),) + out[1:]
