"""Model-Based Diffusion trajectory optimizer (the flagship planner).

Re-implements the reverse-diffusion semantics of the reference
(mbd/planners/mbd_planner.py:84-148) as a single fused device program:

  * DDPM schedule: betas linspace(beta0, betaT, Ndiffuse), ᾱ = cumprod(1-β),
    σᵢ = sqrt(1-ᾱᵢ)  (reference :84-92)
  * per step i (reference reverse_once, :97-135):
      Yi   = Ȳᵢ·√ᾱᵢ
      Y0s  ~ N(Ȳᵢ, σᵢ²) clipped to [-1, 1]
      rews = batch rollout of Y0s, standardized → logp₀ = (r-μ)/σ/temp
      [demo] logp_demo fusion with max-renormalization (:117-125)
      w    = softmax(logp₀);  Ȳ = Σₙ wₙ Y0sₙ   (the score barycenter)
      score = (−Yi + √ᾱᵢ·Ȳ)/(1−ᾱᵢ)
      Yᵢ₋₁ = (Yi + (1−ᾱᵢ)·score)/√αᵢ ;  Ȳᵢ₋₁ = Yᵢ₋₁/√ᾱᵢ₋₁
    The update is a deterministic mean update — no noise re-injection
    (the reference computes sigmas_cond but never uses it).

TPU-first differences from the reference:
  * the whole Ndiffuse reverse loop is one ``lax.scan`` — a single XLA
    program instead of a host loop of jitted steps;
  * the Nsample axis carries an optional ``NamedSharding`` over a 1-D device
    mesh; the reward standardization / softmax / barycenter einsum lower to
    ICI collectives under GSPMD.
"""

from __future__ import annotations

import functools
import weakref
from dataclasses import astuple, dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..core.schedule import make_schedule
from ..parallel.mesh import sample_sharding
from ..rollout import rollout_us


@dataclass
class MBDConfig:
    Nsample: int = 2048          # number of control-sequence samples
    Hsample: int = 50            # planning horizon
    Ndiffuse: int = 100          # diffusion steps
    temp_sample: float = 0.1     # softmax temperature
    beta0: float = 1e-4
    betaT: float = 1e-2
    enable_demo: bool = False    # demo-conditioned diffusion


# Per-env recommended overrides (reference mbd_planner.py:44-69).
TEMP_RECOMMEND = {
    "ant": 0.1, "halfcheetah": 0.4, "hopper": 0.1, "humanoidstandup": 0.1,
    "humanoidrun": 0.1, "walker2d": 0.1, "pushT": 0.2,
}
NDIFFUSE_RECOMMEND = {"pushT": 200, "humanoidrun": 300}
NSAMPLE_RECOMMEND = {"humanoidrun": 8192}
HSAMPLE_RECOMMEND = {"pushT": 40}


def recommended_config(env_name: str, base: Optional[MBDConfig] = None) -> MBDConfig:
    cfg = base or MBDConfig()
    return MBDConfig(
        Nsample=NSAMPLE_RECOMMEND.get(env_name, cfg.Nsample),
        Hsample=HSAMPLE_RECOMMEND.get(env_name, cfg.Hsample),
        Ndiffuse=NDIFFUSE_RECOMMEND.get(env_name, cfg.Ndiffuse),
        temp_sample=TEMP_RECOMMEND.get(env_name, cfg.temp_sample),
        beta0=cfg.beta0, betaT=cfg.betaT, enable_demo=cfg.enable_demo,
    )


@dataclass
class MBDResult:
    Ybars: jax.Array          # (Ndiffuse-1, Hsample, nu) denoised means
    rews_trace: jax.Array     # (Ndiffuse-1,) mean batch reward per step
    final_reward: jax.Array   # mean reward of rolling out Ybars[-1]
    # True when the returned plan's own rollout is flagged by the engine's
    # validity envelope (qd/penetration checks, sim/batched.py) and no
    # clean iterate existed to fall back to — final_reward is then NOT an
    # earned number and must be reported as tainted, never silently
    # (VERDICT r2 item 1). Scalar for plan(), [S] for plan_batch().
    final_diverged: jax.Array = None


def default_engine(env, mesh: Optional[Mesh] = None) -> str:
    """Engine selection: analytic envs vmap; physics envs use the
    VMEM-resident Pallas rollout on TPU (≈10× the XLA-fused path — the whole
    H×n_frames loop stays on-chip) when the env has the pure-q reward fast
    path, else the batch-last fused engine. Meshed TPU runs keep the Pallas
    kernel via the ``jax.shard_map`` region in ``make_reverse_once`` — each
    chip rolls out its sample shard locally and the planner reductions
    cross chips as ICI collectives."""
    from ..envs.physics import PhysicsEnv
    if not isinstance(env, PhysicsEnv):
        return "vmap"
    if jax.default_backend() == "tpu" and hasattr(env, "reward_qs_b"):
        return "pallas"
    return "fused"


# Jitted reverse_chunk programs, keyed per env (weak) × (cfg, engine, mesh
# [, n_seeds]). With reset states as operands (see plan()) the program is
# seed-independent, so repeat same-config calls — MPC-style replanning, the
# seed harness, tests — skip both the retrace AND the recompile.
_REVERSE_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _cached_reverse_chunk(env, key, build):
    from ..sim import batched as _batched

    # the precompute variant is a trace-time switch (sim/batched.py): two
    # variants of the same (cfg, engine) trace to different programs
    key = (key, _batched.PRECOMPUTE_VARIANT)
    sub = _REVERSE_JIT_CACHE.setdefault(env, {})
    if key not in sub:
        sub[key] = jax.jit(build())
    return sub[key]


def make_reverse_once(env, cfg: MBDConfig, state_init, sched,
                      mesh: Optional[Mesh] = None,
                      engine: str = "vmap") -> Callable:
    """Build the per-step reverse update as a pure function.

    carry = (rng, Ybar_i); x = step index i (descending Ndiffuse-1 → 1).

    ``engine``: "vmap" uses per-sample env.step under vmap (reference
    semantics, works for every env); "fused" uses the batch-last engine
    (sim/batched.py via rollout/fused.py) where the sample axis lives on
    TPU lanes; "pallas" runs the whole rollout VMEM-resident
    (ops/rollout_pallas.py — fastest single-chip path; demo conditioning
    scores the tracking log-density IN-KERNEL against SMEM-resident demo
    frames, so no q-trace leaves the kernel and the VMEM budget is
    unchanged; ``traj_xref_logpd_qs`` is only the test oracle for it).
    """
    nu = env.action_size
    if (engine == "pallas" and cfg.enable_demo
            and not hasattr(env, "track_xpos_b")):
        engine = "fused"
    shard = sample_sharding(mesh) if mesh is not None else None

    if engine in ("fused", "pallas"):
        from ..rollout.fused import rollout_rewards
        if engine == "pallas":
            from ..ops.rollout_pallas import rollout_rewards_pallas
        if mesh is not None and cfg.Nsample % mesh.devices.size != 0:
            raise ValueError(
                f"Nsample={cfg.Nsample} must be divisible by the mesh "
                f"device count {mesh.devices.size}; otherwise the "
                f"per-device shard sizes diverge and shard_map fails "
                f"with an opaque partitioning error.")
        n_loc = (cfg.Nsample // mesh.devices.size if mesh is not None
                 else cfg.Nsample)
        # 2048-sample tiles measured 22% faster than 1024 on the
        # humanoid kernel (tools/probe_vmem.py, v5e; needs the
        # raised scoped-VMEM cap that rollout_pallas auto-applies
        # for super-default tiles); 4096 was slightly slower
        b_tile = min(2048, ((n_loc + 7) // 8) * 8)

        def _eval_local(Y0s_):
            """Per-sample evaluation (no cross-sample coupling): Y0s_
            [n, H, nu] → (mean reward [n], diverged flag [n], demo
            log-density [n] — zeros when demo is off)."""
            if engine == "pallas":
                if cfg.enable_demo:
                    rewss, bad, logpd = rollout_rewards_pallas(
                        env, state_init, Y0s_, b_tile=b_tile, demo=True)
                else:
                    rewss, bad = rollout_rewards_pallas(
                        env, state_init, Y0s_, b_tile=b_tile)
                    logpd = jnp.zeros(rewss.shape[0])
            else:
                # demo scoring prefers the folded-FK q-trace scorer: the
                # state-based one would materialize full link states for
                # every sample×step (multi-GB at humanoid scale)
                use_qs = cfg.enable_demo and hasattr(env,
                                                     "traj_xref_logpd_qs")
                rewss, tr, bad = rollout_rewards(
                    env, state_init, Y0s_,
                    need_states=(cfg.enable_demo and not use_qs) or None,
                    need_qs=use_qs)
                if not cfg.enable_demo:
                    logpd = jnp.zeros(rewss.shape[0])
                elif use_qs:
                    logpd = env.traj_xref_logpd_qs(tr)
                else:
                    logpd = env.traj_xref_logpd(tr)
            return rewss.mean(axis=-1), bad, logpd

        if mesh is not None:
            # pallas_call does not auto-partition under GSPMD, and the fused
            # engine's batch-(sub)lane packing reshape invites a silent
            # all-gather — so under a mesh the whole per-sample evaluation
            # runs inside jax.shard_map: each chip rolls out its Nsample/n_dev
            # shard locally; only the [n]-vector outputs leave the region, and
            # the planner's reductions below become small ICI collectives
            # (SURVEY §5's mapping of reference mbd_planner.py:110-128).
            from jax.sharding import PartitionSpec as P
            axis = mesh.axis_names[0]
            eval_samples = jax.shard_map(
                _eval_local, mesh=mesh, in_specs=P(axis),
                out_specs=(P(axis), P(axis), P(axis)),
                check_vma=False)  # pallas out_shapes carry no vma metadata
        else:
            eval_samples = _eval_local
    else:
        batch_rollout = jax.vmap(
            functools.partial(rollout_us, env.step), in_axes=(None, 0))

        def eval_samples(Y0s_):
            rewss, qs = batch_rollout(state_init, Y0s_)
            logpd = (jax.vmap(env.eval_xref_logpd)(qs) if cfg.enable_demo
                     else jnp.zeros(rewss.shape[0]))
            return rewss.mean(axis=-1), None, logpd

    def reverse_once(carry, i):
        rng, Ybar_i = carry
        abar = sched.alphas_bar[i]
        Yi = Ybar_i * jnp.sqrt(abar)

        rng, key = jax.random.split(rng)
        eps = jax.random.normal(key, (cfg.Nsample, cfg.Hsample, nu))
        Y0s = jnp.clip(eps * sched.sigmas[i] + Ybar_i, -1.0, 1.0)
        if shard is not None:
            Y0s = jax.lax.with_sharding_constraint(Y0s, shard)

        rews, diverged, xref_logpds = eval_samples(Y0s)
        # diverged-rollout guard: a numerically diverged sample can report
        # an absurdly high reward (e.g. torso_x → 1e12) and hijack the
        # softmax barycenter; demote flagged/non-finite rollouts to the
        # worst valid reward for the batch statistics, then zero their
        # softmax weight entirely below
        valid = jnp.isfinite(rews)
        if diverged is not None:
            valid = valid & (diverged == 0)
        worst = jnp.min(jnp.where(valid, rews, jnp.inf))
        worst = jnp.where(jnp.isfinite(worst), worst, 0.0)
        rews = jnp.where(valid, rews, worst)
        rew_mean = rews.mean()
        rew_std = rews.std()
        rew_std = jnp.where(rew_std < 1e-4, 1.0, rew_std)
        logp0 = (rews - rew_mean) / rew_std / cfg.temp_sample

        if cfg.enable_demo:
            # Demo fusion (reference :117-125): take the better of the reward
            # log-density and the demo-tracking log-density, re-standardize.
            # (The max is a global cross-sample reduction — kept outside the
            # shard_map region, where GSPMD lowers it to a scalar collective.)
            xref_logpds = xref_logpds - xref_logpds.max()
            logpdemo = (xref_logpds + env.rew_xref - rew_mean) / rew_std \
                / cfg.temp_sample
            logp0 = jnp.where(logpdemo > logp0, logpdemo, logp0)
            lstd = logp0.std()
            lstd = jnp.where(lstd < 1e-4, 1.0, lstd)
            logp0 = (logp0 - logp0.mean()) / lstd / cfg.temp_sample

        # flagged samples contribute NOTHING to the barycenter (demoting to
        # the worst reward still left them nonzero softmax mass); all-flagged
        # batches fall back to uniform weights so the update stays finite
        n_valid = valid.sum()
        logp0 = jnp.where(valid, logp0, -jnp.inf)
        weights = jax.nn.softmax(logp0)
        weights = jnp.where(n_valid > 0, weights,
                            jnp.full_like(weights, 1.0 / weights.shape[0]))
        Ybar = jnp.einsum("n,nij->ij", weights, Y0s)

        score = (-Yi + jnp.sqrt(abar) * Ybar) / (1.0 - abar)
        Yim1 = (Yi + (1.0 - abar) * score) / jnp.sqrt(sched.alphas[i])
        Ybar_im1 = Yim1 / jnp.sqrt(sched.alphas_bar[i - 1])

        return (rng, Ybar_im1), (Ybar_im1, rews.mean())

    return reverse_once


def make_reverse_once_batch(env, cfg: MBDConfig, states_init, sched,
                            n_seeds: int, engine: str = "vmap",
                            mesh: Optional[Mesh] = None) -> Callable:
    """Seed-batched reverse update: S independent denoises in one program.

    The reference runs its 8-seed acceptance harness serially
    (mbd/scripts/run_mbd.py:17-39); on TPU the seeds ride the same sample
    axis — the engines roll out S·Nsample trajectories per step (each seed's
    samples start from that seed's own reset state) and every reduction
    (standardize / demo fusion / softmax / barycenter) is per-seed.

    ``mesh``: optional 1-D device mesh — the flattened S·Nsample axis is
    sharded across it (each chip rolls out its shard of every seed's
    samples via jax.shard_map, exactly like the single-seed planner's
    meshed path); the per-seed reductions become small ICI collectives.
    The two headline scaling features (seed-batching, multi-chip sharding)
    compose here.

    carry = (rngs [S] keys, Ybar_i [S, H, nu]); x = step index.
    ``states_init``: a State pytree with leading seed axis (vmap(env.reset)).
    """
    from types import SimpleNamespace

    nu = env.action_size
    S, N = n_seeds, cfg.Nsample
    if (engine == "pallas" and cfg.enable_demo
            and not hasattr(env, "track_xpos_b")):
        engine = "fused"

    if engine in ("fused", "pallas"):
        from ..rollout.fused import rollout_rewards
        if engine == "pallas":
            from ..ops.rollout_pallas import rollout_rewards_pallas
        if mesh is not None and (S * N) % mesh.devices.size != 0:
            raise ValueError(
                f"S·Nsample = {S}·{N} = {S * N} must be divisible by the "
                f"mesh device count {mesh.devices.size}; otherwise the "
                "flat sample axis cannot be evenly sharded (shard_map "
                "would fail with an opaque partitioning error)")
        n_loc = (S * N // mesh.devices.size if mesh is not None
                 else S * N)
        # 2048-sample tiles measured 22% faster than 1024 on the
        # humanoid kernel (tools/probe_vmem.py, v5e; needs the
        # raised scoped-VMEM cap that rollout_pallas auto-applies
        # for super-default tiles); 4096 was slightly slower
        b_tile = min(2048, ((n_loc + 7) // 8) * 8)
        # per-sample initial states: seed-major [nq, S*N] (sample s*N+n
        # starts from seed s's reset state)
        q0 = jnp.repeat(states_init.pipeline_state.q.T, N, axis=1)
        qd0 = jnp.repeat(states_init.pipeline_state.qd.T, N, axis=1)

        def _eval_flat(flat, q0_, qd0_):
            """Per-sample evaluation on a [n, H, nu] shard: no cross-sample
            coupling, so shard_map'ing it over the flat S·N axis is exact."""
            shim = SimpleNamespace(
                pipeline_state=SimpleNamespace(q=q0_, qd=qd0_))
            if engine == "pallas":
                if cfg.enable_demo:
                    rewss, bad, logpd = rollout_rewards_pallas(
                        env, shim, flat, b_tile=b_tile, demo=True)
                else:
                    rewss, bad = rollout_rewards_pallas(env, shim, flat,
                                                        b_tile=b_tile)
                    logpd = jnp.zeros(rewss.shape[0])
            else:
                # same folded-FK preference as make_reverse_once: full
                # link states over S·N samples are a multi-GB HBM spike
                use_qs = cfg.enable_demo and hasattr(env,
                                                     "traj_xref_logpd_qs")
                rewss, tr, bad = rollout_rewards(
                    env, shim, flat,
                    need_states=(cfg.enable_demo and not use_qs) or None,
                    need_qs=use_qs)
                if not cfg.enable_demo:
                    logpd = jnp.zeros(rewss.shape[0])
                elif use_qs:
                    logpd = env.traj_xref_logpd_qs(tr)
                else:
                    logpd = env.traj_xref_logpd(tr)
            return rewss.mean(axis=-1), bad, logpd

        if mesh is not None:
            # same rationale as make_reverse_once's meshed path: pallas_call
            # does not auto-partition under GSPMD and the fused engine's
            # packing reshape invites a silent all-gather, so the rollout
            # runs inside shard_map — the seed-major initial states ride in
            # as explicit sample-sharded operands (they vary per sample,
            # unlike the single-seed path's replicated closure state)
            from jax.sharding import PartitionSpec as P
            axis = mesh.axis_names[0]
            eval_flat = jax.shard_map(
                _eval_flat, mesh=mesh,
                in_specs=(P(axis), P(None, axis), P(None, axis)),
                out_specs=(P(axis), P(axis), P(axis)),
                check_vma=False)  # pallas out_shapes carry no vma metadata
        else:
            eval_flat = _eval_flat

        def eval_samples(Y0s):                      # [S, N, H, nu]
            flat = Y0s.reshape(S * N, cfg.Hsample, nu)
            if mesh is not None:
                flat = jax.lax.with_sharding_constraint(
                    flat, sample_sharding(mesh))
            rews, bad, logpd = eval_flat(flat, q0, qd0)
            return (rews.reshape(S, N), bad.reshape(S, N),
                    logpd.reshape(S, N))
    else:
        batch_rollout = jax.vmap(
            jax.vmap(functools.partial(rollout_us, env.step),
                     in_axes=(None, 0)),
            in_axes=(0, 0))

        def eval_samples(Y0s):
            rewss, qs = batch_rollout(states_init, Y0s)
            logpd = (jax.vmap(jax.vmap(env.eval_xref_logpd))(qs)
                     if cfg.enable_demo else jnp.zeros((S, N)))
            return rewss.mean(axis=-1), None, logpd

    def reverse_once(carry, i):
        rngs, Ybar_i = carry                        # [S, 2], [S, H, nu]
        abar = sched.alphas_bar[i]
        Yi = Ybar_i * jnp.sqrt(abar)

        split = jax.vmap(jax.random.split)(rngs)    # [S, 2, 2]
        rngs_next, keys = split[:, 0], split[:, 1]
        eps = jax.vmap(lambda k: jax.random.normal(
            k, (N, cfg.Hsample, nu)))(keys)
        Y0s = jnp.clip(eps * sched.sigmas[i] + Ybar_i[:, None], -1.0, 1.0)

        rews, diverged, xref_logpds = eval_samples(Y0s)
        valid = jnp.isfinite(rews)
        if diverged is not None:
            valid = valid & (diverged == 0)
        worst = jnp.min(jnp.where(valid, rews, jnp.inf), axis=1,
                        keepdims=True)
        worst = jnp.where(jnp.isfinite(worst), worst, 0.0)
        rews = jnp.where(valid, rews, worst)
        rew_mean = rews.mean(axis=1, keepdims=True)
        rew_std = rews.std(axis=1, keepdims=True)
        rew_std = jnp.where(rew_std < 1e-4, 1.0, rew_std)
        logp0 = (rews - rew_mean) / rew_std / cfg.temp_sample

        if cfg.enable_demo:
            xref_logpds = xref_logpds - xref_logpds.max(axis=1,
                                                        keepdims=True)
            logpdemo = (xref_logpds + env.rew_xref - rew_mean) / rew_std \
                / cfg.temp_sample
            logp0 = jnp.where(logpdemo > logp0, logpdemo, logp0)
            lstd = logp0.std(axis=1, keepdims=True)
            lstd = jnp.where(lstd < 1e-4, 1.0, lstd)
            logp0 = ((logp0 - logp0.mean(axis=1, keepdims=True))
                     / lstd / cfg.temp_sample)

        # zero weight for flagged samples (cf. the serial reverse_once)
        n_valid = valid.sum(axis=1, keepdims=True)
        logp0 = jnp.where(valid, logp0, -jnp.inf)
        weights = jax.nn.softmax(logp0, axis=1)
        weights = jnp.where(n_valid > 0, weights,
                            jnp.full_like(weights, 1.0 / weights.shape[1]))
        Ybar = jnp.einsum("sn,snij->sij", weights, Y0s)

        score = (-Yi + jnp.sqrt(abar) * Ybar) / (1.0 - abar)
        Yim1 = (Yi + (1.0 - abar) * score) / jnp.sqrt(sched.alphas[i])
        Ybar_im1 = Yim1 / jnp.sqrt(sched.alphas_bar[i - 1])

        return (rngs_next, Ybar_im1), (Ybar_im1, rews.mean(axis=1))

    return reverse_once


def plan_batch(env, cfg: MBDConfig, rngs: jax.Array, jit: bool = True,
               chunk_size: int = 0, progress_fn=None,
               engine: Optional[str] = None,
               mesh: Optional[Mesh] = None) -> MBDResult:
    """Seed-batched planning with a LOUD pallas→fused safety net (see
    ``_plan_batch_impl`` for the semantics). The Pallas kernel traces the
    full physics substep through Mosaic; if a Mosaic lowering regression
    ever rejects it, the harness must degrade to the XLA-fused engine —
    same math, same engine family for the published numbers — rather than
    die mid-sweep. ``mesh``: shard the flattened S·Nsample axis over a 1-D
    device mesh (seed-batching and multi-chip sharding compose)."""
    if engine is None:
        engine = default_engine(env, mesh)
    try:
        return _plan_batch_impl(env, cfg, rngs, jit, chunk_size,
                                progress_fn, engine, mesh)
    except Exception as e:
        if engine != "pallas":
            raise
        import warnings
        if "vmem" in f"{e}".lower():
            # Mosaic scoped-VMEM overflow (humanoidstandup's FK-based
            # reward at H=50 needs ~19 MB vs the ~16 MB default): retry
            # the SAME kernel under a raised compiler cap before giving
            # up the Pallas engine — only that program pays the cache
            # invalidation (see ops/rollout_pallas.raised_vmem_limit).
            from ..ops.rollout_pallas import raised_vmem_limit
            warnings.warn(
                f"pallas kernel exceeded the default scoped-VMEM cap "
                f"({type(e).__name__}); retrying with a raised "
                "vmem_limit_bytes", RuntimeWarning, stacklevel=2)
            try:
                with raised_vmem_limit():
                    return _plan_batch_impl(env, cfg, rngs, jit,
                                            chunk_size, progress_fn,
                                            "pallas", mesh)
            except Exception as e2:  # noqa: BLE001
                e = e2
        warnings.warn(
            f"pallas engine failed ({type(e).__name__}: {e}); retrying "
            "with the XLA-fused engine", RuntimeWarning, stacklevel=2)
        return _plan_batch_impl(env, cfg, rngs, jit, chunk_size,
                                progress_fn, "fused", mesh)


def _plan_batch_impl(env, cfg: MBDConfig, rngs: jax.Array, jit: bool,
                     chunk_size: int, progress_fn, engine: str,
                     mesh: Optional[Mesh] = None) -> MBDResult:
    """Run S independent full denoises as one batched device program.

    ``rngs``: [S] stacked PRNG keys, one per seed. Each seed's RNG chain is
    identical to ``plan(rng=rngs[s])`` — same reset split, same experiment
    stream — so per-seed results match the serial harness to f32 rollout
    tolerance. Returns an MBDResult with a leading seed axis on every field.

    The best-feasible-iterate final selection is fully vectorized here
    (always evaluates the Ndiffuse-1 iterate candidates per seed — S·T extra
    rollouts, tiny next to the S·T·Nsample the denoise itself does).
    """
    S = rngs.shape[0]
    split1 = jax.vmap(jax.random.split)(rngs)
    rng_after, rng_reset = split1[:, 0], split1[:, 1]
    states_init = jax.vmap(env.reset)(rng_reset)
    split2 = jax.vmap(jax.random.split)(rng_after)
    rng_exp = split2[:, 0]

    sched = make_schedule(cfg.Ndiffuse, cfg.beta0, cfg.betaT)

    # states_init as a jit operand (see plan()): one compiled denoise per
    # (env, cfg, S, engine) shape, shared by every seed set through the
    # in-process and persistent compile caches
    def _build():
        def reverse_chunk(carry, steps, states_init_op):
            reverse_once = make_reverse_once_batch(env, cfg, states_init_op,
                                                   sched, S, engine=engine,
                                                   mesh=mesh)
            return jax.lax.scan(reverse_once, carry, steps)
        return reverse_chunk

    if jit:
        reverse_chunk = _cached_reverse_chunk(
            env, (astuple(cfg), engine, mesh, S), _build)
    else:
        reverse_chunk = _build()

    YN = jnp.zeros((S, cfg.Hsample, env.action_size))
    steps = jnp.arange(cfg.Ndiffuse - 1, 0, -1)
    n = steps.shape[0]
    if chunk_size <= 0:
        (_, _), (Ybars, rews_trace) = reverse_chunk((rng_exp, YN), steps,
                                                    states_init)
    else:
        carry = (rng_exp, YN)
        Ybars_l, rews_l = [], []
        pad = (-n) % chunk_size
        steps_p = jnp.concatenate([steps, jnp.ones(pad, steps.dtype)])
        for c in range(0, n + pad, chunk_size):
            carry, (Yb, rw) = reverse_chunk(carry, steps_p[c:c + chunk_size],
                                            states_init)
            Ybars_l.append(Yb)
            rews_l.append(rw)
            if progress_fn is not None:
                # report the last REAL step of the chunk (the final chunk
                # may carry padded steps whose rw is meaningless)
                progress_fn(min(c + chunk_size, n),
                            float(rw[min(chunk_size, n - c) - 1].mean()))
        Ybars = jnp.concatenate(Ybars_l)[:n]
        rews_trace = jnp.concatenate(rews_l)[:n]
    Ybars = jnp.swapaxes(Ybars, 0, 1)           # [S, T, H, nu]
    rews_trace = jnp.swapaxes(rews_trace, 0, 1)  # [S, T]

    # final evaluation + vectorized best-feasible-iterate selection
    from types import SimpleNamespace

    from ..rollout.fused import rollout_rewards

    T = n
    if engine in ("fused", "pallas"):
        def _build_cand_eval():
            def _cand_eval(q, qd, y):
                shim = SimpleNamespace(pipeline_state=SimpleNamespace(
                    q=jnp.repeat(q.T, T, axis=1),
                    qd=jnp.repeat(qd.T, T, axis=1)))
                return rollout_rewards(env, shim, y, need_states=False)
            return _cand_eval

        cand_rews, _, cand_bad = _cached_reverse_chunk(
            env, ("cand_eval", T, S), _build_cand_eval)(
            states_init.pipeline_state.q, states_init.pipeline_state.qd,
            Ybars.reshape(S * T, cfg.Hsample, env.action_size))
        cand = cand_rews.mean(axis=-1).reshape(S, T)
        cand_bad = cand_bad.reshape(S, T)
        feasible = (cand_bad == 0) & jnp.isfinite(cand)
        masked = jnp.where(feasible, cand, -jnp.inf)
        best = jnp.argmax(masked, axis=1)
        # keep the final iterate when its own rollout is clean (reference
        # semantics); fall back to the best clean iterate otherwise
        choose = jnp.where(feasible[:, -1], T - 1, best)
        any_ok = jnp.isfinite(jnp.take_along_axis(
            masked, choose[:, None], axis=1))[:, 0]
        choose = jnp.where(any_ok, choose, T - 1)
        final_reward = jnp.take_along_axis(cand, choose[:, None],
                                           axis=1)[:, 0]
        # per-seed honesty flag: True when even the chosen iterate's own
        # rollout is outside the validity envelope (no clean iterate existed)
        final_diverged = ~jnp.take_along_axis(
            feasible, choose[:, None], axis=1)[:, 0]
        Yfinal = jnp.take_along_axis(
            Ybars, choose[:, None, None, None], axis=1)[:, 0]
        Ybars = Ybars.at[:, -1].set(Yfinal)
    else:
        final_rews = jax.vmap(
            lambda s, y: rollout_us(env.step, s, y)[0])(
                states_init, Ybars[:, -1])
        final_reward = final_rews.mean(axis=-1)
        final_diverged = ~jnp.isfinite(final_reward)
    return MBDResult(Ybars=Ybars, rews_trace=rews_trace,
                     final_reward=final_reward,
                     final_diverged=final_diverged)


def plan(env, cfg: MBDConfig, rng: jax.Array, state_init=None,
         mesh: Optional[Mesh] = None, jit: bool = True,
         chunk_size: int = 0, progress_fn=None,
         engine: Optional[str] = None,
         checkpoint_path: Optional[str] = None) -> MBDResult:
    """Full reverse diffusion with a LOUD pallas→fused safety net (cf.
    ``plan_batch``); semantics in ``_plan_impl``."""
    if engine is None:
        engine = default_engine(env, mesh)
    try:
        return _plan_impl(env, cfg, rng, state_init, mesh, jit, chunk_size,
                          progress_fn, engine, checkpoint_path)
    except Exception as e:
        if engine != "pallas":
            raise
        import warnings
        if "vmem" in f"{e}".lower():
            # see plan_batch: scoped-VMEM overflow → retry under a
            # raised compiler cap before demoting to the fused engine
            from ..ops.rollout_pallas import raised_vmem_limit
            warnings.warn(
                f"pallas kernel exceeded the default scoped-VMEM cap "
                f"({type(e).__name__}); retrying with a raised "
                "vmem_limit_bytes", RuntimeWarning, stacklevel=2)
            try:
                with raised_vmem_limit():
                    return _plan_impl(env, cfg, rng, state_init, mesh,
                                      jit, chunk_size, progress_fn,
                                      "pallas", checkpoint_path)
            except Exception as e2:  # noqa: BLE001
                e = e2
        warnings.warn(
            f"pallas engine failed ({type(e).__name__}: {e}); retrying "
            "with the XLA-fused engine", RuntimeWarning, stacklevel=2)
        return _plan_impl(env, cfg, rng, state_init, mesh, jit, chunk_size,
                          progress_fn, "fused", checkpoint_path)


def _plan_impl(env, cfg: MBDConfig, rng: jax.Array, state_init,
               mesh: Optional[Mesh], jit: bool, chunk_size: int,
               progress_fn, engine: str,
               checkpoint_path: Optional[str]) -> MBDResult:
    """Run the full reverse diffusion.

    RNG layout mirrors the reference driver (mbd_planner.py:79,137-149):
    ``rng`` is split once for reset and once for the experiment stream.

    ``chunk_size > 0`` splits the Ndiffuse scan into host-loop chunks of that
    many steps (still jitted internally). Use this for very long denoises on
    physics envs: a single multi-minute XLA dispatch can trip device
    watchdogs, and chunking also enables ``progress_fn(step, mean_reward)``
    reporting. ``chunk_size = 0`` runs the whole denoise as ONE device
    program (the TPU-idiomatic default).

    ``checkpoint_path`` (requires chunking): persists the denoise state
    after every chunk and resumes from it if the file already exists —
    mid-run recovery the reference lacks (it only saves final artifacts).
    """
    rng, rng_reset = jax.random.split(rng)
    if state_init is None:
        state_init = env.reset(rng_reset)
    rng_exp, rng = jax.random.split(rng)

    sched = make_schedule(cfg.Ndiffuse, cfg.beta0, cfg.betaT)

    # state_init rides in as a jit OPERAND (the closure is built inside the
    # traced function), not a closure constant: baked-in reset states made
    # every seed a distinct HLO, so an 8-seed serial harness paid 8 full XLA
    # compiles where one suffices — as operands, every same-shape seed hits
    # the in-process and persistent compile caches
    def _build():
        def reverse_chunk(carry, steps, state_init_op):
            reverse_once = make_reverse_once(env, cfg, state_init_op, sched,
                                             mesh, engine=engine)
            return jax.lax.scan(reverse_once, carry, steps)
        return reverse_chunk

    if jit:
        reverse_chunk = _cached_reverse_chunk(
            env, (astuple(cfg), engine, mesh), _build)
    else:
        reverse_chunk = _build()

    YN = jnp.zeros((cfg.Hsample, env.action_size))
    steps = jnp.arange(cfg.Ndiffuse - 1, 0, -1)
    if chunk_size <= 0:
        (_, _), (Ybars, rews_trace) = reverse_chunk((rng_exp, YN), steps,
                                                    state_init)
    else:
        carry = (rng_exp, YN)
        Ybars_l, rews_l = [], []
        # fixed chunk shapes (pad the tail) so only one program is compiled
        n = steps.shape[0]
        pad = (-n) % chunk_size
        steps_p = jnp.concatenate([steps, jnp.ones(pad, steps.dtype)])
        # checkpoint layout: two preallocated .npy memmaps for the history
        # (per-chunk slice writes — O(chunk) IO, not O(history) rewrites) plus
        # a small meta .npz with the carry, written AFTER the history flush so
        # a mid-chunk crash only re-does that chunk
        start = 0
        Y_mm = r_mm = None
        if checkpoint_path is not None:
            import os

            import numpy as _np
            if not checkpoint_path.endswith(".npz"):
                checkpoint_path += ".npz"
            base = checkpoint_path[:-len(".npz")]
            y_path, r_path = base + ".Ybars.npy", base + ".rews.npy"
            if os.path.exists(checkpoint_path):
                meta = _np.load(checkpoint_path)
                start = int(meta["next_chunk"])
                carry = (jnp.asarray(meta["rng"]), jnp.asarray(meta["Ybar"]))
                Y_mm = _np.lib.format.open_memmap(y_path, mode="r+")
                r_mm = _np.lib.format.open_memmap(r_path, mode="r+")
                if start:
                    Ybars_l = [jnp.asarray(Y_mm[:start])]
                    rews_l = [jnp.asarray(r_mm[:start])]
            else:
                Y_mm = _np.lib.format.open_memmap(
                    y_path, mode="w+", dtype=_np.float32,
                    shape=(n + pad, cfg.Hsample, env.action_size))
                r_mm = _np.lib.format.open_memmap(
                    r_path, mode="w+", dtype=_np.float32, shape=(n + pad,))
        for c in range(start, n + pad, chunk_size):
            carry, (Yb, rw) = reverse_chunk(carry, steps_p[c:c + chunk_size],
                                            state_init)
            Ybars_l.append(Yb)
            rews_l.append(rw)
            if checkpoint_path is not None:
                import numpy as _np
                Y_mm[c:c + chunk_size] = _np.asarray(Yb)
                r_mm[c:c + chunk_size] = _np.asarray(rw)
                Y_mm.flush()
                r_mm.flush()
                _np.savez(checkpoint_path, next_chunk=c + chunk_size,
                          rng=_np.asarray(carry[0]),
                          Ybar=_np.asarray(carry[1]))
            if progress_fn is not None:
                progress_fn(min(c + chunk_size, n),
                            float(rw[min(chunk_size, n - c) - 1]))
        Ybars = jnp.concatenate(Ybars_l)[:n]
        rews_trace = jnp.concatenate(rews_l)[:n]

    # evaluate the final plan with the SAME engine used for planning (the
    # vmap path on TPU shows different f32 contraction order and can
    # diverge on trajectories the batch engines integrate fine)
    if engine in ("fused", "pallas"):
        from ..rollout.fused import rollout_rewards

        final_eval = _cached_reverse_chunk(
            env, ("final_eval",),
            lambda: lambda s, y: rollout_rewards(env, s, y,
                                                 need_states=False))
        final_rews, _, final_bad = final_eval(state_init, Ybars[-1][None])
        final_reward = final_rews[0].mean()
        final_diverged = jnp.asarray(False)
        # Best-feasible-iterate fallback: the softmax barycenter of clean
        # samples can itself sit on a divergent knife-edge in a contact-rich
        # landscape. When the final mean trajectory's own rollout flags
        # divergence, return the best NON-diverged iterate from the denoise
        # trace instead (one extra batched rollout over Ndiffuse-1 × H —
        # tiny next to the denoise itself). When NO clean iterate exists the
        # flagged reward is still returned, but final_diverged=True marks it
        # tainted — callers must surface that, never publish it as clean.
        if bool(final_bad[0]):
            cand_rews, _, cand_bad = final_eval(state_init, Ybars)
            cand = cand_rews.mean(axis=-1)
            cand = jnp.where((cand_bad == 0) & jnp.isfinite(cand), cand,
                             -jnp.inf)
            best = jnp.argmax(cand)
            if bool(jnp.isfinite(cand[best])):
                Ybars = Ybars.at[-1].set(Ybars[best])
                final_reward = cand[best]
            else:
                final_diverged = jnp.asarray(True)
    else:
        final_rews = rollout_us(env.step, state_init, Ybars[-1])[0]
        final_reward = final_rews.mean()
        final_diverged = ~jnp.isfinite(final_reward)
    return MBDResult(Ybars=Ybars, rews_trace=rews_trace,
                     final_reward=final_reward,
                     final_diverged=final_diverged)
