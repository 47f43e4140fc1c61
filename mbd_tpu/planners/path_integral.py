"""Zeroth-order path-integral baselines: MPPI, CMA-ES, CEM.

Semantics from the reference (mbd/planners/path_integral.py:33-141): iterate
Nrefine times; each iteration samples Nsample control sequences around the
running mean with a fixed σ=1 (CMA-ES adapts σ), rolls them out, softmax-
weights mean per-step rewards at ``temp_sample``, and applies the chosen
update rule:

  * mppi   — softmax-weighted barycenter (reference :33-36)
  * cma-es — barycenter + σ ← mean(sqrt(Σ w·err²))·σ, floored at 1e-3 (:39-45)
  * cem    — mean of the top-10 samples by weight (:48-52)

Like the MBD planner, the whole refinement loop runs as one ``lax.scan``
device program with the sample axis shardable over a mesh.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..parallel.mesh import sample_sharding
from ..rollout import eval_us
from .mbd import (HSAMPLE_RECOMMEND, NSAMPLE_RECOMMEND, TEMP_RECOMMEND)

NREFINE_RECOMMEND = {"pushT": 200, "humanoidrun": 300}


@dataclass
class PathIntegralConfig:
    update_method: str = "mppi"   # mppi | cma-es | cem
    Nsample: int = 2048
    Hsample: int = 50
    Nrefine: int = 100
    temp_sample: float = 0.1
    cem_elite: int = 10


def recommended_config(env_name: str,
                       base: Optional[PathIntegralConfig] = None
                       ) -> PathIntegralConfig:
    cfg = base or PathIntegralConfig()
    return PathIntegralConfig(
        update_method=cfg.update_method,
        Nsample=NSAMPLE_RECOMMEND.get(env_name, cfg.Nsample),
        Hsample=HSAMPLE_RECOMMEND.get(env_name, cfg.Hsample),
        Nrefine=NREFINE_RECOMMEND.get(env_name, cfg.Nrefine),
        temp_sample=TEMP_RECOMMEND.get(env_name, cfg.temp_sample),
        cem_elite=cfg.cem_elite,
    )


def softmax_update(weights, Y0s, sigma, mu_0t, cfg, valid=None):
    mu = jnp.einsum("n,nij->ij", weights, Y0s)
    return mu, sigma


def cma_es_update(weights, Y0s, sigma, mu_0t, cfg, valid=None):
    # demoted samples carry zero weight (the caller masks them before the
    # softmax), so they contribute to neither the barycenter nor the
    # σ adaptation
    mu = jnp.einsum("n,nij->ij", weights, Y0s)
    err = Y0s - mu_0t
    sigma = jnp.sqrt(jnp.einsum("n,nij->ij", weights, err ** 2)).mean() * sigma
    return mu, jnp.maximum(sigma, 1e-3)


def cem_update(weights, Y0s, sigma, mu_0t, cfg, valid=None):
    # top-k by weight == top-k by reward (softmax is monotone). Demoted
    # samples have exactly zero weight; rank them strictly below every
    # clean sample and mask them out of the elite mean, so a
    # majority-diverged batch can't admit diverged elites (it falls back
    # to however many clean samples exist).
    if valid is None:
        _, idx = jax.lax.top_k(weights, cfg.cem_elite)
        return jnp.mean(Y0s[idx], axis=0), sigma
    ranked = jnp.where(valid, weights, -1.0)
    w_sel, idx = jax.lax.top_k(ranked, cfg.cem_elite)
    sel_ok = (w_sel >= 0.0).astype(Y0s.dtype)
    denom = jnp.maximum(sel_ok.sum(), 1.0)
    mu_clean = jnp.einsum("k,kij->ij", sel_ok, Y0s[idx]) / denom
    # zero clean samples anywhere: keep the plain elite mean (finite)
    mu = jnp.where(sel_ok.sum() > 0, mu_clean, jnp.mean(Y0s[idx], axis=0))
    return mu, sigma


_UPDATE_FNS = {"mppi": softmax_update, "cma-es": cma_es_update,
               "cem": cem_update}


@dataclass
class PathIntegralResult:
    mu_0ts: jax.Array
    rews_trace: jax.Array
    final_reward: jax.Array
    # True when the returned plan's rollout is flagged by the engine's
    # validity envelope and no clean iterate existed (cf. mbd.MBDResult)
    final_diverged: jax.Array = None


def plan_batch(env, cfg: PathIntegralConfig, rngs: jax.Array,
               jit: bool = True,
               engine: Optional[str] = None) -> PathIntegralResult:
    """S independent refinements as one batched device program (cf.
    mbd.plan_batch): seeds fold into the engines' sample axis, each seed
    rolling out from its own reset state; softmax/update-rule reductions
    are per-seed. Returns a PathIntegralResult with a leading seed axis.

    Per-seed RNG chains match ``plan(rng=rngs[s])``, so results agree with
    the serial harness to f32 rollout tolerance.
    """
    from types import SimpleNamespace

    if engine is None:
        from .mbd import default_engine
        engine = default_engine(env)
    update_fn = _UPDATE_FNS[cfg.update_method]
    nu = env.action_size
    S, N = rngs.shape[0], cfg.Nsample

    split1 = jax.vmap(jax.random.split)(rngs)
    rng_after, rng_reset = split1[:, 0], split1[:, 1]
    states_init = jax.vmap(env.reset)(rng_reset)
    split2 = jax.vmap(jax.random.split)(rng_after)
    rng_exp = split2[:, 0]

    def make_batch_eval(states_init_op):
        # built from operand states inside the traced refine (see
        # planners/mbd.py — operand reset states mean one compiled program
        # per (env, cfg, S, engine), shared across seed sets)
        if engine in ("fused", "pallas"):
            b_tile = min(2048, ((S * N + 7) // 8) * 8)
            shim = SimpleNamespace(pipeline_state=SimpleNamespace(
                q=jnp.repeat(states_init_op.pipeline_state.q.T, N, axis=1),
                qd=jnp.repeat(states_init_op.pipeline_state.qd.T, N,
                              axis=1)))
            if engine == "pallas":
                from ..ops.rollout_pallas import rollout_rewards_pallas

                def batch_eval(Y0s):
                    rews, bad = rollout_rewards_pallas(
                        env, shim, Y0s.reshape(S * N, cfg.Hsample, nu),
                        b_tile=b_tile)
                    return (rews.mean(axis=-1).reshape(S, N),
                            bad.reshape(S, N))
            else:
                from ..rollout.fused import rollout_rewards

                def batch_eval(Y0s):
                    rews, _, bad = rollout_rewards(
                        env, shim, Y0s.reshape(S * N, cfg.Hsample, nu))
                    return (rews.mean(axis=-1).reshape(S, N),
                            bad.reshape(S, N))
        else:
            _ev = jax.vmap(jax.vmap(functools.partial(eval_us, env.step),
                                    in_axes=(None, 0)), in_axes=(0, 0))

            def batch_eval(Y0s):
                return _ev(states_init_op, Y0s).mean(axis=-1), None
        return batch_eval

    batched_update = jax.vmap(
        lambda w, y, s, m, v: update_fn(w, y, s, m, cfg, valid=v))

    def refine(rng_batch, states_init_op):
        batch_eval = make_batch_eval(states_init_op)

        def update_once(carry, _):
            rngs_c, mu_0t, sigma = carry            # [S,2], [S,H,nu], [S]
            split = jax.vmap(jax.random.split)(rngs_c)
            rngs_next, keys = split[:, 0], split[:, 1]
            eps = jax.vmap(lambda k: jax.random.normal(
                k, (N, cfg.Hsample, nu)))(keys) * sigma[:, None, None, None]
            Y0s = jnp.clip(eps + mu_0t[:, None], -1.0, 1.0)

            rews, diverged = batch_eval(Y0s)
            valid = jnp.isfinite(rews)
            if diverged is not None:
                valid = valid & (diverged == 0)
            worst = jnp.min(jnp.where(valid, rews, jnp.inf), axis=1,
                            keepdims=True)
            worst = jnp.where(jnp.isfinite(worst), worst, 0.0)
            rews = jnp.where(valid, rews, worst)
            rew_std = rews.std(axis=1, keepdims=True)
            rew_std = jnp.where(rew_std < 1e-4, 1.0, rew_std)
            logp0 = (rews - rews.mean(axis=1, keepdims=True)) / rew_std \
                / cfg.temp_sample
            # zero weight for flagged samples (cf. planners/mbd.py)
            n_valid = valid.sum(axis=1, keepdims=True)
            logp0 = jnp.where(valid, logp0, -jnp.inf)
            weights = jax.nn.softmax(logp0, axis=1)
            weights = jnp.where(n_valid > 0, weights,
                                jnp.full_like(weights,
                                              1.0 / weights.shape[1]))
            mu_0tm1, sigma = batched_update(weights, Y0s, sigma, mu_0t,
                                            valid)
            return (rngs_next, mu_0tm1, sigma), (mu_0tm1, rews.mean(axis=1))

        mu_0T = jnp.zeros((S, cfg.Hsample, nu))
        carry = (rng_batch, mu_0T, jnp.ones(S))
        _, (mu_0ts, rews_trace) = jax.lax.scan(
            update_once, carry, None, length=cfg.Nrefine - 1)
        return mu_0ts, rews_trace

    if jit:
        from .mbd import _cached_reverse_chunk
        from dataclasses import astuple
        refine = _cached_reverse_chunk(
            env, ("pi_batch", astuple(cfg), engine, S), lambda: refine)
    mu_0ts, rews_trace = refine(rng_exp, states_init)
    mu_0ts = jnp.swapaxes(mu_0ts, 0, 1)             # [S, T, H, nu]
    rews_trace = jnp.swapaxes(rews_trace, 0, 1)

    T = cfg.Nrefine - 1
    if engine in ("fused", "pallas"):
        from ..rollout.fused import rollout_rewards

        def _cand_eval(q, qd, y):
            shim_t = SimpleNamespace(pipeline_state=SimpleNamespace(
                q=jnp.repeat(q.T, T, axis=1),
                qd=jnp.repeat(qd.T, T, axis=1)))
            return rollout_rewards(env, shim_t, y, need_states=False)

        cand_rews, _, cand_bad = jax.jit(_cand_eval)(
            states_init.pipeline_state.q, states_init.pipeline_state.qd,
            mu_0ts.reshape(S * T, cfg.Hsample, nu))
        cand = cand_rews.mean(axis=-1).reshape(S, T)
        cand_bad = cand_bad.reshape(S, T)
        feasible = (cand_bad == 0) & jnp.isfinite(cand)
        masked = jnp.where(feasible, cand, -jnp.inf)
        best = jnp.argmax(masked, axis=1)
        choose = jnp.where(feasible[:, -1], T - 1, best)
        any_ok = jnp.isfinite(jnp.take_along_axis(
            masked, choose[:, None], axis=1))[:, 0]
        choose = jnp.where(any_ok, choose, T - 1)
        final_reward = jnp.take_along_axis(cand, choose[:, None],
                                           axis=1)[:, 0]
        final_diverged = ~jnp.take_along_axis(
            feasible, choose[:, None], axis=1)[:, 0]
        mu_final = jnp.take_along_axis(
            mu_0ts, choose[:, None, None, None], axis=1)[:, 0]
        mu_0ts = mu_0ts.at[:, -1].set(mu_final)
    else:
        final_rews = jax.vmap(
            lambda s, y: eval_us(env.step, s, y))(
                states_init, mu_0ts[:, -1])
        final_reward = final_rews.mean(axis=-1)
        final_diverged = ~jnp.isfinite(final_reward)
    return PathIntegralResult(mu_0ts=mu_0ts, rews_trace=rews_trace,
                              final_reward=final_reward,
                              final_diverged=final_diverged)


def plan(env, cfg: PathIntegralConfig, rng: jax.Array, state_init=None,
         mesh: Optional[Mesh] = None, jit: bool = True,
         engine: Optional[str] = None) -> PathIntegralResult:
    if engine is None:
        from .mbd import default_engine
        engine = default_engine(env, mesh)
    update_fn = _UPDATE_FNS[cfg.update_method]
    nu = env.action_size

    rng, rng_reset = jax.random.split(rng)
    if state_init is None:
        state_init = env.reset(rng_reset)
    rng_exp, rng = jax.random.split(rng)

    if engine in ("fused", "pallas"):
        n_loc = (cfg.Nsample // mesh.devices.size if mesh is not None
                 else cfg.Nsample)
        # 2048-sample tiles measured 22% faster than 1024 on the
        # humanoid kernel (tools/probe_vmem.py, v5e; needs the
        # raised scoped-VMEM cap that rollout_pallas auto-applies
        # for super-default tiles); 4096 was slightly slower
        b_tile = min(2048, ((n_loc + 7) // 8) * 8)
        if engine == "pallas":
            from ..ops.rollout_pallas import rollout_rewards_pallas

            def _eval_local(s, y):
                rews, bad = rollout_rewards_pallas(env, s, y, b_tile=b_tile)
                return rews.mean(axis=-1), bad
        else:
            from ..rollout.fused import rollout_rewards

            def _eval_local(s, y):
                rews, _, bad = rollout_rewards(env, s, y)
                return rews.mean(axis=-1), bad
        if mesh is not None:
            # per-sample rollout stays device-local under shard_map (the
            # pallas_call cannot auto-partition, and the fused engine's lane
            # packing must not be "solved" by a GSPMD all-gather); only the
            # [n] reward/diverged vectors leave the region — cf. planners/mbd.py.
            # The state rides in replicated (P() prefix) so it can be a jit
            # operand rather than a baked-in constant.
            from jax.sharding import PartitionSpec as P
            axis = mesh.axis_names[0]
            batch_eval = jax.shard_map(
                _eval_local, mesh=mesh, in_specs=(P(), P(axis)),
                out_specs=(P(axis), P(axis)),
                check_vma=False)  # pallas out_shapes carry no vma metadata
        else:
            batch_eval = _eval_local
        eval_final = _eval_local   # final/candidate evals are tiny-N, unsharded
    else:
        _ev = jax.vmap(functools.partial(eval_us, env.step),
                       in_axes=(None, 0))
        batch_eval = lambda s, y: (_ev(s, y).mean(axis=-1), None)  # noqa: E731
        eval_final = batch_eval
    shard = sample_sharding(mesh) if mesh is not None else None

    def make_update_once(state_init_op):
        def update_once(carry, _):
            rng, mu_0t, sigma = carry
            rng, key = jax.random.split(rng)
            eps = jax.random.normal(key,
                                    (cfg.Nsample, cfg.Hsample, nu)) * sigma
            Y0s = jnp.clip(eps + mu_0t, -1.0, 1.0)
            if shard is not None:
                Y0s = jax.lax.with_sharding_constraint(Y0s, shard)

            rews, diverged = batch_eval(state_init_op, Y0s)
            # diverged-rollout guard (cf. planners/mbd.py)
            valid = jnp.isfinite(rews)
            if diverged is not None:
                valid = valid & (diverged == 0)
            worst = jnp.min(jnp.where(valid, rews, jnp.inf))
            worst = jnp.where(jnp.isfinite(worst), worst, 0.0)
            rews = jnp.where(valid, rews, worst)
            # std guard: the reference MBD planner guards this
            # (mbd_planner.py:111) but its path_integral does not and NaNs
            # on a flat reward landscape; we guard both.
            rew_std = rews.std()
            rew_std = jnp.where(rew_std < 1e-4, 1.0, rew_std)
            logp0 = (rews - rews.mean()) / rew_std / cfg.temp_sample
            # zero weight for flagged samples (cf. planners/mbd.py)
            n_valid = valid.sum()
            logp0 = jnp.where(valid, logp0, -jnp.inf)
            weights = jax.nn.softmax(logp0)
            weights = jnp.where(n_valid > 0, weights,
                                jnp.full_like(weights,
                                              1.0 / weights.shape[0]))
            mu_0tm1, sigma = update_fn(weights, Y0s, sigma, mu_0t, cfg,
                                       valid=valid)
            return (rng, mu_0tm1, sigma), (mu_0tm1, rews.mean())
        return update_once

    def refine(rng, state_init_op):
        mu_0T = jnp.zeros((cfg.Hsample, nu))
        carry = (rng, mu_0T, jnp.asarray(1.0))
        _, (mu_0ts, rews_trace) = jax.lax.scan(
            make_update_once(state_init_op), carry, None,
            length=cfg.Nrefine - 1)
        return mu_0ts, rews_trace

    if jit:
        from .mbd import _cached_reverse_chunk
        from dataclasses import astuple
        refine = _cached_reverse_chunk(
            env, ("pi_serial", astuple(cfg), engine, mesh), lambda: refine)
    mu_0ts, rews_trace = refine(rng_exp, state_init)

    if engine in ("fused", "pallas"):
        from .mbd import _cached_reverse_chunk
        eval_final_jit = _cached_reverse_chunk(
            env, ("pi_final_eval", engine, b_tile), lambda: eval_final)
        final_rews, final_bad = eval_final_jit(state_init,
                                               mu_0ts[-1][None])
        final_reward = final_rews[0]
        final_diverged = jnp.asarray(False)
        # best-feasible-iterate fallback (cf. planners/mbd.py): if the final
        # mean trajectory's own rollout diverges, return the best
        # non-diverged iterate from the refine trace; with no clean iterate
        # the flagged reward is returned with final_diverged=True
        if final_bad is not None and bool(final_bad[0]):
            cand, cand_bad = eval_final_jit(state_init, mu_0ts)
            cand = jnp.where((cand_bad == 0) & jnp.isfinite(cand), cand,
                             -jnp.inf)
            best = jnp.argmax(cand)
            if bool(jnp.isfinite(cand[best])):
                mu_0ts = mu_0ts.at[-1].set(mu_0ts[best])
                final_reward = cand[best]
            else:
                final_diverged = jnp.asarray(True)
    else:
        final_rews = eval_us(env.step, state_init, mu_0ts[-1])
        final_reward = final_rews.mean()
        final_diverged = ~jnp.isfinite(final_reward)
    return PathIntegralResult(mu_0ts=mu_0ts, rews_trace=rews_trace,
                              final_reward=final_reward,
                              final_diverged=final_diverged)
