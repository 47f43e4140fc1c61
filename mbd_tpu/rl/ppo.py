"""PPO trainer (replacement for brax.training.agents.ppo used by the
reference at mbd/rl/train_brax.py:31-176).

TPU-first shape: one jitted ``training_iteration`` program — vectorized
unroll over num_envs persistent auto-reset envs (lax.scan over
unroll_length), GAE with truncation bootstrapping, then epochs × shuffled
minibatches of the clipped surrogate, all device-resident. Multi-chip: the
num_envs axis shards over a mesh the same way the planner's Nsample does.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from . import networks
from .wrappers import wrap_for_training


@dataclass
class PPOConfig:
    num_timesteps: int = 1_000_000
    num_evals: int = 10
    reward_scaling: float = 1.0
    episode_length: int = 1000
    normalize_observations: bool = True
    action_repeat: int = 1
    unroll_length: int = 5
    num_minibatches: int = 32
    num_updates_per_batch: int = 4
    discounting: float = 0.97
    gae_lambda: float = 0.95
    clip_epsilon: float = 0.3
    learning_rate: float = 3e-4
    entropy_cost: float = 1e-2
    num_envs: int = 2048
    batch_size: int = 2048   # kept for config parity; data is split into
    # num_minibatches equal minibatches per epoch
    num_eval_envs: int = 128
    seed: int = 0


@struct.dataclass
class PPOParams:
    policy: dict
    value: dict
    obs_stats: networks.RunningStats


@struct.dataclass
class TrainState:
    params: PPOParams
    opt_state: optax.OptState
    env_state: object
    rng: jnp.ndarray
    steps: jnp.ndarray


def train(env, cfg: PPOConfig, progress_fn: Optional[Callable] = None,
          mesh=None):
    """Returns (make_inference_fn, params, metrics_history).

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` (axis name "env") — the
    num_envs axis of the batch-last rollout state shards over it and the
    whole training iteration runs under GSPMD (data-parallel update
    collectives inserted by XLA; program semantics identical to the
    single-chip run). Requires the batch-last rollout path."""
    # Rollouts run batch-LAST through the engine's lane-packed hot path
    # whenever the env exposes it (all physics envs) — the vmap(step)
    # path (the reference's brax.training shape) stays as the fallback
    # and as the evaluation oracle. Parity: tests/test_rl_batched_env.py.
    import os

    use_batch_last = (hasattr(env, "sys") and hasattr(env, "reward_qs_b")
                      and hasattr(env, "obs_qs_b")
                      and cfg.action_repeat == 1
                      and os.environ.get("MBD_TPU_RL_ROLLOUT", "") != "vmap")
    wrapped = wrap_for_training(env, cfg.episode_length, cfg.action_repeat)
    obs_size, act_size = env.observation_size, env.action_size

    policy_net = networks.PolicyNet(action_size=act_size)
    value_net = networks.ValueNet()
    optimizer = optax.adam(cfg.learning_rate)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, k_p, k_v, k_env = jax.random.split(rng, 4)
    dummy = jnp.zeros((obs_size,))
    params = PPOParams(
        policy=policy_net.init(k_p, dummy),
        value=value_net.init(k_v, dummy),
        obs_stats=networks.RunningStats.create(obs_size))
    opt_state = optimizer.init((params.policy, params.value))

    if use_batch_last:
        from .batched_env import BatchedTrainEnv

        btenv = BatchedTrainEnv(env, cfg.episode_length)
        env_state = jax.jit(btenv.reset, static_argnums=1)(
            k_env, cfg.num_envs)
        first_state = env_state     # cached auto-reset pool (brax)
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            n_dev = mesh.devices.size
            if cfg.num_envs % n_dev != 0:
                raise ValueError(
                    f"num_envs={cfg.num_envs} must divide the mesh size "
                    f"{n_dev}")
            axis = mesh.axis_names[0]
            # q/qd are [dim, B] (B on the trailing lane axis); obs/steps
            # are [B, ...]. Placing the carry sharded makes GSPMD keep
            # every rollout/update tensor env-sharded through the jitted
            # training iteration.
            from .batched_env import BatchedEnvState
            specs = BatchedEnvState(
                q=P(None, axis), qd=P(None, axis), obs=P(axis),
                steps=P(axis))
            env_state = jax.tree.map(
                lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
                env_state, specs,
                is_leaf=lambda x: isinstance(x, jnp.ndarray))
            first_state = env_state
    else:
        if mesh is not None:
            raise ValueError("mesh training requires the batch-last "
                             "rollout path (physics envs)")
        reset_keys = jax.random.split(k_env, cfg.num_envs)
        env_state = jax.jit(jax.vmap(wrapped.reset))(reset_keys)

    def norm_obs(params: PPOParams, obs):
        if cfg.normalize_observations:
            return params.obs_stats.normalize(obs)
        return obs

    # ---------------- rollout ----------------

    def rollout(params: PPOParams, env_state, rng):
        def one_step(carry, _):
            env_state, rng = carry
            rng, k_act = jax.random.split(rng)
            obs_n = norm_obs(params, env_state.obs)
            mu, log_sig = policy_net.apply(params.policy, obs_n)
            keys = jax.random.split(k_act, cfg.num_envs)
            act, logp, pre = jax.vmap(networks.sample_action)(
                mu, log_sig, keys)
            if use_batch_last:
                next_state, rew, done, trunc = btenv.step(
                    env_state, first_state, act)
                data = dict(obs=env_state.obs, act=act, logp=logp, pre=pre,
                            reward=rew * cfg.reward_scaling,
                            done=done, truncation=trunc,
                            next_obs=next_state.obs)
            else:
                next_state = jax.vmap(wrapped.step)(env_state, act)
                data = dict(obs=env_state.obs, act=act, logp=logp, pre=pre,
                            reward=next_state.reward * cfg.reward_scaling,
                            done=next_state.done,
                            truncation=next_state.metrics["truncation"],
                            next_obs=next_state.obs)
            return (next_state, rng), data

        (env_state, rng), data = jax.lax.scan(
            one_step, (env_state, rng), None, cfg.unroll_length)
        return env_state, data      # data leaves: (T, num_envs, ...)

    # ---------------- GAE ----------------

    def compute_gae(params: PPOParams, data):
        obs_n = norm_obs(params, data["obs"])
        next_obs_n = norm_obs(params, data["next_obs"])
        v = value_net.apply(params.value, obs_n)               # (T, B)
        v_next = value_net.apply(params.value, next_obs_n)     # (T, B)
        termination = data["done"] * (1.0 - data["truncation"])

        def body(carry, xs):
            gae = carry
            delta, term, trunc = xs
            gae = delta + cfg.discounting * cfg.gae_lambda \
                * (1.0 - term) * gae
            gae = gae * (1.0 - trunc)   # do not leak across truncations
            return gae, gae

        delta = data["reward"] + cfg.discounting * v_next \
            * (1.0 - termination) - v
        _, adv = jax.lax.scan(
            body, jnp.zeros_like(delta[0]),
            (delta[::-1], termination[::-1], data["truncation"][::-1]))
        adv = adv[::-1]
        returns = adv + v
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        return adv, returns

    # ---------------- loss ----------------

    def loss_fn(nets, params: PPOParams, batch, rng):
        policy_p, value_p = nets
        obs_n = norm_obs(params, batch["obs"])
        mu, log_sig = policy_net.apply(policy_p, obs_n)
        logp = networks.log_prob(mu, log_sig, batch["pre"])
        ratio = jnp.exp(logp - batch["logp"])
        surr1 = ratio * batch["adv"]
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_epsilon,
                         1.0 + cfg.clip_epsilon) * batch["adv"]
        policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))

        v = value_net.apply(value_p, obs_n)
        value_loss = 0.5 * jnp.mean((batch["returns"] - v) ** 2)

        ent = networks.entropy_estimate(mu, log_sig, rng).mean()
        total = policy_loss + value_loss - cfg.entropy_cost * ent
        return total, dict(policy_loss=policy_loss, value_loss=value_loss,
                           entropy=ent)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # ---------------- one training iteration ----------------

    def training_iteration(ts: TrainState, _):
        rng, k_roll, k_perm, k_ent = jax.random.split(ts.rng, 4)
        env_state, data = rollout(ts.params, ts.env_state, k_roll)

        params = ts.params
        if cfg.normalize_observations:
            params = params.replace(
                obs_stats=params.obs_stats.update(data["obs"]))

        adv, returns = compute_gae(params, data)
        data = dict(obs=data["obs"], act=data["act"], logp=data["logp"],
                    pre=data["pre"], adv=adv, returns=returns)
        # flatten (T, B) → (T*B,)
        flat = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), data)
        n = cfg.unroll_length * cfg.num_envs
        mb_size = n // cfg.num_minibatches

        def epoch(carry, _):
            nets, opt_state, rng = carry
            rng, k_shuf, k_loss = jax.random.split(rng, 3)
            perm = jax.random.permutation(k_shuf, n)
            shuf = jax.tree.map(lambda x: x[perm], flat)
            mbs = jax.tree.map(
                lambda x: x[:mb_size * cfg.num_minibatches].reshape(
                    (cfg.num_minibatches, mb_size) + x.shape[1:]), shuf)

            def mb_step(carry, mb):
                nets, opt_state, rng = carry
                rng, k = jax.random.split(rng)
                (_, aux), grads = grad_fn(nets, params, mb, k)
                updates, opt_state = optimizer.update(grads, opt_state, nets)
                nets = optax.apply_updates(nets, updates)
                return (nets, opt_state, rng), aux

            (nets, opt_state, rng), aux = jax.lax.scan(
                mb_step, (nets, opt_state, rng), mbs)
            return (nets, opt_state, rng), aux

        (nets, opt_state, _), aux = jax.lax.scan(
            epoch, ((params.policy, params.value), ts.opt_state, k_perm),
            None, cfg.num_updates_per_batch)
        params = params.replace(policy=nets[0], value=nets[1])
        metrics = jax.tree.map(lambda x: x.mean(), aux)
        metrics["mean_return"] = flat["returns"].mean()
        ts = TrainState(params=params, opt_state=opt_state,
                        env_state=env_state, rng=rng,
                        steps=ts.steps + n * cfg.action_repeat)
        return ts, metrics

    # ---------------- evaluation ----------------

    def evaluate(params: PPOParams, rng):
        keys = jax.random.split(rng, cfg.num_eval_envs)
        eval_env = wrap_for_training(env, cfg.episode_length,
                                     cfg.action_repeat)
        state = jax.vmap(eval_env.reset)(keys)

        def one_step(carry, _):
            state, total, active = carry
            obs_n = norm_obs(params, state.obs)
            mu, log_sig = policy_net.apply(params.policy, obs_n)
            act = networks.deterministic_action(mu, log_sig)
            state = jax.vmap(eval_env.step)(state, act)
            total = total + state.reward * active
            active = active * (1.0 - state.done)
            return (state, total, active), None

        (_, total, _), _ = jax.lax.scan(
            one_step,
            (state, jnp.zeros(cfg.num_eval_envs),
             jnp.ones(cfg.num_eval_envs)),
            None, cfg.episode_length // cfg.action_repeat)
        return total.mean()

    evaluate = jax.jit(evaluate)

    # ---------------- training driver ----------------

    steps_per_iter = cfg.num_envs * cfg.unroll_length * cfg.action_repeat
    num_iters = max(cfg.num_timesteps // steps_per_iter, 1)
    iters_per_eval = max(num_iters // max(cfg.num_evals, 1), 1)

    run_block = jax.jit(lambda ts: jax.lax.scan(
        training_iteration, ts, None, iters_per_eval))

    ts = TrainState(params=params, opt_state=opt_state,
                    env_state=env_state, rng=rng, steps=jnp.zeros((), int))
    history = []
    done_iters = 0
    while done_iters < num_iters:
        ts, metrics = run_block(ts)
        done_iters += iters_per_eval
        rng, k_eval = jax.random.split(rng)
        eval_rew = float(evaluate(ts.params, k_eval))
        entry = {"num_steps": int(ts.steps),
                 "eval/episode_reward": eval_rew}
        history.append(entry)
        if progress_fn is not None:
            progress_fn(int(ts.steps), entry)

    def make_inference_fn(params: PPOParams, deterministic: bool = True):
        def inference(obs, rng=None):
            obs_n = norm_obs(params, obs)
            mu, log_sig = policy_net.apply(params.policy, obs_n)
            if deterministic:
                return networks.deterministic_action(mu, log_sig)
            act, _, _ = networks.sample_action(mu, log_sig, rng)
            return act
        return inference

    return make_inference_fn, ts.params, history
