"""SAC trainer (replacement for brax.training.agents.sac; the reference
uses it for hopper at mbd/rl/train_brax.py:50-67).

Device-resident circular replay buffer, twin Q with target smoothing,
adaptive temperature. One jitted ``training_step`` = env step (num_envs
parallel) + buffer insert + grad_updates_per_step SGD updates.
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
class SACConfig:
    num_timesteps: int = 1_000_000
    num_evals: int = 20
    reward_scaling: float = 1.0
    episode_length: int = 1000
    normalize_observations: bool = True
    action_repeat: int = 1
    discounting: float = 0.99
    learning_rate: float = 6e-4
    num_envs: int = 128
    batch_size: int = 512
    grad_updates_per_step: int = 64
    max_replay_size: int = 1_048_576
    min_replay_size: int = 8192
    tau: float = 0.005
    num_eval_envs: int = 128
    seed: int = 0


@struct.dataclass
class Replay:
    obs: jnp.ndarray
    act: jnp.ndarray
    reward: jnp.ndarray
    next_obs: jnp.ndarray
    discount: jnp.ndarray
    pos: jnp.ndarray
    size: jnp.ndarray

    @classmethod
    def create(cls, cap, obs_size, act_size):
        return cls(obs=jnp.zeros((cap, obs_size)),
                   act=jnp.zeros((cap, act_size)),
                   reward=jnp.zeros(cap), next_obs=jnp.zeros((cap, obs_size)),
                   discount=jnp.zeros(cap),
                   pos=jnp.zeros((), int), size=jnp.zeros((), int))

    def insert(self, obs, act, reward, next_obs, discount):
        n = obs.shape[0]
        cap = self.obs.shape[0]
        idx = (self.pos + jnp.arange(n)) % cap
        return self.replace(
            obs=self.obs.at[idx].set(obs),
            act=self.act.at[idx].set(act),
            reward=self.reward.at[idx].set(reward),
            next_obs=self.next_obs.at[idx].set(next_obs),
            discount=self.discount.at[idx].set(discount),
            pos=(self.pos + n) % cap,
            size=jnp.minimum(self.size + n, cap))

    def sample(self, rng, batch_size):
        idx = jax.random.randint(rng, (batch_size,), 0,
                                 jnp.maximum(self.size, 1))
        return dict(obs=self.obs[idx], act=self.act[idx],
                    reward=self.reward[idx], next_obs=self.next_obs[idx],
                    discount=self.discount[idx])


@struct.dataclass
class SACParams:
    policy: dict
    q: dict
    q_target: dict
    log_alpha: jnp.ndarray
    obs_stats: networks.RunningStats


def train(env, cfg: SACConfig, progress_fn: Optional[Callable] = None):
    wrapped = wrap_for_training(env, cfg.episode_length, cfg.action_repeat)
    obs_size, act_size = env.observation_size, env.action_size
    policy_net = networks.PolicyNet(action_size=act_size,
                                    hidden=(256, 256))
    q_net = networks.QNet()
    target_entropy = -0.5 * act_size

    p_opt = optax.adam(cfg.learning_rate)
    q_opt = optax.adam(cfg.learning_rate)
    a_opt = optax.adam(cfg.learning_rate)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, k_p, k_q, k_env = jax.random.split(rng, 4)
    dummy_o, dummy_a = jnp.zeros((obs_size,)), jnp.zeros((act_size,))
    q0 = q_net.init(k_q, dummy_o, dummy_a)
    params = SACParams(
        policy=policy_net.init(k_p, dummy_o), q=q0,
        q_target=jax.tree.map(jnp.copy, q0),
        log_alpha=jnp.zeros(()),
        obs_stats=networks.RunningStats.create(obs_size))
    opt_states = (p_opt.init(params.policy), q_opt.init(params.q),
                  a_opt.init(params.log_alpha))

    env_state = jax.jit(jax.vmap(wrapped.reset))(
        jax.random.split(k_env, cfg.num_envs))
    replay = Replay.create(cfg.max_replay_size, obs_size, act_size)

    def norm(params, obs):
        return params.obs_stats.normalize(obs) \
            if cfg.normalize_observations else obs

    def env_step(params, env_state, rng):
        obs_n = norm(params, env_state.obs)
        mu, ls = policy_net.apply(params.policy, obs_n)
        act, _, _ = jax.vmap(networks.sample_action)(
            mu, ls, jax.random.split(rng, cfg.num_envs))
        next_state = jax.vmap(wrapped.step)(env_state, act)
        termination = next_state.done * \
            (1.0 - next_state.metrics["truncation"])
        return next_state, dict(
            obs=env_state.obs, act=act,
            reward=next_state.reward * cfg.reward_scaling,
            next_obs=next_state.obs,
            discount=1.0 - termination)

    def critic_loss(q_params, params, batch, rng):
        obs_n = norm(params, batch["obs"])
        next_n = norm(params, batch["next_obs"])
        mu, ls = policy_net.apply(params.policy, next_n)
        next_act, next_logp, _ = networks.sample_action(mu, ls, rng)
        q1t, q2t = q_net.apply(params.q_target, next_n, next_act)
        alpha = jnp.exp(params.log_alpha)
        target = batch["reward"] + cfg.discounting * batch["discount"] * (
            jnp.minimum(q1t, q2t) - alpha * next_logp)
        q1, q2 = q_net.apply(q_params, obs_n, batch["act"])
        target = jax.lax.stop_gradient(target)
        return 0.5 * ((q1 - target) ** 2 + (q2 - target) ** 2).mean()

    def actor_loss(policy_params, params, batch, rng):
        obs_n = norm(params, batch["obs"])
        mu, ls = policy_net.apply(policy_params, obs_n)
        act, logp, _ = networks.sample_action(mu, ls, rng)
        q1, q2 = q_net.apply(params.q, obs_n, act)
        alpha = jnp.exp(params.log_alpha)
        return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

    def alpha_loss(log_alpha, logp):
        return (-jnp.exp(log_alpha) *
                jax.lax.stop_gradient(logp + target_entropy)).mean()

    def sgd_step(carry, _):
        params, opt_states, replay, rng = carry
        rng, k_s, k_c, k_a = jax.random.split(rng, 4)
        batch = replay.sample(k_s, cfg.batch_size)

        qg = jax.grad(critic_loss)(params.q, params, batch, k_c)
        up, qs = q_opt.update(qg, opt_states[1], params.q)
        params = params.replace(q=optax.apply_updates(params.q, up))

        (pg, logp) = jax.grad(actor_loss, has_aux=True)(
            params.policy, params, batch, k_a)
        up, ps = p_opt.update(pg, opt_states[0], params.policy)
        params = params.replace(
            policy=optax.apply_updates(params.policy, up))

        ag = jax.grad(alpha_loss)(params.log_alpha, logp)
        up, as_ = a_opt.update(ag, opt_states[2], params.log_alpha)
        params = params.replace(
            log_alpha=optax.apply_updates(params.log_alpha, up),
            q_target=jax.tree.map(
                lambda t, o: t * (1 - cfg.tau) + o * cfg.tau,
                params.q_target, params.q))
        return (params, (ps, qs, as_), replay, rng), None

    def training_step(carry, _):
        params, opt_states, env_state, replay, rng = carry
        rng, k_env, k_sgd = jax.random.split(rng, 3)
        env_state, tr = env_step(params, env_state, k_env)
        if cfg.normalize_observations:
            params = params.replace(
                obs_stats=params.obs_stats.update(tr["obs"]))
        replay = replay.insert(tr["obs"], tr["act"], tr["reward"],
                               tr["next_obs"], tr["discount"])
        (params, opt_states, replay, _), _ = jax.lax.scan(
            sgd_step, (params, opt_states, replay, k_sgd), None,
            cfg.grad_updates_per_step)
        return (params, opt_states, env_state, replay, rng), None

    # prefill without gradient updates
    def prefill_step(carry, _):
        params, env_state, replay, rng = carry
        rng, k = jax.random.split(rng)
        env_state, tr = env_step(params, env_state, k)
        replay = replay.insert(tr["obs"], tr["act"], tr["reward"],
                               tr["next_obs"], tr["discount"])
        return (params, env_state, replay, rng), None

    prefill_iters = max(cfg.min_replay_size // cfg.num_envs, 1)
    prefill = jax.jit(lambda c: jax.lax.scan(prefill_step, c, None,
                                             prefill_iters))
    (params, env_state, replay, rng), _ = prefill(
        (params, env_state, replay, rng))

    steps_per_iter = cfg.num_envs * cfg.action_repeat
    num_iters = max(
        (cfg.num_timesteps - prefill_iters * steps_per_iter)
        // steps_per_iter, 1)
    iters_per_eval = max(num_iters // max(cfg.num_evals, 1), 1)
    run_block = jax.jit(lambda c: jax.lax.scan(training_step, c, None,
                                               iters_per_eval))

    def evaluate(params, rng):
        eval_env = wrap_for_training(env, cfg.episode_length,
                                     cfg.action_repeat)
        state = jax.vmap(eval_env.reset)(
            jax.random.split(rng, cfg.num_eval_envs))

        def one(carry, _):
            state, total, active = carry
            mu, ls = policy_net.apply(params.policy, norm(params, state.obs))
            state = jax.vmap(eval_env.step)(
                state, networks.deterministic_action(mu, ls))
            total = total + state.reward * active
            active = active * (1.0 - state.done)
            return (state, total, active), None

        (_, total, _), _ = jax.lax.scan(
            one, (state, jnp.zeros(cfg.num_eval_envs),
                  jnp.ones(cfg.num_eval_envs)), None,
            cfg.episode_length // cfg.action_repeat)
        return total.mean()

    evaluate = jax.jit(evaluate)

    history = []
    carry = (params, opt_states, env_state, replay, rng)
    done = 0
    while done < num_iters:
        carry, _ = run_block(carry)
        done += iters_per_eval
        params = carry[0]
        rng, k_eval = jax.random.split(carry[4])
        eval_rew = float(evaluate(params, k_eval))
        steps = (prefill_iters + done) * steps_per_iter
        entry = {"num_steps": steps, "eval/episode_reward": eval_rew}
        history.append(entry)
        if progress_fn is not None:
            progress_fn(steps, entry)

    def make_inference_fn(params, deterministic: bool = True):
        def inference(obs, rng=None):
            mu, ls = policy_net.apply(params.policy, norm(params, obs))
            if deterministic:
                return networks.deterministic_action(mu, ls)
            return networks.sample_action(mu, ls, rng)[0]
        return inference

    return make_inference_fn, params, history
