"""PhysicsEnv: base class for engine-backed environments.

Mirrors the contract the reference gets from ``brax.envs.base.PipelineEnv``
(used at e.g. mbd/envs/hopper.py:4,18: ``pipeline_init``, ``pipeline_step``
with ``n_frames`` substeps, ``dt = sys.dt * n_frames``, sizes).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..sim import pipeline
from ..sim.system import System, load_mjcf
from .base import Env

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")


def asset_path(name: str) -> str:
    return os.path.join(ASSET_DIR, name)


class PhysicsEnv(Env):
    def __init__(self, sys: System, n_frames: int):
        self.sys = sys
        self.n_frames = n_frames

    @classmethod
    def from_xml(cls, xml_name: str, n_frames: int, **kwargs):
        return cls(load_mjcf(asset_path(xml_name)), n_frames, **kwargs)

    @property
    def dt(self):
        return float(self.sys.dt) * self.n_frames

    def pipeline_init(self, q: jnp.ndarray,
                      qd: jnp.ndarray) -> pipeline.PipelineState:
        return pipeline.pipeline_init(self.sys, q, qd)

    def pipeline_step(self, ps: pipeline.PipelineState,
                      action: jnp.ndarray) -> pipeline.PipelineState:
        return pipeline.pipeline_step(self.sys, ps, action, self.n_frames)

    @property
    def action_size(self) -> int:
        return self.sys.nu

    @property
    def observation_size(self) -> int:
        obs = jax.eval_shape(self.reset, jax.random.PRNGKey(0)).obs
        return int(obs.shape[-1])

    # --- fused-rollout interface (rollout/fused.py) ---

    def traj_reward(self, ps_stack, us, ps0) -> jnp.ndarray:
        """Per-step rewards [H, B] over a stacked trajectory whose leaves
        have leading [H, B] axes. Default: the per-state reward formula;
        envs whose reward depends on the previous state override this."""
        return jax.vmap(jax.vmap(self._reward))(ps_stack)

    # --- batch-last RL training interface (rl/batched_env.py) ---
    # Counterparts of _obs / step-done as pure batch-last q/qd functions,
    # mirroring how reward_qs_b shortcuts _reward (torso pose from q for
    # these morphologies — verified vs FK by the fused-engine tests).

    def obs_qs_b(self, q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
        """Observation [obs, B] from batch-last q [nq, B] / qd [nv, B].
        Default: [q, qd] (humanoidrun/humanoidstandup/pushT _obs)."""
        return jnp.concatenate([q, qd], axis=0)

    def rl_done_qs_b(self, q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
        """Per-step termination flags [B] from the post-step state.
        Default: episodes never self-terminate (hopper/walker2d/
        halfcheetah/humanoid step() always returns done=0)."""
        return jnp.zeros(q.shape[1:], q.dtype)
