"""Horizon rollout primitives.

Equivalents of the reference's mbd/utils.py:6-20 (``eval_us`` /
``rollout_us``): a ``lax.scan`` of the env step over a control sequence.
The step function stays opaque so planners can batch these with ``vmap``
and shard the sample axis over a device mesh.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

StepFn = Callable[[Any, jax.Array], Any]


def eval_us(step_fn: StepFn, state, us: jax.Array) -> jax.Array:
    """Per-step rewards of rolling controls ``us`` (H, nu) from ``state``."""

    def body(s, u):
        s = step_fn(s, u)
        return s, s.reward

    _, rews = jax.lax.scan(body, state, us)
    return rews


def rollout_us(step_fn: StepFn, state, us: jax.Array):
    """Rewards plus the stacked pipeline-state pytree (for demo scoring)."""

    def body(s, u):
        s = step_fn(s, u)
        return s, (s.reward, s.pipeline_state)

    _, (rews, pipeline_states) = jax.lax.scan(body, state, us)
    return rews, pipeline_states


def rollout_states(step_fn: StepFn, state, us: jax.Array):
    """Full State pytree stacked over the horizon (for visualization)."""

    def body(s, u):
        s = step_fn(s, u)
        return s, s

    _, states = jax.lax.scan(body, state, us)
    return states
