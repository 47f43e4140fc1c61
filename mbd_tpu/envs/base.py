"""Environment base contract for the TPU-native MBD framework.

Mirrors the surface the reference planners consume (see
mbd/planners/mbd_planner.py:71-80 and mbd/utils.py:6-20 in the reference):
every env exposes ``reset(rng) -> State``, ``step(State, action) -> State``,
``observation_size``, ``action_size`` and, for physics envs, ``sys`` / ``dt``.
Demo-capable envs additionally expose ``eval_xref_logpd``, ``xref``,
``rew_xref``.

``State`` is a flax pytree so whole rollouts can be stacked by ``lax.scan``
and sharded across device meshes without host round-trips.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from flax import struct


@struct.dataclass
class State:
    """Planner-facing environment state (a pytree).

    ``pipeline_state`` is whatever the underlying dynamics carries — a raw
    coordinate vector for analytic envs (car2d) or a ``sim.PipelineState``
    for physics envs.
    """

    pipeline_state: Any
    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    metrics: Dict[str, jax.Array] = struct.field(default_factory=dict)


class Env:
    """Base class: subclasses implement reset/step and size properties."""

    def reset(self, rng: jax.Array) -> State:
        raise NotImplementedError

    def step(self, state: State, action: jax.Array) -> State:
        raise NotImplementedError

    @property
    def observation_size(self) -> int:
        raise NotImplementedError

    @property
    def action_size(self) -> int:
        raise NotImplementedError
