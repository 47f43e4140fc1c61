"""Car2d: analytic Dubins-style 2D navigation env with circular obstacles.

Behavioral spec from the reference env (mbd/envs/car2d.py):
 - state q = (px, py, theta); controls u = (steer, throttle) in [-1, 1]
 - dynamics: ẋ = 3·u1·sin(θ), ẏ = 3·u1·cos(θ), θ̇ = (2π/3)·u0  (car2d.py:10-19)
 - RK4 integration, dt = 0.1 (car2d.py:22-27)
 - 11 circular obstacles of radius 0.3 forming a U-shape (car2d.py:47-63)
 - a step that would collide is rejected: the state freezes (car2d.py:82-84)
 - reward = 1 - (clip(||p - goal||, 0, 0.2)/0.2)^2 (car2d.py:88-93)
 - demo: RRT reference path of 50 (x, y) waypoints; eval_xref_logpd is the
   mean squared clipped tracking error (car2d.py:95-102)

This env is self-contained (no physics engine) and doubles as the CPU-fast
end-to-end test vehicle for the planner stack.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .base import Env, State

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")


def _dynamics(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    sin_t, cos_t = jnp.sin(x[2]), jnp.cos(x[2])
    return jnp.stack([
        3.0 * u[1] * sin_t,
        3.0 * u[1] * cos_t,
        u[0] * (2.0 * jnp.pi / 3.0),
    ])


def _rk4(x: jnp.ndarray, u: jnp.ndarray, dt: float) -> jnp.ndarray:
    k1 = _dynamics(x, u)
    k2 = _dynamics(x + 0.5 * dt * k1, u)
    k3 = _dynamics(x + 0.5 * dt * k2, u)
    k4 = _dynamics(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


class Car2d(Env):
    def __init__(self):
        self.dt = 0.1
        self.H = 50
        r = 0.3
        self.obs_radius = r
        # U-shaped wall of obstacle centers (top row, right column, bottom row)
        top = [(-3 * r, 2 * r), (-2 * r, 2 * r), (-1 * r, 2 * r), (0.0, 2 * r)]
        right = [(0.0, r), (0.0, 0.0), (0.0, -r)]
        bottom = [(-3 * r, -2 * r), (-2 * r, -2 * r), (-1 * r, -2 * r), (0.0, -2 * r)]
        self.obs_center = jnp.asarray(top + right + bottom)
        self.x0 = jnp.array([-0.5, 0.0, 1.5 * jnp.pi])
        self.xg = jnp.array([0.5, 0.0, 0.0])

        xref_path = os.path.join(_ASSET_DIR, "car2d_xref.npy")
        self.xref = jnp.asarray(np.load(xref_path), dtype=jnp.float32)
        d = jnp.diff(self.xref, axis=0)
        theta = jnp.arctan2(d[:, 0], d[:, 1])
        self.thetaref = jnp.append(theta, theta[-1])
        self.rew_xref = jax.vmap(self._reward)(self.xref).mean()

    # -- core dynamics ------------------------------------------------------

    def _reward(self, q: jnp.ndarray) -> jnp.ndarray:
        dist = jnp.linalg.norm(q[:2] - self.xg[:2])
        return 1.0 - (jnp.clip(dist, 0.0, 0.2) / 0.2) ** 2

    def reset(self, rng: jax.Array) -> State:
        del rng  # deterministic start, matching the reference
        zero = jnp.asarray(0.0)
        return State(self.x0, self.x0, zero, zero)

    def step(self, state: State, action: jax.Array) -> State:
        u = jnp.clip(action, -1.0, 1.0)
        q_new = _rk4(state.pipeline_state, u, self.dt)
        dists = jnp.linalg.norm(q_new[:2] - self.obs_center, axis=-1)
        collide = jnp.any(dists < self.obs_radius)
        q = jnp.where(collide, state.pipeline_state, q_new)
        return state.replace(
            pipeline_state=q, obs=q, reward=self._reward(q),
            done=jnp.asarray(0.0))

    # -- demo conditioning --------------------------------------------------

    def eval_xref_logpd(self, xs: jnp.ndarray) -> jnp.ndarray:
        """Tracking log-density surrogate over a rollout xs of shape (H, 3)."""
        err = jnp.linalg.norm(
            xs[:, :2] - self.xref[:xs.shape[0], :2], axis=-1)
        return -((jnp.clip(err, 0.0, 0.5) / 0.5) ** 2).mean(axis=-1)

    # -- sizes & rendering --------------------------------------------------

    @property
    def action_size(self) -> int:
        return 2

    @property
    def observation_size(self) -> int:
        return 3

    def render(self, ax, xs, show_demo: bool = True):
        """Top-down scene plot: U-wall obstacles, start/goal, optional RRT
        demo path, and the rollout colored by time."""
        from matplotlib.collections import PatchCollection
        from matplotlib.patches import Circle

        wall = PatchCollection(
            [Circle(c, self.obs_radius) for c in np.asarray(self.obs_center)],
            facecolor="0.35", edgecolor="none", zorder=1)
        ax.add_collection(wall)
        if show_demo:
            ref = np.asarray(self.xref)
            ax.plot(ref[:, 0], ref[:, 1], ls="--", lw=1.2, color="tab:blue",
                    zorder=2, label="RRT demo")
        xs = np.asarray(xs)
        pts = ax.scatter(xs[:, 0], xs[:, 1], c=np.arange(len(xs)),
                         cmap="viridis", s=14, zorder=3, label="plan (t →)")
        ax.plot(*np.asarray(self.x0[:2]), marker="s", color="tab:green",
                ms=9, zorder=4, label="start")
        ax.plot(*np.asarray(self.xg[:2]), marker="*", color="tab:red",
                ms=14, zorder=4, label="goal")
        ax.set(xlim=(-2, 2), ylim=(-2, 2), aspect="equal")
        ax.legend(loc="lower right", fontsize=8)
        return pts
