"""HumanoidTrack: humanoid tracking a motion-capture jog demo.

Behavioral spec from the reference env (mbd/envs/humanoidtrack.py):
n_frames=5, H=50 (1.5 s); 5 tracked bodies (torso, l/r thigh, l/r shin);
demo positions from jog_xref (frames 70:120, padded to H) (:18-43);
rew_xref = 1.0; deterministic reset (:48-61);
``state.done`` doubles as the timestep counter and the ``*_ref`` bodies are
teleported to the demo positions for visualization (:63-82);
reward = 1 + (−|vx − 1.6| − |torso_z − 1.3| − 0.1·|torso_y|) (:87-96);
eval_xref_logpd = −mean(clip(‖x − xref‖, 0, 0.5)/0.5)² over bodies × time
(:98-106).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..sim.system import load_mjcf
from .base import State
from .physics import PhysicsEnv, asset_path

TRACK_BODIES = ["torso", "left_thigh", "right_thigh", "left_shin",
                "right_shin"]


class HumanoidTrack(PhysicsEnv):
    def __init__(self, mode: str = "jog"):
        sys = load_mjcf(asset_path("humanoidtrack.xml"))
        super().__init__(sys, n_frames=5)
        self.H = 50
        self._track_idx_py = [sys.link_names.index(n) for n in TRACK_BODIES]
        self.track_body_idx = jnp.array(self._track_idx_py)
        self.ref_body_idx = jnp.array(
            [sys.link_names.index(n + "_ref") for n in TRACK_BODIES])
        demo = np.load(asset_path(f"{mode}_xref.npz"))
        xref = []
        for name in TRACK_BODIES:
            x = demo[name]
            if len(x) < self.H:
                x = np.concatenate(
                    [x, np.tile(x[-1:], (self.H - len(x), 1))], axis=0)
            else:
                x = x[70:70 + self.H]
            xref.append(x)
        self.xref = jnp.asarray(np.stack(xref, axis=0))   # (5, H, 3)
        self.rew_xref = 1.0

    def reset(self, rng: jax.Array) -> State:
        del rng  # deterministic
        q = self.sys.init_q
        qd = jnp.zeros(self.sys.nv)
        ps = self.pipeline_init(q, qd)
        zero = jnp.asarray(0.0)
        return State(ps, self._obs(ps), zero, zero,
                     metrics={"reward_linup": zero, "reward_quadctrl": zero})

    def step(self, state: State, action: jax.Array) -> State:
        ps = self.pipeline_step(state.pipeline_state, action)
        # teleport the *_ref marker bodies to the demo frame (visual only)
        t = state.done.astype(jnp.int32)
        pos = ps.x.pos
        for i in range(len(TRACK_BODIES)):
            pos = pos.at[self.ref_body_idx[i]].set(self.xref[i, t])
        ps = ps.replace(x=ps.x.replace(pos=pos))
        reward = self._reward(state)
        return state.replace(pipeline_state=ps, obs=self._obs(ps),
                             reward=reward, done=state.done + 1)

    def _obs(self, ps) -> jax.Array:
        return jnp.concatenate([ps.q, ps.qd], axis=-1)

    def _reward(self, state) -> jax.Array:
        return self._reward_ps(state.pipeline_state)

    def _reward_ps(self, ps) -> jax.Array:
        return 1.0 + (
            -jnp.abs(ps.xd.vel[0, 0] - 1.6)
            - jnp.abs(ps.x.pos[0, 2] - 1.3)
            - 0.1 * jnp.abs(ps.x.pos[0, 1]))

    def traj_reward(self, ps_stack, us, ps0) -> jax.Array:
        """[H, B]; the reference computes step-t reward from the PRE-step
        state (humanoidtrack.py:76,87), so shift by one."""
        shifted = jax.tree.map(
            lambda first, rest: jnp.concatenate(
                [jnp.broadcast_to(first, rest[:1].shape), rest[:-1]],
                axis=0),
            ps0, ps_stack)
        return jax.vmap(jax.vmap(self._reward_ps))(shifted)

    def traj_xref_logpd(self, ps_stack) -> jax.Array:
        """Demo tracking log-density per sample: [B] from [H, B, ...]."""
        xs = ps_stack.x.pos[:, :, self.track_body_idx]   # [H, B, 5, 3]
        err = jnp.linalg.norm(
            xs - self.xref.transpose(1, 0, 2)[:xs.shape[0], None], axis=-1)
        return -((jnp.clip(err, 0.0, 0.5) / 0.5) ** 2).mean(axis=(0, 2))

    def eval_xref_logpd(self, pipeline_states) -> jax.Array:
        """Demo tracking log-density over a stacked rollout (H leading)."""
        xs = pipeline_states.x.pos[:, self.track_body_idx].transpose(1, 0, 2)
        err = jnp.linalg.norm(xs - self.xref[:, :xs.shape[1]], axis=-1)
        return -((jnp.clip(err, 0.0, 0.5) / 0.5) ** 2).mean()

    def traj_xref_logpd_qs(self, qs) -> jax.Array:
        """Demo tracking log-density straight from a batch-last position
        trace qs [H, nq, *B] → [*B]: one folded FK pass over the 5 tracked
        bodies' positions instead of materializing full link states — this
        lets the VMEM-resident Pallas engine (which emits only q) serve the
        demo branch (reference mbd_planner.py:117-125)."""
        from ..sim import batched as BT

        H = qs.shape[0]
        B = qs.shape[2:]
        nq = self.sys.nq
        # fold H into the trailing batch: [nq, *B, H] → [nq, prod(B)*H]
        q_flat = jnp.moveaxis(qs, 0, -1).reshape(nq, -1)
        kin = BT.fk_b(self.sys, q_flat)
        # kin.xpos[0] is the world body; link j of x.pos is kin.xpos[j+1]
        xs = jnp.stack([kin.xpos[j + 1] for j in self._track_idx_py])
        nb = int(np.prod(B)) if B else 1
        xs = xs.reshape(len(TRACK_BODIES), 3, nb, H)      # [5, 3, B, H]
        xs = jnp.transpose(xs, (0, 2, 3, 1))              # [5, B, H, 3]
        err = jnp.linalg.norm(xs - self.xref[:, None, :H], axis=-1)
        logpd = -((jnp.clip(err, 0.0, 0.5) / 0.5) ** 2).mean(axis=(0, 2))
        return logpd.reshape(B)


    def track_xpos_b(self, q) -> jax.Array:
        """Tracked-body world positions from batch-last q [nq, *B] →
        [5, 3, *B] (one FK pass; used by the Pallas kernel's in-kernel
        demo scoring)."""
        from ..sim import batched as BT

        kin = BT.fk_b(self.sys, q)
        return jnp.stack([kin.xpos[j + 1] for j in self._track_idx_py])

    def reward_qs_b(self, qs, qds, us, q0, qd0):
        """Batch-last fast path: the reference computes step-t reward from
        the PRE-step state (free root: pos = q[0:3], origin vel = qd[0:3])."""
        if qs.shape[0] == 1:
            qp, qdp = q0[None], qd0[None]
        else:
            qp = jnp.concatenate([q0[None], qs[:-1]], axis=0)
            qdp = jnp.concatenate([qd0[None], qds[:-1]], axis=0)
        return 1.0 + (
            -jnp.abs(qdp[:, 0] - 1.6)
            - jnp.abs(qp[:, 2] - 1.3)
            - 0.1 * jnp.abs(qp[:, 1]))
