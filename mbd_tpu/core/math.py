"""Quaternion and spatial-vector math for the TPU-native rigid-body engine.

Conventions
-----------
- Quaternions are ``(w, x, y, z)`` (MuJoCo order), unit-norm.
- Spatial (6D) motion vectors are ``[angular(3), linear(3)]`` expressed in the
  WORLD frame about a common origin (we re-center the origin per sample at the
  root body to keep f32 moments well-conditioned).
- Spatial force vectors are ``[torque(3), force(3)]`` about the same origin.

All functions are pure jnp, shape-polymorphic over leading batch dims, and
safe under ``vmap``/``jit``.
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Quaternions (wxyz)
# ---------------------------------------------------------------------------

def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b for wxyz quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (active rotation, world = R(q) @ local)."""
    qw = q[..., :1]
    qv = q[..., 1:]
    # v' = v + 2 qw (qv × v) + 2 qv × (qv × v)
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (...,3,3) from wxyz quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by world-frame angular velocity over dt.

    Uses the exponential map: q' = exp(0.5 * dt * omega) ⊗ q, renormalized.
    """
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True) * dt
    half = 0.5 * theta
    # sinc-safe axis scaling
    small = theta < 1e-9
    k = jnp.where(small, 0.5 * dt, jnp.sin(half) * dt / jnp.where(small, 1.0, theta))
    dq = jnp.concatenate([jnp.cos(half), omega * k], axis=-1)
    qn = quat_mul(dq, q)
    return qn / jnp.linalg.norm(qn, axis=-1, keepdims=True)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * angle[..., None]
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


# ---------------------------------------------------------------------------
# Spatial algebra (world-frame 6D vectors, [ang, lin])
# ---------------------------------------------------------------------------

def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product v ×ₘ m (both motion vectors)."""
    vang, vlin = v[..., :3], v[..., 3:]
    mang, mlin = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [
            jnp.cross(vang, mang),
            jnp.cross(vang, mlin) + jnp.cross(vlin, mang),
        ],
        axis=-1,
    )


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product v ×f* f (motion × force)."""
    vang, vlin = v[..., :3], v[..., 3:]
    fang, flin = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [
            jnp.cross(vang, fang) + jnp.cross(vlin, flin),
            jnp.cross(vang, flin),
        ],
        axis=-1,
    )


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix (...,3,3) of (...,3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def spatial_inertia(mass: jnp.ndarray, inertia_world: jnp.ndarray,
                    com: jnp.ndarray) -> jnp.ndarray:
    """6x6 world-frame spatial inertia about the (shared) origin.

    I = [[ I_com + m c× c×ᵀ,  m c× ],
         [ m c×ᵀ,             m 1  ]]
    with c the world CoM position and I_com the rotational inertia about the
    CoM expressed in world axes. Layout matches [ang, lin] vectors.
    """
    c = skew(com)
    ct = jnp.swapaxes(c, -1, -2)
    m1 = mass[..., None, None] * jnp.eye(3, dtype=com.dtype)
    top_left = inertia_world + mass[..., None, None] * (c @ ct)
    top_right = mass[..., None, None] * c
    bot_left = mass[..., None, None] * ct
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, m1], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
