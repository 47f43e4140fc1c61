"""Narrow-phase collision for the static candidate pair list.

The broad phase is done once at load time (System.contact_pairs — the
MuJoCo contype/conaffinity mask minus same-body / parent-child pairs; see
sim/system.py). At runtime every candidate pair always produces its fixed
number of contact points with an activity signal (depth > 0), so shapes are
fully static — no data-dependent control flow on device.

Pair kinds cover every scene in the suite (verified by enumerating the
masks of all 9 reference scenes):
  plane-sphere(1pt), plane-capsule(2pt), capsule-capsule(1pt),
  sphere-box(1pt).

Conventions: normal points from geom A into geom B; ``depth`` > 0 means
penetration. Capsule axis is local z; size = (radius, half_length, ·).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math import quat_rotate, quat_rotate_inv
from .system import (PAIR_CAPSULE_CAPSULE, PAIR_PLANE_CAPSULE,
                     PAIR_PLANE_SPHERE, PAIR_SPHERE_BOX, System)


class Contacts(NamedTuple):
    pos: jnp.ndarray       # (ncon, 3) contact point, world
    normal: jnp.ndarray    # (ncon, 3) unit normal, A → B
    depth: jnp.ndarray     # (ncon,) penetration depth (>0 active)
    friction: jnp.ndarray  # (ncon,) combined slide friction
    body_a: tuple          # static: body id of geom A per contact
    body_b: tuple          # static: body id of geom B per contact


def _plane_sphere(pp, pq, c, r):
    n = quat_rotate(pq, jnp.array([0.0, 0.0, 1.0], pp.dtype))
    dist = jnp.dot(n, c - pp) - r
    pos = c - n * (r + 0.5 * dist)
    return pos, n, -dist


def _plane_capsule(pp, pq, cp, cq, r, hl):
    n = quat_rotate(pq, jnp.array([0.0, 0.0, 1.0], pp.dtype))
    axis = quat_rotate(cq, jnp.array([0.0, 0.0, 1.0], pp.dtype))
    outs = []
    for sgn in (1.0, -1.0):
        e = cp + axis * (hl * sgn)
        dist = jnp.dot(n, e - pp) - r
        pos = e - n * (r + 0.5 * dist)
        outs.append((pos, n, -dist))
    return outs


def _seg_seg_closest(p1, d1, hl1, p2, d2, hl2):
    """Closest points between two segments (centers p, unit dirs d,
    half-lengths hl). Regularized for the parallel case."""
    r = p1 - p2
    a = 1.0
    b = jnp.dot(d1, d2)
    c = jnp.dot(d1, r)
    e = 1.0
    f = jnp.dot(d2, r)
    denom = a * e - b * b
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    s = jnp.clip((b * f - c * e) / denom, -hl1, hl1)
    t = jnp.clip((b * s + f) / e, -hl2, hl2)
    s = jnp.clip(b * t - c, -hl1, hl1)
    return p1 + d1 * s, p2 + d2 * t


def _capsule_capsule(p1, q1, r1, hl1, p2, q2, r2, hl2):
    z = jnp.array([0.0, 0.0, 1.0], p1.dtype)
    d1 = quat_rotate(q1, z)
    d2 = quat_rotate(q2, z)
    c1, c2 = _seg_seg_closest(p1, d1, hl1, p2, d2, hl2)
    delta = c2 - c1
    dist = jnp.linalg.norm(delta)
    n = delta / jnp.maximum(dist, 1e-9)
    depth = (r1 + r2) - dist
    pos = 0.5 * (c1 + n * r1 + c2 - n * r2)
    return pos, n, depth


def _sphere_box(c, r, bp, bq, bsize):
    """Sphere (center c, radius r) vs box (pose bp/bq, half-extents bsize).
    Returns (pos, normal A→B with A=sphere, depth)."""
    pl = quat_rotate_inv(bq, c - bp)
    clamped = jnp.clip(pl, -bsize, bsize)
    delta = pl - clamped
    dist_out = jnp.linalg.norm(delta)
    outside = dist_out > 1e-9
    # outside: normal from sphere toward box surface
    n_out = -delta / jnp.maximum(dist_out, 1e-9)
    depth_out = r - dist_out
    # inside: push out through nearest face
    face_dist = bsize - jnp.abs(pl)
    k = jnp.argmin(face_dist)
    sign = jnp.sign(pl[k])
    n_in = jnp.zeros(3, c.dtype).at[k].set(-sign)
    depth_in = r + face_dist[k]
    n_local = jnp.where(outside, n_out, n_in)
    depth = jnp.where(outside, depth_out, depth_in)
    surface_local = jnp.where(outside, clamped, pl)
    n = quat_rotate(bq, n_local)
    pos = bp + quat_rotate(bq, surface_local)
    return pos, n, depth


def collide(sys: System, gpos: jnp.ndarray, gquat: jnp.ndarray) -> Contacts:
    """Evaluate all candidate pairs. gpos/gquat: world geom poses."""
    pos_l, n_l, d_l, mu_l, ba_l, bb_l = [], [], [], [], [], []

    def emit(pos, n, depth, ga, gb):
        pos_l.append(pos)
        n_l.append(n)
        d_l.append(depth)
        mu_l.append(jnp.maximum(sys.geom_friction[ga, 0],
                                sys.geom_friction[gb, 0]))
        ba_l.append(sys.geom_bodyid[ga])
        bb_l.append(sys.geom_bodyid[gb])

    for kind, ga, gb in sys.contact_pairs:
        if kind == PAIR_PLANE_SPHERE:
            pos, n, depth = _plane_sphere(
                gpos[ga], gquat[ga], gpos[gb], sys.geom_size[gb, 0])
            emit(pos, n, depth, ga, gb)
        elif kind == PAIR_PLANE_CAPSULE:
            for pos, n, depth in _plane_capsule(
                    gpos[ga], gquat[ga], gpos[gb], gquat[gb],
                    sys.geom_size[gb, 0], sys.geom_size[gb, 1]):
                emit(pos, n, depth, ga, gb)
        elif kind == PAIR_CAPSULE_CAPSULE:
            pos, n, depth = _capsule_capsule(
                gpos[ga], gquat[ga], sys.geom_size[ga, 0],
                sys.geom_size[ga, 1],
                gpos[gb], gquat[gb], sys.geom_size[gb, 0],
                sys.geom_size[gb, 1])
            emit(pos, n, depth, ga, gb)
        elif kind == PAIR_SPHERE_BOX:
            pos, n, depth = _sphere_box(
                gpos[ga], sys.geom_size[ga, 0], gpos[gb], gquat[gb],
                sys.geom_size[gb])
            emit(pos, n, depth, ga, gb)
        else:
            raise NotImplementedError(f"pair kind {kind}")

    if not pos_l:
        z3 = jnp.zeros((0, 3), gpos.dtype)
        z1 = jnp.zeros((0,), gpos.dtype)
        return Contacts(z3, z3, z1, z1, (), ())
    return Contacts(jnp.stack(pos_l), jnp.stack(n_l), jnp.stack(d_l),
                    jnp.stack(mu_l), tuple(ba_l), tuple(bb_l))
