"""Quaternion / rotation / spatial-algebra helpers (pure JAX, batch friendly).

Conventions follow MuJoCo: quaternions are (w, x, y, z); spatial vectors are
6-D with rotation first ([angular; linear]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    w1, x1, y1, z1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    w2, x2, y2, z2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q."""
    w = q[..., :1]
    u = q[..., 1:]
    c = jnp.cross(u, v)
    return v + 2.0 * (w * c + jnp.cross(u, c))


def quat_inv(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Quaternion (w,x,y,z) -> 3x3 rotation matrix."""
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


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def mat_to_quat(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> quaternion (w,x,y,z), branch-free (Shepperd)."""
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # four candidate constructions, pick numerically safest
    q0 = jnp.stack(
        [
            1.0 + tr,
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )
    q1 = jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
            m[..., 0, 1] + m[..., 1, 0],
            m[..., 0, 2] + m[..., 2, 0],
        ],
        axis=-1,
    )
    q2 = jnp.stack(
        [
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 0, 1] + m[..., 1, 0],
            1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
            m[..., 1, 2] + m[..., 2, 1],
        ],
        axis=-1,
    )
    q3 = jnp.stack(
        [
            m[..., 1, 0] - m[..., 0, 1],
            m[..., 0, 2] + m[..., 2, 0],
            m[..., 1, 2] + m[..., 2, 1],
            1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
        ],
        axis=-1,
    )
    cases = jnp.stack([q0, q1, q2, q3], axis=-2)
    diag = jnp.stack(
        [tr, m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], axis=-1
    )
    idx = jnp.argmax(diag, axis=-1)
    q = jnp.take_along_axis(cases, idx[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.sign(q[..., :1] + 1e-30)


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return v / (jnp.linalg.norm(v, axis=axis, keepdims=True) + eps)


def motion_cross(v: jax.Array, u: jax.Array) -> jax.Array:
    """Spatial motion cross product v x u, both 6-D [ang; lin]."""
    ang = jnp.cross(v[..., :3], u[..., :3])
    lin = jnp.cross(v[..., :3], u[..., 3:]) + jnp.cross(v[..., 3:], u[..., :3])
    return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product v x* f (dual of motion_cross)."""
    ang = jnp.cross(v[..., :3], f[..., :3]) + jnp.cross(v[..., 3:], f[..., 3:])
    lin = jnp.cross(v[..., :3], f[..., 3:])
    return jnp.concatenate([ang, lin], axis=-1)


def inert_mul(ci: jax.Array, v: jax.Array) -> jax.Array:
    """Multiply packed 10-D spatial inertia by motion vector -> force vector.

    Packing follows MuJoCo cinert: [Ixx Iyy Izz Ixy Ixz Iyz, mc_x mc_y mc_z, m]
    where I is the inertia about the reference point and mc = mass * (com -
    refpoint). Result = [I w + mc x v_lin; m v_lin - mc x w].
    """
    w, vl = v[..., :3], v[..., 3:]
    ixx, iyy, izz = ci[..., 0], ci[..., 1], ci[..., 2]
    ixy, ixz, iyz = ci[..., 3], ci[..., 4], ci[..., 5]
    mc = ci[..., 6:9]
    m = ci[..., 9:10]
    iw = jnp.stack(
        [
            ixx * w[..., 0] + ixy * w[..., 1] + ixz * w[..., 2],
            ixy * w[..., 0] + iyy * w[..., 1] + iyz * w[..., 2],
            ixz * w[..., 0] + iyz * w[..., 1] + izz * w[..., 2],
        ],
        axis=-1,
    )
    ang = iw + jnp.cross(mc, vl)
    lin = m * vl - jnp.cross(mc, w)
    return jnp.concatenate([ang, lin], axis=-1)
