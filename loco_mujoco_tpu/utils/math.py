"""Math utilities mirroring reference `loco_mujoco/utils/math.py` (plus the
mushroom-rl euler helpers it imports), in both numpy (host/dataset) and jax
(traced) forms. Euler convention: intrinsic XYZ (R = Rx @ Ry @ Rz), matching
mushroom_rl.utils.angles.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def euler_to_mat(euler):
    """Intrinsic XYZ euler -> rotation matrix (host, numpy)."""
    a, b, c = euler
    ca, sa = np.cos(a), np.sin(a)
    cb, sb = np.cos(b), np.sin(b)
    cc, sc = np.cos(c), np.sin(c)
    rx = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    ry = np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    rz = np.array([[cc, -sc, 0], [sc, cc, 0], [0, 0, 1]])
    return rx @ ry @ rz


def mat_to_euler(mat):
    """Rotation matrix -> intrinsic XYZ euler (host, numpy)."""
    m = np.asarray(mat).reshape(3, 3)
    beta = np.arcsin(np.clip(m[0, 2], -1.0, 1.0))
    alpha = np.arctan2(-m[1, 2], m[2, 2])
    gamma = np.arctan2(-m[0, 1], m[0, 0])
    return np.array([alpha, beta, gamma])


def mat2angle_xy(mat):
    """Rotation matrix (flat 9 or 3x3) -> angle in the x-y plane
    (reference math.py:33-47: the z euler angle)."""
    m = np.asarray(mat).reshape(3, 3)
    return float(np.arctan2(-m[0, 1], m[0, 0]))


def angle2mat_xy(angle):
    """Angle in x-y plane -> rotation matrix (reference math.py:50-64)."""
    return euler_to_mat(np.array([0.0, 0.0, angle]))


def transform_angle_2pi(angle):
    """Wrap angle into [-pi, pi] (reference math.py:67-78). Works for both
    numpy and jax inputs."""
    return (angle + np.pi) % (2 * np.pi) - np.pi


def mat2angle_xy_jax(mat):
    """Traced version of mat2angle_xy; mat is (..., 9) or (..., 3, 3)."""
    m = jnp.reshape(mat, mat.shape[:-1] + (3, 3)) if mat.shape[-1] == 9 else mat
    return jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])


def rotate_obs(state, angle, idx_rot, idx_xvel, idx_yvel):
    """Rotate a state around the vertical axis (reference math.py:5-30);
    traced (jax) version used at reset time."""
    xp = jnp if isinstance(state, jnp.ndarray) else np
    rot = transform_angle_2pi(state[idx_rot] + angle)
    xv = xp.cos(angle) * state[idx_xvel] - xp.sin(angle) * state[idx_yvel]
    yv = xp.sin(angle) * state[idx_xvel] + xp.cos(angle) * state[idx_yvel]
    if xp is jnp:
        return state.at[idx_rot].set(rot).at[idx_xvel].set(xv).at[idx_yvel].set(yv)
    out = state.copy()
    out[idx_rot], out[idx_xvel], out[idx_yvel] = rot, xv, yv
    return out
