"""Reward library — pure-function redesign of the reference's reward objects
(`loco_mujoco/utils/reward.py:5-117`).

Each reward is a pure function `(state, action, next_state, env_info) ->
scalar` usable inside jit; `env_info` is a dict of extra traced inputs the
env provides (goal velocity/angle, env-id bits). The reference's stateful
`reset_state` hook has no equivalent here because no bundled reward is
actually stateful; CustomReward callbacks must be JAX-traceable (documented
API difference).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


RewardFn = Callable[..., jnp.ndarray]


def NoReward():
    """reward.py:34 — always zero."""

    def fn(state, action, next_state, info):
        return jnp.zeros(())

    return fn


def PosReward(pos_idx: int):
    """reward.py:44 — the value of one observation entry (e.g. x velocity)."""

    def fn(state, action, next_state, info):
        return next_state[pos_idx]

    return fn


def CustomReward(reward_callback):
    """reward.py:54-63 — user callback; must be JAX-traceable."""

    def fn(state, action, next_state, info):
        return reward_callback(state, action, next_state)

    return fn


def TargetVelocityReward(x_vel_idx: int, target_velocity: float):
    """reward.py:66-74 — exp(-(vx - v*)^2)."""

    def fn(state, action, next_state, info):
        d = next_state[x_vel_idx] - target_velocity
        return jnp.exp(-jnp.square(d))

    return fn


def MultiTargetVelocityReward(
    x_vel_idx: int, target_velocities, env_id_len: int
):
    """reward.py:77-97 — per-model target velocity selected by the binary
    env-id appended to the observation. The reference decodes the bits with
    np.packbits; here the id arrives as an integer in `info["env_id"]`."""
    tv = jnp.asarray(target_velocities)

    def fn(state, action, next_state, info):
        target = tv[info["env_id"]]
        d = next_state[x_vel_idx] - target
        return jnp.exp(-jnp.square(d))

    return fn


def VelocityVectorReward(x_vel_idx: int, y_vel_idx: int):
    """reward.py:100-117 — exp(-5 ||v_xy - v* (cos a, sin a)||); goal angle
    and speed come from the env's goal state (info['goal_angle'/'goal_vel'])."""

    def fn(state, action, next_state, info):
        angle = info["goal_angle"]
        speed = info["goal_vel"]
        target = speed * jnp.stack([jnp.cos(angle), jnp.sin(angle)])
        cur = jnp.stack([next_state[x_vel_idx], next_state[y_vel_idx]])
        return jnp.exp(-5.0 * jnp.linalg.norm(cur - target))

    return fn


def make_reward(reward_type: str, reward_params: dict | None, defaults: dict):
    """Reward factory mirroring LocoEnv._get_reward_function
    (reference base.py:681-711). `defaults` supplies env-specific indices."""
    reward_params = dict(reward_params or {})
    if reward_type == "no_reward" or reward_type is None:
        return NoReward()
    if reward_type == "x_pos":
        return PosReward(reward_params.get("pos_idx", defaults.get("x_pos_idx")))
    if reward_type == "x_vel":
        return PosReward(reward_params.get("pos_idx", defaults.get("x_vel_idx")))
    if reward_type == "custom":
        return CustomReward(reward_params["reward_callback"])
    if reward_type == "target_velocity":
        return TargetVelocityReward(
            defaults["x_vel_idx"], reward_params["target_velocity"]
        )
    if reward_type == "multi_target_velocity":
        return MultiTargetVelocityReward(
            defaults["x_vel_idx"],
            reward_params["target_velocities"],
            reward_params.get("env_id_len", 0),
        )
    if reward_type == "velocity_vector":
        return VelocityVectorReward(
            defaults["x_vel_idx"], defaults["y_vel_idx"]
        )
    raise NotImplementedError(f"reward type {reward_type!r}")
