"""Gymnasium adapter — single-env, host-facing wrapper over the batched
functional core (behavioral port of reference `environments/gymnasium.py`,
registered under the same id "LocoMujoco").

The reference wraps a stateful CPU env; here the wrapper holds one EnvState
and drives the jitted reset/step. Parity points: `step` returns
(obs, reward, terminated=absorbing, truncated=False, info) exactly like
gymnasium.py:47-65; spaces are Box with the env's obs/action dims and
actions live in [-1, 1] (gymnasium.py:167-173).
"""

from __future__ import annotations

import gymnasium
import jax
import numpy as np
from gymnasium import spaces as gym_spaces

from ..registry import make as _make


class GymnasiumWrapper(gymnasium.Env):
    metadata = {"render_modes": ["human", "rgb_array"]}

    def __init__(self, env_name: str | None = None,
                 render_mode: str | None = None, _prebuilt_env=None, **kwargs):
        self.render_mode = render_mode
        # _prebuilt_env: wrap an already-constructed env (the acceptance
        # harness uses this to prove wrapper transparency on the exact
        # env instance it verified against the oracle)
        self._env = (
            _prebuilt_env if _prebuilt_env is not None
            else _make(env_name, **kwargs)
        )
        self._reset_fn = jax.jit(self._env.reset)
        self._step_fn = jax.jit(self._env.step)
        self._state = None
        self._np_seed = 0

        obs_dim = self._env.obs_dim
        act_dim = self._env.action_dim
        self.observation_space = gym_spaces.Box(
            -np.inf, np.inf, shape=(obs_dim,), dtype=np.float32
        )
        self.action_space = gym_spaces.Box(
            -1.0, 1.0, shape=(act_dim,), dtype=np.float32
        )

    @property
    def unwrapped_env(self):
        return self._env

    def __getattr__(self, name):
        # attribute passthrough to the wrapped LocoEnv, matching the
        # reference's mushroom-rl-backed wrapper where e.g.
        # `gym.make(...).create_dataset()` / `play_trajectory()` /
        # `get_kinematic_obs_mask()` resolve on the underlying env
        # (reference examples/simple_gymnasium_env/example_unitree_h1.py)
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._env, name)

    def reset(self, *, seed=None, options=None):
        if seed is not None:
            self._np_seed = seed
        key = jax.random.PRNGKey(self._np_seed)
        self._np_seed += 1
        self._state = self._reset_fn(key)
        return np.asarray(self._state.obs), {}

    def step(self, action):
        assert self._state is not None, "call reset() first"
        self._state = self._step_fn(self._state, jax.numpy.asarray(action))
        obs = np.asarray(self._state.obs)
        reward = float(self._state.reward)
        terminated = bool(self._state.absorbing)
        # note: on done the wrapped state has already auto-reset; gymnasium
        # semantics want the user to call reset(), which replaces it anyway
        return obs, reward, terminated, False, {}

    def render(self):
        """rgb_array frames via the host-side replay renderer (the
        reference's interactive GLFW viewer maps to headless EGL here;
        reference gymnasium.py:34-38 maps render_mode the same way)."""
        if self._state is None:
            raise RuntimeError("call reset() before render()")
        return self._env.render_state(self._state)


def register_gymnasium():
    """Register the "LocoMujoco" id (reference environments/__init__.py:20-25)."""
    try:
        gymnasium.register(
            id="LocoMujoco",
            entry_point="loco_mujoco_tpu.envs.gymnasium_env:GymnasiumWrapper",
        )
    except gymnasium.error.Error:
        pass  # already registered


register_gymnasium()
