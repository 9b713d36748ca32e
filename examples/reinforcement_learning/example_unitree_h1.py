"""Custom-reward RL scaffold on UnitreeH1 (mirrors reference
examples/reinforcement_learning/example_unitree_h1.py): a user reward
callback plugged into the env, random policy in place of "your favorite RL
algorithm".

The callback is traced under jit, so it must be JAX-compatible
(PARITY.md documents this API break vs the reference's numpy callbacks).
"""

import gymnasium as gym
import jax.numpy as jnp
import numpy as np

import loco_mujoco_tpu  # noqa: F401  (registers the "LocoMujoco" id)


def my_reward_function(state, action, next_state):
    return -jnp.mean(action)  # negative mean action, as in the reference


def main():
    env = gym.make(
        "LocoMujoco", env_name="UnitreeH1.run.real", debug=True,
        reward_type="custom",
        reward_params=dict(reward_callback=my_reward_function),
    )
    action_dim = env.action_space.shape[0]
    env.reset(seed=0)
    total = 0.0
    for i in range(200):
        action = np.random.randn(action_dim).astype(np.float32)
        obs, reward, terminated, truncated, info = env.step(action)
        total += float(reward)
        # HERE is your favorite RL algorithm (see ppo_a1.py for a
        # fully-jitted on-device PPO over the batched native API)
        if terminated or truncated:
            env.reset()
    print("200 steps, custom-reward return", total)


if __name__ == "__main__":
    main()
