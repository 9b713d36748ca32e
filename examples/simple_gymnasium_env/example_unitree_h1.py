"""Gymnasium quickstart on UnitreeH1 (mirrors reference
examples/simple_gymnasium_env/example_unitree_h1.py): build the env through
the gym registry, pull the expert dataset, and run a random policy."""

import gymnasium as gym
import numpy as np

import loco_mujoco_tpu  # noqa: F401  (registers the "LocoMujoco" id)


def main():
    env = gym.make("LocoMujoco", env_name="UnitreeH1.run.real", debug=True)

    # the expert dataset for the chosen environment and task
    expert_data = env.unwrapped.create_dataset()
    print("expert states:", expert_data["states"].shape)

    action_dim = env.action_space.shape[0]
    env.reset(seed=0)
    for i in range(200):
        action = np.random.randn(action_dim).astype(np.float32)
        obs, reward, terminated, truncated, info = env.step(action)
        if terminated or truncated:
            env.reset()
    print("ran 200 random steps, last reward", float(reward))


if __name__ == "__main__":
    main()
