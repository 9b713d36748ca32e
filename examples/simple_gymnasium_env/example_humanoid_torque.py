"""Gymnasium interface example (mirrors reference
examples/simple_gymnasium_env): random agent on the torque humanoid."""

import gymnasium
import numpy as np

import loco_mujoco_tpu  # noqa: F401  (registers "LocoMujoco")


def main():
    env = gymnasium.make(
        "LocoMujoco", env_name="HumanoidTorque.walk.real", debug=True
    )
    obs, _ = env.reset(seed=0)
    ret = 0.0
    for _ in range(200):
        action = np.random.uniform(-0.1, 0.1, env.action_space.shape)
        obs, reward, terminated, truncated, info = env.step(action)
        ret += reward
        if terminated:
            obs, _ = env.reset()
    print("return over 200 steps:", ret)


if __name__ == "__main__":
    main()
