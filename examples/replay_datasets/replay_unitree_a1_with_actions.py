"""Action-based replay (mirrors reference
examples/replay_datasets/replay_Unitree_with_actions.py): step the env with
the *expert actions* from the perfect dataset rather than injecting
kinematics. Works analogously for every env with a perfect dataset.

Requires the perfect datasets (loco-mujoco-download-perfect); the Gymnasium
wrapper is used so the loop reads like the reference's.
"""

import gymnasium as gym
import numpy as np

import loco_mujoco_tpu  # noqa: F401  (registers the "LocoMujoco" id)


def main():
    try:
        env = gym.make(
            "LocoMujoco",
            env_name="UnitreeA1.simple.perfect",
            random_start=False,
            init_step_no=0,
        )
    except FileNotFoundError as e:
        print(f"perfect dataset not installed: {e}")
        return

    expert_dataset = env.unwrapped.create_dataset()
    expert_actions = np.asarray(expert_dataset["actions"])

    env.reset(seed=0)
    total_r = 0.0
    for i in range(min(1000, len(expert_actions))):
        obs, reward, terminated, truncated, info = env.step(
            expert_actions[i]
        )
        total_r += float(reward)
        if terminated or truncated:
            break
    print(f"replayed {i + 1} expert actions, return {total_r:.2f}")


if __name__ == "__main__":
    main()
