"""Dataset replay example (mirrors reference
examples/replay_datasets/replay_Unitree.py): kinematic replay of the A1
mocap dataset through the framework's forward kinematics."""

import loco_mujoco_tpu as lmt


def main():
    env = lmt.make("UnitreeA1.simple.real", debug=True)
    obs_stream = env.play_trajectory(n_episodes=1, n_steps_per_episode=100)
    print("replayed", obs_stream.shape, "observations")

    obs_stream_v = env.play_trajectory(
        n_episodes=1, n_steps_per_episode=100, from_velocity=True
    )
    print("velocity-integrated replay", obs_stream_v.shape)


if __name__ == "__main__":
    main()
