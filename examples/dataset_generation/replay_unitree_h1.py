"""Visual/numeric check of a converted trajectory — analogue of the
reference datasets/data_generation/replay scripts: load the generated .npz
into the env and kinematically replay it (position-stage injection, no
dynamics), printing the observation stream statistics. Pair with
`loco_mujoco_tpu.utils.video2gif` to record a clip on a machine with a
display/renderer.
"""

import argparse

import numpy as np

import loco_mujoco_tpu as lmt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--traj", default="../generated_data/05-run_UnitreeH1.npz")
    ap.add_argument("--n_steps", type=int, default=500)
    ap.add_argument("--from_velocity", action="store_true",
                    help="integrate qpos from the dataset velocities")
    args = ap.parse_args()

    env = lmt.make("UnitreeH1.run.real", debug=True)
    env.load_trajectory(
        dict(traj_path=args.traj, traj_dt=1 / 500, control_dt=0.01),
        warn=False,
    )
    obs = env.play_trajectory(
        n_episodes=1,
        n_steps_per_episode=args.n_steps,
        from_velocity=args.from_velocity,
    )
    obs = np.asarray(obs)
    print(f"replayed {obs.shape[0]} steps, obs dim {obs.shape[1]}")
    print("obs mean", obs.mean(0)[:6], "...")
    print("obs std ", obs.std(0)[:6], "...")


if __name__ == "__main__":
    main()
