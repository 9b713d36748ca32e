"""Shared dataset-replay driver (reference examples/replay_datasets/*):
kinematically replay a task's mocap/expert trajectory, optionally render
through the host EGL renderer or record a gif.

The per-robot scripts in this directory call `replay_task` with their task
id, mirroring the reference's one-file-per-robot layout.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import loco_mujoco_tpu as lmt  # noqa: E402


def replay_task(task, n_episodes=3, n_steps=500, render=False,
                record=False, out=None, from_velocity=False, debug=True):
    env = lmt.make(task, debug=debug)
    rec_params = None
    if record:
        rec_params = dict(path=out or f"{task}.gif", fps=25)
    obs = env.play_trajectory(
        n_episodes=n_episodes, n_steps_per_episode=n_steps,
        from_velocity=from_velocity, render=render, record=record,
        recorder_params=rec_params,
    )
    print(f"{task}: replayed {obs.shape[0]} steps (obs dim {obs.shape[1]})")
    return obs


def main(default_task):
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default=default_task)
    ap.add_argument("--n_episodes", type=int, default=3)
    ap.add_argument("--n_steps", type=int, default=500)
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--from_velocity", action="store_true",
                    help="integrate qpos from dataset velocities "
                         "(reference play_trajectory_from_velocity)")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    replay_task(a.task, a.n_episodes, a.n_steps, a.render, a.record,
                a.out, a.from_velocity)


if __name__ == "__main__":
    main("UnitreeA1.simple.real")
