"""Record a short kinematic replay of every registered task as a gif —
mirror of reference examples/replay_datasets/record_all.py.

Each task's mocap trajectory is replayed through the host-side renderer
(EGL, headless) and written to <out>/<TaskID>.gif. Tasks whose datasets or
assets are unavailable (A1.hard mini dataset, license-gated MyoSkeleton)
are skipped with a note, like the reference's download-gated behavior.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import loco_mujoco_tpu as lmt  # noqa: E402


def main(out_dir="./recordings", n_steps=100, fps=25):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for task in lmt.get_all_task_names():
        try:
            env = lmt.make(task, debug=True)
            path = out / f"{task}.gif"
            env.play_trajectory(
                n_episodes=1, n_steps_per_episode=n_steps,
                record=True, recorder_params=dict(path=path, fps=fps),
            )
            print(f"recorded {path}")
        except (FileNotFoundError, NotImplementedError) as e:
            print(f"skip {task}: {e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="./recordings")
    ap.add_argument("--n_steps", type=int, default=100)
    ap.add_argument("--fps", type=int, default=25)
    a = ap.parse_args()
    main(a.out, a.n_steps, a.fps)
