"""Mocap -> MyoSkeleton walk/run trajectories — analogue of the reference
datasets/data_generation/conversion/convert_MyoSkeleton_{walk,run}.py.

Pipeline (reference lines 1-105): per-joint linear retarget with the
calibration table, renames into the MyoSkeleton joint names, constant fill
(the model's joint ref) for joints the capture lacks, shoulder Euler-order
re-expression zxy -> yxy with finite-difference velocity recompute, and
lead-in/out trimming (walk: 5000/1000 @ 500 Hz, run: 28500/1000).

Needs the license-gated MyoSkeleton asset for the fill values
(`loco-mujoco-tpu-myomodel-init`); without it, unavailable joints fill
with zeros and a warning is printed.
"""

import argparse
import sys
import warnings
from pathlib import Path

import numpy as np
from scipy.spatial.transform import Rotation as R

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from loco_mujoco_tpu.utils import adapt_mocap  # noqa: E402

BASE_CONF = dict(
    pelvis_tx=(1.0, 0.0),
    pelvis_tz=(1.0, 0.0),
    pelvis_ty=(1.0, -1.01),
    pelvis_tilt=(1.0, -0.22),
    pelvis_list=(1.0, 0.0),
    pelvis_rotation=(1.0, 0.0),
    hip_flexion_r=(1.0, 0.2),
    hip_adduction_r=(1.0, 0.0),
    hip_rotation_r=(1.0, 0.0),
    knee_angle_r=(-1.0, 0.0),
    ankle_angle_r=(1.0, 0.15),
    hip_flexion_l=(1.0, 0.2),
    hip_adduction_l=(1.0, 0.0),
    hip_rotation_l=(1.0, 0.0),
    knee_angle_l=(-1.0, 0.0),
    ankle_angle_l=(1.0, 0.1),
    lumbar_extension=(1.0, 0.25),
    lumbar_bending=(1.0, 0.0),
    lumbar_rotation=(1.0, 0.0),
    arm_flex_r=(1.0, 0.0),
    arm_add_r=(-1.0, 0.0),
    arm_rot_r=(1.0, 0.0),
    elbow_flex_r=(1.0, 0.0),
    pro_sup_r=(1.0, -np.pi / 2),
    arm_flex_l=(1.0, 0.0),
    arm_add_l=(-1.0, 0.0),
    arm_rot_l=(1.0, 0.0),
    elbow_flex_l=(1.0, 0.0),
    pro_sup_l=(1.0, -np.pi / 2),
)

# task-specific calibration deltas (convert_MyoSkeleton_run.py diff)
TASKS = {
    "walk": dict(
        conf={}, discard_first=5000,
        mat="raw_walking_motion_capture.mat",
        out="myosuite_humanoid_walking.npz",
    ),
    "run": dict(
        conf=dict(pelvis_ty=(1.0, -1.0), ankle_angle_r=(1.0, 0.1)),
        discard_first=28500,
        mat="raw_running_motion_capture.mat",
        out="myosuite_humanoid_running.npz",
    ),
}

RENAME = dict(
    lumbar_extension="L5_S1_Flex_Ext",
    lumbar_bending="L5_S1_Lat_Bending",
    lumbar_rotation="L5_S1_axial_rotation",
    arm_flex_r="elv_angle_r",
    arm_add_r="shoulder_elv_r",
    arm_rot_r="shoulder1_r2_r",
    arm_flex_l="elv_angle_l",
    arm_add_l="shoulder_elv_l",
    arm_rot_l="shoulder1_r2_l",
    pro_sup_r="pro_sup",
)


def _unavailable_fills():
    """Joints the capture lacks, filled with the model's joint reference
    value (the reference reads jh.ref from the xml_handle)."""
    try:
        from loco_mujoco_tpu.models.humanoids.myoskeleton import MyoSkeleton

        env = MyoSkeleton(reward_params=dict(target_velocity=1.25))
        model = env.model
        have = {RENAME.get(k, k) for k in BASE_CONF}
        fills = {}
        qpos0 = np.asarray(model.qpos0)
        for name, j in model.names["joint"].items():
            if name not in have:
                fills[name] = float(qpos0[int(model.jnt_qposadr[j])])
        return fills
    except FileNotFoundError:
        warnings.warn(
            "MyoSkeleton assets missing; filling unavailable joints with "
            "zeros instead of the model's joint refs"
        )
        return []


def _reorder_shoulders(dataset, dt=1.0 / 500.0):
    """Shoulder rotation order zxy -> yxy, velocities re-derived by finite
    differences (reference convert_MyoSkeleton_walk.py:9-15, 85-98)."""
    for side in ("r", "l"):
        keys = [f"q_elv_angle_{side}", f"q_shoulder_elv_{side}",
                f"q_shoulder1_r2_{side}"]
        arr = np.vstack([dataset[k] for k in keys]).T
        arr = R.from_euler("zxy", arr).as_euler("yxy").T
        for i, k in enumerate(keys):
            dataset[k] = arr[i]
            vel = np.zeros_like(arr[i])
            vel[:-1] = np.diff(arr[i]) / dt
            dataset["d" + k] = vel
    return {k: v[:-1] for k, v in dataset.items()}  # drop last data point


def main(task, mat_dir, out_dir):
    cfg = TASKS[task]
    joint_conf = dict(BASE_CONF, **cfg["conf"])
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    dataset = adapt_mocap(
        Path(mat_dir) / cfg["mat"], joint_conf=joint_conf,
        unavailable_keys=_unavailable_fills(), rename_map=RENAME,
        discard_first=cfg["discard_first"], discard_last=1000,
    )
    dataset = _reorder_shoulders(dict(dataset))
    target = out_dir / cfg["out"]
    np.savez(file=target, **dataset)
    print(f"wrote {target} ({next(iter(dataset.values())).shape[0]} frames)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=("walk", "run"), default="walk")
    ap.add_argument("--mat_dir", default="./00_raw_mocap_data")
    ap.add_argument("--out", default="./generated_data")
    a = ap.parse_args()
    main(a.task, a.mat_dir, a.out)
