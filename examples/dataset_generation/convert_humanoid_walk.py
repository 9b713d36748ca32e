"""Mocap -> torque/muscle-humanoid walking trajectory — analogue of the
reference datasets/data_generation/conversion/convert_Humanoid_walk.py.

The raw 500 Hz capture (.mat) is retargeted to the humanoid's joint set by
a per-joint linear transform; calibration values are the reference's
conversion table (convert_Humanoid_walk.py:8-44) — required for dataset
parity. Download the raw capture with `loco-mujoco-tpu-download-raw`.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from loco_mujoco_tpu.utils import adapt_mocap  # noqa: E402

JOINT_CONF = dict(
    pelvis_tx=(1.0, 0.0),
    pelvis_tz=(1.0, 0.0),
    pelvis_ty=(1.125, -1.11),
    pelvis_tilt=(1.0, 0.0),
    pelvis_list=(1.0, 0.0),
    pelvis_rotation=(1.0, 0.0),
    hip_flexion_r=(1.0, 0.0),
    hip_adduction_r=(1.0, 0.0),
    hip_rotation_r=(1.0, 0.0),
    knee_angle_r=(1.0, 0.0),
    ankle_angle_r=(1.0, 0.09),
    subtalar_angle_r=(1.0, 0.0),
    mtp_angle_r=(1.0, 0.0),
    hip_flexion_l=(1.0, 0.0),
    hip_adduction_l=(1.0, 0.0),
    hip_rotation_l=(1.0, 0.0),
    knee_angle_l=(1.0, 0.0),
    ankle_angle_l=(1.0, 0.06),
    subtalar_angle_l=(1.0, 0.0),
    mtp_angle_l=(1.0, 0.0),
    lumbar_extension=(1.0, 0.0),
    lumbar_bending=(1.0, 0.0),
    lumbar_rotation=(1.0, 0.0),
    arm_flex_r=(1.0, 0.0),
    arm_add_r=(1.0, 0.0),
    arm_rot_r=(1.0, 0.0),
    elbow_flex_r=(1.0, 0.0),
    pro_sup_r=(1.0, 0.0),
    wrist_flex_r=(1.0, 0.0),
    wrist_dev_r=(1.0, 0.0),
    arm_flex_l=(1.0, 0.0),
    arm_add_l=(1.0, 0.0),
    arm_rot_l=(1.0, 0.0),
    elbow_flex_l=(1.0, 0.0),
    pro_sup_l=(1.0, 0.0),
    wrist_flex_l=(1.0, 0.0),
    wrist_dev_l=(1.0, 0.0),
)


def main(mat_path, out_dir):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    dataset = adapt_mocap(
        mat_path, joint_conf=JOINT_CONF, unavailable_keys=[],
        discard_first=5000, discard_last=1000,
    )
    target = out_dir / "02-constspeed_humanoid.npz"
    np.savez(file=target, **dataset)
    print(f"wrote {target} ({next(iter(dataset.values())).shape[0]} frames)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mat", default="./00_raw_mocap_data/"
                    "raw_walking_motion_capture.mat")
    ap.add_argument("--out", default="./generated_data")
    a = ap.parse_args()
    main(a.mat, a.out)
