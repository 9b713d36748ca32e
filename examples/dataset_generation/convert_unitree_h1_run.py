"""Mocap → UnitreeH1 trajectory conversion — the framework's analogue of the
reference dataset-generation pipeline (datasets/data_generation/conversion/
convert_UnitreeH1_run.py): a per-joint linear retarget table (multiplier,
offset) applied by `adapt_mocap` to the raw .mat recording, joint renames
into the robot's joint set, and head/tail trimming of the capture.

The raw mocap archives are downloaded with `loco-mujoco-download` (Zenodo);
run this offline step once to regenerate the 500 Hz robot trajectory file
consumed by `UnitreeH1.run.real`.
"""

import argparse
import os

import numpy as np

from loco_mujoco_tpu.utils import adapt_mocap

# per-joint (multiplier, offset): mocap angle -> robot joint angle.
# calibration values from the reference conversion table
# (convert_UnitreeH1_run.py:8-38) — required for dataset parity.
JOINT_CONF = dict(
    pelvis_tx=(0.95, 0.0),
    pelvis_tz=(-1.0, 0.0),
    pelvis_ty=(0.8, -0.77),
    pelvis_tilt=(0.5, -0.13),
    pelvis_list=(0.5, 0.0),
    pelvis_rotation=(1.0, 0.0),
    lumbar_extension=(1.0, 0.25),
    lumbar_bending=(1.0, 0.0),
    lumbar_rotation=(1.0, 0.0),
    arm_rot_r=(1.0, 0.2),
    arm_add_r=(1.0, 0.25),
    arm_flex_r=(-1.0, 0.0),
    elbow_flex_r=(-1.0, np.pi / 2 + 0.25),
    pro_sup_r=(1.0, 0.0),
    arm_rot_l=(-1.0, -0.2),
    arm_add_l=(-1.0, -0.25),
    arm_flex_l=(-1.0, 0.0),
    elbow_flex_l=(-1.0, np.pi / 2 + 0.25),
    pro_sup_l=(1.0, 0.0),
    hip_adduction_l=(-0.7, 0.02),
    hip_flexion_l=(-1.0, -0.1),
    hip_rotation_l=(-0.7, 0.0),
    knee_angle_l=(-1.0, 0.0),
    ankle_angle_l=(-1.0, -0.06),
    hip_adduction_r=(0.7, -0.02),
    hip_flexion_r=(-1.0, -0.1),
    hip_rotation_r=(0.7, 0.0),
    knee_angle_r=(-1.0, 0.0),
    ankle_angle_r=(-1.0, -0.06),
)

# mocap joint names -> H1 joint names (convert_UnitreeH1_run.py:45-58)
RENAME_MAP = dict(
    lumbar_extension="back_bky",
    lumbar_bending="back_bkx",
    lumbar_rotation="back_bkz",
    arm_flex_r="r_arm_shy",
    arm_rot_r="r_arm_shz",
    arm_add_r="r_arm_shx",
    elbow_flex_r="right_elbow",
    pro_sup_r="r_arm_wry",
    arm_flex_l="l_arm_shy",
    arm_rot_l="l_arm_shz",
    arm_add_l="l_arm_shx",
    elbow_flex_l="left_elbow",
    pro_sup_l="l_arm_wry",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mocap", default="../00_raw_mocap_data/raw_running_mocap_data.mat"
    )
    ap.add_argument("--out_dir", default="../generated_data")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    dataset = adapt_mocap(
        args.mocap,
        joint_conf=JOINT_CONF,
        unavailable_keys=[],
        rename_map=RENAME_MAP,
        discard_first=28500,
        discard_last=12500,
    )
    target = os.path.join(args.out_dir, "05-run_UnitreeH1.npz")
    np.savez(file=target, **dataset)
    print(f"wrote {target}: "
          + ", ".join(f"{k}:{np.shape(v)}" for k, v in dataset.items()))


if __name__ == "__main__":
    main()
