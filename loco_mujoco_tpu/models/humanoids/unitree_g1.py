"""Unitree G1 environment — walk/run × real.

Behavioral port of reference `humanoids/unitreeG1.py` (C20): obs/action
specs auto-derived from the (post-surgery) model's joint/actuator lists
(unitreeG1.py:450-480), 8 foot collision points -> GRF dim 24, arm removal
with shoulder/elbow reorientation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...core.io import put_model
from ...envs.observation import ObsIndex
from ...registry import register
from ...utils.checks import ValidTaskConf, check_validity_task_mode_dataset
from .robot_base import (
    REF_ROOT,
    RobotHumanoid,
    apply_surgery,
    joint_obs_spec,
)

ARMS = [
    "right_shoulder_pitch_joint", "right_shoulder_roll_joint",
    "right_shoulder_yaw_joint", "right_elbow_pitch_joint",
    "right_elbow_roll_joint",
    "left_shoulder_pitch_joint", "left_shoulder_roll_joint",
    "left_shoulder_yaw_joint", "left_elbow_pitch_joint",
    "left_elbow_roll_joint",
]
REORIENT = [
    ("left_shoulder_pitch_link", [1.0, 0.25, 0.1, 0.0]),
    ("right_elbow_pitch_link", [1.0, 0.0, 0.25, 0.0]),
    ("right_shoulder_pitch_link", [1.0, -0.25, 0.1, 0.0]),
    ("left_elbow_pitch_link", [1.0, 0.0, 0.25, 0.0]),
]
FEET = [f"{side}_foot_{i}_col" for side in ("right", "left") for i in (1, 2, 3, 4)]


def _has_fallen_fn(ki):
    idx = [ki["q_pelvis_ty"], ki["q_pelvis_tilt"], ki["q_pelvis_list"],
           ki["q_pelvis_rotation"]]

    def has_fallen(obs):
        # unitreeG1.py:357-394
        y_c = (obs[idx[0]] < -0.3) | (obs[idx[0]] > 0.1)
        tilt_c = (obs[idx[1]] < -jnp.pi / 4.5) | (obs[idx[1]] > jnp.pi / 12)
        list_c = (obs[idx[2]] < -jnp.pi / 12) | (obs[idx[2]] > jnp.pi / 8)
        rot_c = (obs[idx[3]] < -jnp.pi / 8) | (obs[idx[3]] > jnp.pi / 8)
        return y_c | tilt_c | list_c | rot_c

    return has_fallen


@register
class UnitreeG1(RobotHumanoid):
    valid_task_confs = ValidTaskConf(
        tasks=["walk", "run"], data_types=["real"]
    )

    def __init__(
        self,
        disable_arms: bool = True,
        disable_back_joint: bool = False,
        dtype=jnp.float32,
        **kwargs,
    ):
        xml = REF_ROOT / "environments" / "data" / "unitree_g1" / "g1.xml"
        joints_rm, motors_rm = [], []
        if disable_arms:
            joints_rm += ARMS
            motors_rm += ARMS  # actuators share the joint names
        if disable_back_joint:
            joints_rm += ["torso_joint"]
            motors_rm += ["torso_joint"]

        mj_model = apply_surgery(
            xml,
            joints_rm=joints_rm,
            motors_rm=motors_rm,
            body_quats=REORIENT if disable_arms else (),
        )
        model = put_model(mj_model, dtype=dtype)
        # obs spec auto-derived from the remaining joints in model order
        jmap = model.names["joint"]
        joints = [j for j, _ in sorted(jmap.items(), key=lambda kv: kv[1])]
        obs_index = ObsIndex(model, joint_obs_spec(joints))

        super().__init__(
            model,
            obs_index,
            joints,
            foot_groups=[[f] for f in FEET],
            has_fallen_fn=_has_fallen_fn,
            grf_size=24,
            dtype=dtype,
            **kwargs,
        )
        self._mj_model = mj_model
        self._mj_models = [mj_model]

    @staticmethod
    def generate(task="walk", dataset_type="real", debug=False, **kwargs):
        check_validity_task_mode_dataset(
            "UnitreeG1", task, None, dataset_type,
            *UnitreeG1.valid_task_confs.get_all(),
        )
        path = (
            "datasets/humanoids/real/05-run_UnitreeG1.npz"
            if task == "run"
            else "datasets/humanoids/real/02-constspeed_UnitreeG1.npz"
        )
        return UnitreeG1.generate_robot(path, task, dataset_type, debug, **kwargs)
