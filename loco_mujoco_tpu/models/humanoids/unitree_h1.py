"""Unitree H1 environment — walk/run/carry × real/perfect.

Behavioral port of reference `humanoids/unitreeH1.py` (C19): arm removal +
elbow reorientation, optional carried weight on the torso, fall detection
from pelvis height/tilt/list/rotation, trajectories clipped to joint ranges
on load (unitreeH1.py:422-423).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.io import put_model
from ...envs.observation import ObsIndex
from ...registry import register
from ...utils.checks import ValidTaskConf, check_validity_task_mode_dataset
from .robot_base import (
    REF_ROOT,
    RobotHumanoid,
    apply_surgery,
    joint_obs_spec,
    weight_color,
)

PELVIS = ["pelvis_tx", "pelvis_tz", "pelvis_ty", "pelvis_tilt", "pelvis_list",
          "pelvis_rotation"]
BACK = ["back_bkz"]
ARMS = ["l_arm_shy", "l_arm_shx", "l_arm_shz", "left_elbow",
        "r_arm_shy", "r_arm_shx", "r_arm_shz", "right_elbow"]
LEGS = ["hip_flexion_r", "hip_adduction_r", "hip_rotation_r", "knee_angle_r",
        "ankle_angle_r", "hip_flexion_l", "hip_adduction_l", "hip_rotation_l",
        "knee_angle_l", "ankle_angle_l"]
ALL_JOINTS = PELVIS + BACK + ARMS + LEGS

ARM_MOTORS = [j + "_actuator" for j in ARMS]
REORIENT = [
    ("left_shoulder_pitch_link", [1.0, 0.25, 0.1, 0.0]),
    ("right_elbow_link", [1.0, 0.0, 0.25, 0.0]),
    ("right_shoulder_pitch_link", [1.0, -0.25, 0.1, 0.0]),
    ("left_elbow_link", [1.0, 0.0, 0.25, 0.0]),
]


def _has_fallen_fn(ki):
    idx = [ki["q_pelvis_ty"], ki["q_pelvis_tilt"], ki["q_pelvis_list"],
           ki["q_pelvis_rotation"]]

    def has_fallen(obs):
        # unitreeH1.py:347-384
        y_c = (obs[idx[0]] < -0.3) | (obs[idx[0]] > 0.1)
        tilt_c = (obs[idx[1]] < -jnp.pi / 4.5) | (obs[idx[1]] > jnp.pi / 12)
        list_c = (obs[idx[2]] < -jnp.pi / 12) | (obs[idx[2]] > jnp.pi / 8)
        rot_c = (obs[idx[3]] < -jnp.pi / 8) | (obs[idx[3]] > jnp.pi / 8)
        return y_c | tilt_c | list_c | rot_c

    return has_fallen


@register
class UnitreeH1(RobotHumanoid):
    valid_task_confs = ValidTaskConf(
        tasks=["walk", "run", "carry"],
        data_types=["real", "perfect"],
        non_combinable=[("carry", None, "perfect")],
    )

    def __init__(
        self,
        disable_arms: bool = True,
        disable_back_joint: bool = False,
        hold_weight: bool = False,
        weight_mass=None,
        dtype=jnp.float32,
        **kwargs,
    ):
        if hold_weight:
            assert disable_arms, "carrying requires disabled (fixed) arms"
        xml = REF_ROOT / "environments" / "data" / "unitree_h1" / "h1.xml"

        joints_rm, motors_rm = [], []
        if disable_arms:
            joints_rm += ARMS
            motors_rm += ARM_MOTORS
        if disable_back_joint:
            joints_rm += BACK
            motors_rm += ["back_bkz_actuator"]

        # carried weight: a fixed mass gives one model; the default gives
        # the reference's 4-mass POMDP set as stacked model variants
        masses = None
        if hold_weight:
            masses = (
                [weight_mass] if weight_mass is not None
                else list(RobotHumanoid.VALID_WEIGHTS)
            )

        def build(weight):
            mj = apply_surgery(
                xml,
                joints_rm=joints_rm,
                motors_rm=motors_rm,
                body_quats=REORIENT
                if (disable_arms and not hold_weight)
                else (),
                weight=weight,
            )
            return mj, put_model(mj, dtype=dtype)

        if masses is None:
            mj_model, model = build(None)
            mj_models, variants = [mj_model], None
        else:
            pairs = [
                build(
                    ("torso_link", m, [0.1, 0.18, 0.1], [0.35, 0, 0.1],
                     weight_color(i, len(masses)))
                )
                for i, m in enumerate(masses)
            ]
            mj_models = [p[0] for p in pairs]
            ms = [p[1] for p in pairs]
            mj_model, model = mj_models[0], ms[0]
            variants = ms if len(ms) > 1 else None

        joints = [j for j in ALL_JOINTS if j not in joints_rm]
        obs_index = ObsIndex(model, joint_obs_spec(joints))

        super().__init__(
            model,
            obs_index,
            joints,
            foot_groups=[["right_foot"], ["left_foot"]],
            has_fallen_fn=_has_fallen_fn,
            hold_weight=hold_weight,
            weight_mass=(masses[0] if masses else None),
            weight_masses=masses,
            model_variants=variants,
            grf_size=6,
            dtype=dtype,
            **kwargs,
        )
        self._mj_model = mj_model
        self._mj_models = mj_models

    @staticmethod
    def generate(task="walk", dataset_type="real", debug=False, **kwargs):
        check_validity_task_mode_dataset(
            "UnitreeH1", task, None, dataset_type,
            *UnitreeH1.valid_task_confs.get_all(),
        )
        if task == "run":
            path = "datasets/humanoids/real/05-run_UnitreeH1.npz"
        else:
            path = "datasets/humanoids/real/02-constspeed_UnitreeH1.npz"
        return UnitreeH1.generate_robot(
            path, task, dataset_type, debug,
            clip_trajectory_to_joint_ranges=True, **kwargs,
        )
