"""Talos environment — walk/carry × real/perfect (carry+perfect invalid).

Behavioral port of reference `humanoids/talos.py` (C18): arm removal with
arm_*_4_link reorientation, optional carried weight on torso_2_link, fall
detection from pelvis + back angles, trajectories clipped to joint ranges.
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
BACK = ["back_bkz", "back_bky"]
ARMS = ["l_arm_shz", "l_arm_shx", "l_arm_ely", "l_arm_elx", "l_arm_wry",
        "l_arm_wrx", "r_arm_shz", "r_arm_shx", "r_arm_ely", "r_arm_elx",
        "r_arm_wry", "r_arm_wrx"]
LEGS = ["hip_flexion_r", "hip_adduction_r", "hip_rotation_r", "knee_angle_r",
        "ankle_angle_r", "hip_flexion_l", "hip_adduction_l", "hip_rotation_l",
        "knee_angle_l", "ankle_angle_l"]
ALL_JOINTS = PELVIS + BACK + ARMS + LEGS

REORIENT = [
    ("arm_right_4_link", [1.0, 0.0, -0.25, 0.0]),
    ("arm_left_4_link", [1.0, 0.0, -0.25, 0.0]),
]
REORIENT_CARRY = [
    ("arm_right_4_link", [1.0, 0.0, -0.65, 0.0]),
    ("arm_left_4_link", [1.0, 0.0, -0.65, 0.0]),
    ("arm_right_6_link", [1.0, 0.0, -0.0, 1.0]),
    ("arm_left_6_link", [1.0, 0.0, -0.0, 1.0]),
]


def _has_fallen_fn(ki):
    p = [ki["q_pelvis_ty"], ki["q_pelvis_tilt"], ki["q_pelvis_list"],
         ki["q_pelvis_rotation"]]
    has_back = "q_back_bky" in ki
    b = [ki.get("q_back_bky"), ki.get("q_back_bkz")]

    def has_fallen(obs):
        # talos.py:357-420
        y_c = (obs[p[0]] < -0.3) | (obs[p[0]] > 0.1)
        tilt_c = (obs[p[1]] < -jnp.pi / 4.5) | (obs[p[1]] > jnp.pi / 12)
        list_c = (obs[p[2]] < -jnp.pi / 12) | (obs[p[2]] > jnp.pi / 8)
        rot_c = (obs[p[3]] < -jnp.pi / 10) | (obs[p[3]] > jnp.pi / 10)
        cond = y_c | tilt_c | list_c | rot_c
        if has_back:
            ext_c = (obs[b[0]] < -jnp.pi / 4) | (obs[b[0]] > jnp.pi / 10)
            rot2_c = (obs[b[1]] < -jnp.pi / 10) | (obs[b[1]] > jnp.pi / 10)
            cond = cond | ext_c | rot2_c
        return cond

    return has_fallen


@register
class Talos(RobotHumanoid):
    valid_task_confs = ValidTaskConf(
        tasks=["walk", "carry"],
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
        xml = REF_ROOT / "environments" / "data" / "talos" / "talos.xml"

        joints_rm, motors_rm = [], []
        if disable_arms:
            joints_rm += ARMS
            motors_rm += [j + "_actuator" for j in ARMS]
        if disable_back_joint:
            joints_rm += BACK
            motors_rm += [j + "_actuator" for j in BACK]

        # carried weight: a fixed mass gives one model; the default gives
        # the reference's 4-mass POMDP set as stacked model variants
        # (reference talos.py:266-326)
        masses = None
        reorient = ()
        if hold_weight:
            masses = (
                [weight_mass] if weight_mass is not None
                else list(RobotHumanoid.VALID_WEIGHTS)
            )
            reorient = REORIENT_CARRY
        elif disable_arms:
            reorient = REORIENT

        def build(weight):
            mj = apply_surgery(
                xml, joints_rm=joints_rm, motors_rm=motors_rm,
                body_quats=reorient, weight=weight,
            )
            return mj, put_model(mj, dtype=dtype)

        if masses is None:
            mj_model, model = build(None)
            mj_models, variants = [mj_model], None
        else:
            pairs = [
                build(
                    ("torso_2_link", m, [0.1, 0.25, 0.1], [0.45, 0, -0.20],
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
            "Talos", task, None, dataset_type,
            *Talos.valid_task_confs.get_all(),
        )
        path = "datasets/humanoids/real/02-constspeed_TALOS.npz"
        return Talos.generate_robot(
            path, task, dataset_type, debug,
            clip_trajectory_to_joint_ranges=True, **kwargs,
        )
