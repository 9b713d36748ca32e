"""Atlas environment — walk/carry × real/perfect (carry+perfect invalid).

Behavioral port of reference `humanoids/atlas.py` (C17): arm/back-joint
removal, clav reorientation, carried weight on the upper torso, RK4
integrator (data/atlas/atlas.xml:65 — handled natively by ops/forward).
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
BACK = ["back_bkz", "back_bkx", "back_bky"]
ARMS = ["l_arm_shz", "l_arm_shx", "l_arm_ely", "l_arm_elx", "l_arm_wry",
        "l_arm_wrx", "r_arm_shz", "r_arm_shx", "r_arm_ely", "r_arm_elx",
        "r_arm_wry", "r_arm_wrx"]
LEGS = ["hip_flexion_r", "hip_adduction_r", "hip_rotation_r", "knee_angle_r",
        "ankle_angle_r", "hip_flexion_l", "hip_adduction_l", "hip_rotation_l",
        "knee_angle_l", "ankle_angle_l"]
ALL_JOINTS = PELVIS + BACK + ARMS + LEGS

REORIENT = [
    ("r_clav", [1.0, 0.0, -0.35, 0.0]),
    ("l_clav", [0.0, -0.35, 0.0, 1.0]),
]


def _has_fallen_fn(ki):
    p = [ki["q_pelvis_ty"], ki["q_pelvis_tilt"], ki["q_pelvis_list"],
         ki["q_pelvis_rotation"]]
    has_back = "q_back_bky" in ki
    b = [ki.get("q_back_bky"), ki.get("q_back_bkx"), ki.get("q_back_bkz")]

    def has_fallen(obs):
        # atlas.py:366-420
        y_c = (obs[p[0]] < -0.3) | (obs[p[0]] > 0.1)
        tilt_c = (obs[p[1]] < -jnp.pi / 4.5) | (obs[p[1]] > jnp.pi / 12)
        list_c = (obs[p[2]] < -jnp.pi / 12) | (obs[p[2]] > jnp.pi / 8)
        rot_c = (obs[p[3]] < -jnp.pi / 10) | (obs[p[3]] > jnp.pi / 10)
        cond = y_c | tilt_c | list_c | rot_c
        if has_back:
            ext_c = (obs[b[0]] < -jnp.pi / 4) | (obs[b[0]] > jnp.pi / 10)
            bend_c = (obs[b[1]] < -jnp.pi / 10) | (obs[b[1]] > jnp.pi / 10)
            rot2_c = (obs[b[2]] < -jnp.pi / 4.5) | (obs[b[2]] > jnp.pi / 4.5)
            cond = cond | ext_c | bend_c | rot2_c
        return cond

    return has_fallen


@register
class Atlas(RobotHumanoid):
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
        xml = REF_ROOT / "environments" / "data" / "atlas" / "atlas.xml"

        joints_rm, motors_rm = [], []
        if disable_arms:
            joints_rm += ARMS
            motors_rm += [j + "_actuator" for j in ARMS]
        if disable_back_joint:
            joints_rm += BACK
            motors_rm += [j + "_actuator" for j in BACK]

        # carried weight: a fixed mass gives one model; the default gives
        # the reference's 4-mass POMDP set as stacked model variants
        # (reference atlas.py:320-331)
        masses = None
        if hold_weight:
            masses = (
                [weight_mass] if weight_mass is not None
                else list(RobotHumanoid.VALID_WEIGHTS)
            )

        def build(weight):
            mj = apply_surgery(
                xml, joints_rm=joints_rm, motors_rm=motors_rm,
                body_quats=REORIENT if disable_arms else (),
                weight=weight,
            )
            return mj, put_model(mj, dtype=dtype)

        if masses is None:
            mj_model, model = build(None)
            mj_models, variants = [mj_model], None
        else:
            pairs = [
                build(
                    ("utorso", m, [0.1, 0.27, 0.1], [0.72, 0, -0.25],
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
            foot_groups=[["right_foot_back"], ["right_foot_front"],
                         ["left_foot_back"], ["left_foot_front"]],
            has_fallen_fn=_has_fallen_fn,
            hold_weight=hold_weight,
            weight_mass=(masses[0] if masses else None),
            weight_masses=masses,
            model_variants=variants,
            grf_size=12,
            dtype=dtype,
            **kwargs,
        )
        self._mj_model = mj_model
        self._mj_models = mj_models

    @staticmethod
    def generate(task="walk", dataset_type="real", debug=False, **kwargs):
        check_validity_task_mode_dataset(
            "Atlas", task, None, dataset_type,
            *Atlas.valid_task_confs.get_all(),
        )
        path = "datasets/humanoids/real/02-constspeed_ATLAS.npz"
        return Atlas.generate_robot(path, task, dataset_type, debug, **kwargs)
