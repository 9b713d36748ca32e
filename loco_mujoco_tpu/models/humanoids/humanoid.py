"""Torque/muscle humanoid environments (HumanoidTorque, HumanoidMuscle).

Behavioral port of reference `environments/humanoids/base_humanoid.py` (C4)
and `humanoids/humanoids.py` (C6): XML surgery for box feet (+ disabling the
mesh feet) and arm removal/reorientation via MjSpec, fall detection from
pelvis/lumbar angles, target-velocity reward, walk/run × real/perfect
datasets (500 Hz real mocap cubically resampled to 100 Hz control).
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

import mujoco

from ...core.io import put_model
from ...datasets.trajectory import TrajectoryData
from ...envs.base import LocoEnv
from ...envs.observation import ObservationType
from ...envs.observation import ObsIndex
from ...ops import support
from ...registry import register
from ...rewards import make_reward
from ...utils.checks import ValidTaskConf, check_validity_task_mode_dataset

from ...utils.assets import REF_ROOT  # asset root, env-var overridable

PELVIS = ["pelvis_tx", "pelvis_tz", "pelvis_ty", "pelvis_tilt", "pelvis_list", "pelvis_rotation"]
LEG_R = ["hip_flexion_r", "hip_adduction_r", "hip_rotation_r", "knee_angle_r",
         "ankle_angle_r", "subtalar_angle_r", "mtp_angle_r"]
LEG_L = [j[:-2] + "_l" for j in LEG_R]
LUMBAR = ["lumbar_extension", "lumbar_bending", "lumbar_rotation"]
ARM_R = ["arm_flex_r", "arm_add_r", "arm_rot_r", "elbow_flex_r", "pro_sup_r",
         "wrist_flex_r", "wrist_dev_r"]
ARM_L = [j[:-2] + "_l" for j in ARM_R]
ALL_JOINTS = PELVIS + LEG_R + LEG_L + LUMBAR + ARM_R + ARM_L

TORQUE_ACTIONS = [
    "mot_lumbar_ext", "mot_lumbar_bend", "mot_lumbar_rot",
    "mot_shoulder_flex_r", "mot_shoulder_add_r", "mot_shoulder_rot_r",
    "mot_elbow_flex_r", "mot_pro_sup_r", "mot_wrist_flex_r", "mot_wrist_dev_r",
    "mot_shoulder_flex_l", "mot_shoulder_add_l", "mot_shoulder_rot_l",
    "mot_elbow_flex_l", "mot_pro_sup_l", "mot_wrist_flex_l", "mot_wrist_dev_l",
    "mot_hip_flexion_r", "mot_hip_adduction_r", "mot_hip_rotation_r",
    "mot_knee_angle_r", "mot_ankle_angle_r", "mot_subtalar_angle_r",
    "mot_mtp_angle_r",
    "mot_hip_flexion_l", "mot_hip_adduction_l", "mot_hip_rotation_l",
    "mot_knee_angle_l", "mot_ankle_angle_l", "mot_subtalar_angle_l",
    "mot_mtp_angle_l",
]


def _obs_spec(joints):
    spec = [(f"q_{j}", j, ObservationType.JOINT_POS) for j in joints]
    spec += [(f"dq_{j}", j, ObservationType.JOINT_VEL) for j in joints]
    return spec


def _surgery(xml_path, use_box_feet, disable_arms, alpha_box_feet=0.5,
             scaling=1.0, spec_edit=None):
    """XML modifications (base_humanoid.py:86-127, 435-496) via MjSpec.

    spec_edit: optional callback applied to the MjSpec right before
    compile — used by the 4-ages envs to apply the body-scaling law at
    the SPEC level so every compile-derived quantity (qhull hulls,
    geom_rbound/aabb, body BVH, invweight0) stays self-consistent, like
    the reference's XML-surgery + recompile pipeline."""
    spec = mujoco.MjSpec.from_file(str(xml_path))
    joints_rm, motors_rm, eq_rm = [], [], []
    if use_box_feet:
        joints_rm += ["subtalar_angle_l", "mtp_angle_l", "subtalar_angle_r", "mtp_angle_r"]
        motors_rm += ["mot_" + j for j in joints_rm]
        eq_rm += [j + "_constraint" for j in joints_rm]
    if disable_arms:
        joints_rm += ARM_R + ARM_L
        motors_rm += [
            "mot_shoulder_flex_r", "mot_shoulder_add_r", "mot_shoulder_rot_r",
            "mot_elbow_flex_r", "mot_pro_sup_r", "mot_wrist_flex_r",
            "mot_wrist_dev_r", "mot_shoulder_flex_l", "mot_shoulder_add_l",
            "mot_shoulder_rot_l", "mot_elbow_flex_l", "mot_pro_sup_l",
            "mot_wrist_flex_l", "mot_wrist_dev_l",
        ]
        eq_rm += ["wrist_flex_r_constraint", "wrist_dev_r_constraint",
                  "wrist_flex_l_constraint", "wrist_dev_l_constraint"]

    for name in joints_rm:
        j = spec.joint(name)
        if j is not None:
            spec.delete(j)
    for name in motors_rm:
        a = spec.actuator(name)
        if a is not None:
            spec.delete(a)
    for e in list(spec.equalities):
        if e.name in eq_rm:
            spec.delete(e)

    if use_box_feet:
        size = (np.array([0.112, 0.03, 0.05]) * scaling).tolist()
        pos = (np.array([-0.09, 0.019, 0.0]) * scaling).tolist()
        for side, euler_y in (("l", 0.15), ("r", -0.15)):
            toe = spec.body(f"toes_{side}")
            # euler [0, ±0.15, 0] as a quaternion (MjSpec geoms take quat)
            half = euler_y / 2.0
            quat = [float(np.cos(half)), 0.0, float(np.sin(half)), 0.0]
            toe.add_geom(
                name=f"foot_box_{side}",
                type=mujoco.mjtGeom.mjGEOM_BOX,
                size=size,
                pos=pos,
                quat=quat,
                rgba=[0.5, 0.5, 0.5, alpha_box_feet],
            )
        for gname in ("r_foot", "r_bofoot", "l_foot", "l_bofoot"):
            g = spec.geom(gname)
            g.contype = 0
            g.conaffinity = 0

    if disable_arms:
        # arm reorientation (base_humanoid.py:474-496)
        for bname, quat in (
            ("humerus_l", [1.0, -0.1, -1.0, -0.1]),
            ("ulna_l", [1.0, 0.6, 0.0, 0.0]),
            ("humerus_r", [1.0, 0.1, 1.0, -0.1]),
            ("ulna_r", [1.0, -0.6, 0.0, 0.0]),
        ):
            b = spec.body(bname)
            if b is not None:
                b.quat = quat

    if spec_edit is not None:
        spec_edit(spec)
    return spec.compile(), joints_rm, motors_rm


class BaseHumanoid(LocoEnv):
    """Shared machinery for the torque and muscle humanoids."""

    def __init__(
        self,
        use_muscles: bool = False,
        use_box_feet: bool = True,
        disable_arms: bool = True,
        alpha_box_feet: float = 0.5,
        reward_type: str = "target_velocity",
        reward_params: dict | None = None,
        traj_params: dict | None = None,
        random_start: bool = True,
        init_step_no=None,
        use_foot_forces: bool = False,
        dtype=jnp.float32,
        _prebuilt=None,
        **kwargs,
    ):
        if _prebuilt is not None:
            # 4-ages subclass supplies pre-scaled model variants
            model, variants, joints_rm, mj_models = _prebuilt
        else:
            name = (
                "humanoid_muscle.xml" if use_muscles else "humanoid_torque.xml"
            )
            xml = REF_ROOT / "environments" / "data" / "humanoid" / name
            mj_model, joints_rm, _ = _surgery(
                xml, use_box_feet, disable_arms, alpha_box_feet
            )
            model = put_model(mj_model, dtype=dtype)
            variants = None
            mj_models = [mj_model]

        joints = [j for j in ALL_JOINTS if j not in joints_rm]
        obs_index = ObsIndex(model, _obs_spec(joints))
        self.joints = joints
        self.use_muscles = use_muscles
        self.use_box_feet = use_box_feet
        self.disable_arms = disable_arms

        # obs indices after dropping global x/y (pelvis_tx, pelvis_tz)
        keys = [f"q_{j}" for j in joints] + [f"dq_{j}" for j in joints]
        self._key_idx = {k: i - 2 for i, k in enumerate(keys)}
        ki = self._key_idx
        x_vel_idx = ki["dq_pelvis_tx"]

        reward_fn = make_reward(
            reward_type, reward_params, dict(x_vel_idx=x_vel_idx)
        )

        idx = [
            ki["q_pelvis_ty"], ki["q_pelvis_tilt"], ki["q_pelvis_list"],
            ki["q_pelvis_rotation"], ki["q_lumbar_extension"],
            ki["q_lumbar_bending"], ki["q_lumbar_rotation"],
        ]

        def has_fallen(obs):
            # base_humanoid.py:129-180
            height_c = (obs[idx[0]] < -0.46) | (obs[idx[0]] > 0.1)
            tilt_c = (obs[idx[1]] < -jnp.pi / 4.5) | (obs[idx[1]] > jnp.pi / 12)
            list_c = (obs[idx[2]] < -jnp.pi / 12) | (obs[idx[2]] > jnp.pi / 8)
            rot_c = (obs[idx[3]] < -jnp.pi / 9) | (obs[idx[3]] > jnp.pi / 9)
            lext_c = (obs[idx[4]] < -jnp.pi / 4) | (obs[idx[4]] > jnp.pi / 10)
            lbend_c = (obs[idx[5]] < -jnp.pi / 10) | (obs[idx[5]] > jnp.pi / 10)
            lrot_c = (obs[idx[6]] < -jnp.pi / 4.5) | (obs[idx[6]] > jnp.pi / 4.5)
            return height_c | tilt_c | list_c | rot_c | lext_c | lbend_c | lrot_c

        traj_data = None
        if traj_params is not None:
            key_dims = [1] * len(keys)
            jr = np.asarray(model.jnt_range)
            jmap = model.names["joint"]
            low = np.array([jr[jmap[j], 0] for j in joints[2:]])
            high = np.array([jr[jmap[j], 1] for j in joints[2:]])
            traj_data = TrajectoryData(
                keys,
                key_dims,
                low=low,
                high=high,
                joint_pos_idx=list(range(len(joints))),
                dtype=dtype,
                **traj_params,
            )

        super().__init__(
            model,
            obs_index,
            reward_fn=reward_fn,
            traj_data=traj_data,
            random_start=random_start,
            init_step_no=init_step_no,
            use_foot_forces=use_foot_forces,
            grf_size=6 if use_box_feet else 12,
            has_fallen=has_fallen,
            model_variants=variants,
            dtype=dtype,
            **kwargs,
        )
        self._mj_model = mj_models[0]
        self._mj_models = mj_models

        gmap = model.names["geom"]
        self._floor_ids = np.asarray([gmap["floor"]])
        if use_box_feet:
            self._grf_groups = [
                np.asarray([gmap["foot_box_r"]]),
                np.asarray([gmap["foot_box_l"]]),
            ]
        else:
            self._grf_groups = [
                np.asarray([gmap["r_foot"]]),
                np.asarray([gmap["r_bofoot"]]),
                np.asarray([gmap["l_foot"]]),
                np.asarray([gmap["l_bofoot"]]),
            ]

    def _grf(self, data):
        parts = [
            support.contact_force_groups(
                self.model, data, self._floor_ids, g, elliptic=False
            )
            for g in self._grf_groups
        ]
        return jnp.concatenate(parts).astype(self.dtype)

    def load_trajectory(self, traj_params, warn=True):
        """Load/replace trajectories post-construction (base.py:145-168)."""
        keys = [f"q_{j}" for j in self.joints] + [f"dq_{j}" for j in self.joints]
        jr = np.asarray(self.model.jnt_range)
        jmap = self.model.names["joint"]
        low = np.array([jr[jmap[j], 0] for j in self.joints[2:]])
        high = np.array([jr[jmap[j], 1] for j in self.joints[2:]])
        self.traj = TrajectoryData(
            keys,
            [1] * len(keys),
            low=low,
            high=high,
            joint_pos_idx=list(range(len(self.joints))),
            dtype=self.dtype,
            warn=warn,
            **traj_params,
        )

    def _dataset_ignore_keys(self):
        # base_humanoid.py:66-85 — global x/y dropped from IL datasets
        return ["q_pelvis_tx", "q_pelvis_tz"]

    @classmethod
    def _generate(cls, path, task="walk", dataset_type="real", debug=False, **kwargs):
        if "reward_type" not in kwargs:
            kwargs["reward_type"] = "target_velocity"
            kwargs["reward_params"] = dict(
                target_velocity=1.25 if task == "walk" else 2.5
            )
        full = REF_ROOT / path
        if debug or not full.exists():
            parts = path.split("/")
            parts.insert(3, "mini_datasets")
            full = REF_ROOT / "/".join(parts)
        if dataset_type == "perfect":
            from ...datasets.trajectory import load_dataset_and_get_traj_files

            env = cls(**kwargs)
            if not full.exists():
                raise FileNotFoundError(
                    f"perfect dataset not found at {full}; download the "
                    "datasets first (loco-mujoco-download-perfect)"
                )
            keys = [f"q_{j}" for j in env.joints] + [
                f"dq_{j}" for j in env.joints
            ]
            traj_files = load_dataset_and_get_traj_files(full, keys, freq=100)
            env.load_trajectory(
                dict(traj_files=traj_files, traj_dt=0.01, control_dt=0.01),
                warn=False,
            )
            return env
        traj_params = dict(
            traj_path=str(full), traj_dt=1.0 / 500, control_dt=0.01
        )
        return cls(traj_params=traj_params, **kwargs)


@register
class HumanoidTorque(BaseHumanoid):
    """Torque-driven humanoid (humanoids.py:250-330)."""

    valid_task_confs = ValidTaskConf(
        tasks=["walk", "run"], data_types=["real", "perfect"]
    )

    @staticmethod
    def generate(task="walk", dataset_type="real", debug=False, **kwargs):
        check_validity_task_mode_dataset(
            "HumanoidTorque", task, None, dataset_type,
            *HumanoidTorque.valid_task_confs.get_all(),
        )
        if dataset_type == "perfect":
            # perfect data was recorded with the default morphology
            # (humanoids.py:304-315)
            for k, v in (("use_foot_forces", False), ("disable_arms", True),
                         ("use_box_feet", True)):
                if k in kwargs:
                    assert kwargs[k] is v
            path = (
                "datasets/humanoids/perfect/humanoid_torque_walk/perfect_expert_dataset_det.npz"
                if task == "walk"
                else "datasets/humanoids/perfect/humanoid_torque_run/perfect_expert_dataset_det.npz"
            )
        else:
            path = (
                "datasets/humanoids/real/02-constspeed_reduced_humanoid.npz"
                if task == "walk"
                else "datasets/humanoids/real/05-run_reduced_humanoid.npz"
            )
        return HumanoidTorque._generate(
            path, task, dataset_type, debug, use_muscles=False, **kwargs
        )


@register
class HumanoidMuscle(BaseHumanoid):
    """Muscle-driven humanoid (humanoids.py:720-830): 92 muscles via
    tendon transmission + optional arm torque motors."""

    valid_task_confs = ValidTaskConf(
        tasks=["walk", "run"],
        data_types=["real", "perfect"],
        non_combinable=[("run", None, "perfect")],
    )

    @staticmethod
    def generate(task="walk", dataset_type="real", debug=False, **kwargs):
        check_validity_task_mode_dataset(
            "HumanoidMuscle", task, None, dataset_type,
            *HumanoidMuscle.valid_task_confs.get_all(),
        )
        if dataset_type == "perfect":
            for k, v in (("use_foot_forces", False), ("disable_arms", True),
                         ("use_box_feet", True)):
                if k in kwargs:
                    assert kwargs[k] is v
            path = "datasets/humanoids/perfect/humanoid_muscle_walk/perfect_expert_dataset_det.npz"
        else:
            path = (
                "datasets/humanoids/real/02-constspeed_reduced_humanoid.npz"
                if task == "walk"
                else "datasets/humanoids/real/05-run_reduced_humanoid.npz"
            )
        return HumanoidMuscle._generate(
            path, task, dataset_type, debug, use_muscles=True, **kwargs
        )
